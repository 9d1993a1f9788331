"""Cylindrical dam break with the shallow-water equations (parity
case for
/root/reference/pysph/examples/shallow_water/cylindrical_dambreak.py).
Exercises the SWE density Newton-Raphson iteration, variable-h
correction factor and particle acceleration."""

import numpy as np

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array_swe as gpa_swe
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.swe.basic import (
    CheckConvergence, CorrectionFactorVariableSmoothingLength,
    DensityNewtonRaphsonIteration, DensityResidual,
    InitialGuessDensity, ParticleAcceleration, SummationDensity,
    SWEIntegrator, SWEOS, SWEStep, UpdateSmoothingLength)
from pysph_tpu.tools.sph_evaluator import SPHEvaluator

rho_w = 1000.0
g = 9.81
dim = 2


class CylindricalDamBreak(Application):
    def add_user_options(self, group):
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=1.5, help='h/dx.')
        group.add_argument('--dw0', action='store', type=float,
                           dest='dw0', default=1.0,
                           help='Initial fluid column depth (m).')
        group.add_argument('--r', action='store', type=float,
                           dest='r', default=0.5,
                           help='Initial fluid column radius (m).')
        group.add_argument('--n', action='store', type=int, dest='n',
                           default=50,
                           help='Number of concentric circles.')

    def consume_user_options(self):
        self.hdx = self.options.hdx
        self.dw0 = self.options.dw0
        self.r = self.options.r
        self.n = self.options.n

    def create_particles(self):
        n, r = self.n, self.r
        dr = r / n
        d = self.dw0
        hdx = self.hdx

        xs, ys = [np.zeros(1)], [np.zeros(1)]
        rad = 0.0
        for j in range(1, n + 1):
            npnts = 4 * j
            theta = np.arange(0, 2 * np.pi - 1e-10,
                              (2 * np.pi) / npnts)
            rad = rad + dr
            xs.append(rad * np.cos(theta))
            ys.append(rad * np.sin(theta))
        x = np.concatenate(xs[1:])
        y = np.concatenate(ys[1:])

        m = np.ones_like(x) * (1.56 * dr * dr) * rho_w * d
        rho = np.ones_like(x) * rho_w * d
        h = np.ones_like(x) * hdx * dr
        pa = gpa_swe(x=x, y=y, m=m, rho=rho, rho0=rho.copy(), h=h,
                     h0=h.copy(), name='fluid')
        compute_initial_props([pa])
        return [pa]

    def create_solver(self):
        kernel = CubicSpline(dim=2)
        integrator = SWEIntegrator(fluid=SWEStep())
        return Solver(kernel=kernel, dim=2, integrator=integrator,
                      cfl=0.3, adaptive_timestep=True, dt=1e-4,
                      output_at_times=(0.1, 0.2, 0.3), tf=1.0)

    def create_equations(self):
        return [
            Group(equations=[
                InitialGuessDensity(dim=dim, dest='fluid',
                                    sources=['fluid']),
                UpdateSmoothingLength(dim=dim, dest='fluid'),
            ], update_nnps=True),
            Group(equations=[
                CorrectionFactorVariableSmoothingLength(
                    dest='fluid', sources=['fluid']),
                SummationDensity(dest='fluid', sources=['fluid']),
                DensityResidual('fluid'),
            ]),
            Group(equations=[
                Group(equations=[
                    DensityNewtonRaphsonIteration(dim=dim,
                                                  dest='fluid'),
                    UpdateSmoothingLength(dim=dim, dest='fluid'),
                ], update_nnps=True),
                Group(equations=[
                    CorrectionFactorVariableSmoothingLength(
                        dest='fluid', sources=['fluid']),
                    SummationDensity(dest='fluid',
                                     sources=['fluid']),
                    DensityResidual(dest='fluid'),
                    CheckConvergence(dest='fluid'),
                ]),
            ], iterate=True, max_iterations=10),
            Group(equations=[
                CorrectionFactorVariableSmoothingLength(
                    dest='fluid', sources=['fluid']),
                SWEOS(dest='fluid'),
            ]),
            Group(equations=[
                ParticleAcceleration(dim=dim, dest='fluid',
                                     sources=['fluid']),
            ]),
        ]

    def post_process(self, info_fname_or_dir='.'):
        """Radial depth profile at the dump times."""
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        out = {}
        for f in files:
            data = load(f)
            t = float(data['solver_data']['t'])
            fluid = data['arrays']['fluid']
            r = np.sqrt(np.asarray(fluid.x) ** 2 +
                        np.asarray(fluid.y) ** 2)
            dw = np.asarray(fluid.rho) / rho_w
            out['r_%04d' % int(t * 1000)] = r
            out['dw_%04d' % int(t * 1000)] = dw
        np.savez(self.output_dir + '/results.npz', **out)
        print('central depth at end: %.3f m' % dw[r.argmin()])
        return out


def compute_initial_props(particles):
    one_time_equations = [Group(equations=[
        CorrectionFactorVariableSmoothingLength(dest='fluid',
                                                sources=['fluid']),
        SWEOS(dest='fluid'),
    ])]
    sph_eval = SPHEvaluator(particles, one_time_equations, dim=2,
                            kernel=CubicSpline(dim=2))
    sph_eval.evaluate()


if __name__ == '__main__':
    app = CylindricalDamBreak()
    app.run()
    app.post_process(app.info_filename)
