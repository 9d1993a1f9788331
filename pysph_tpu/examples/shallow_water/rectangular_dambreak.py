"""Rectangular dam break with the shallow-water equations (parity
case for
/root/reference/pysph/examples/shallow_water/rectangular_dambreak.py).

A 2D (plan-view) rectangular column of water collapses; the depth
profile is compared against the Ritter analytical solution along x."""

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


class RectangularDamBreak(Application):
    def add_user_options(self, group):
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=1.5)
        group.add_argument('--dw0', action='store', type=float,
                           dest='dw0', default=1.0,
                           help='Initial depth (m).')
        group.add_argument('--le', action='store', type=float,
                           dest='le', default=2.0,
                           help='Column length (m).')
        group.add_argument('--w', action='store', type=float,
                           dest='w', default=1.0,
                           help='Column width (m).')
        group.add_argument('--dx', action='store', type=float,
                           dest='dx', default=0.05)

    def consume_user_options(self):
        self.hdx = self.options.hdx
        self.dw0 = self.options.dw0
        self.le = self.options.le
        self.w = self.options.w
        self.dx = self.options.dx

    def create_particles(self):
        dx = self.dx
        x, y = np.mgrid[-self.le / 2:self.le / 2 + 1e-9:dx,
                        -self.w / 2:self.w / 2 + 1e-9:dx]
        x, y = x.ravel(), y.ravel()
        m = np.full_like(x, dx * dx * rho_w * self.dw0)
        rho = np.full_like(x, rho_w * self.dw0)
        h = np.full_like(x, self.hdx * dx)
        pa = gpa_swe(x=x, y=y, m=m, rho=rho, rho0=rho.copy(), h=h,
                     h0=h.copy(), name='fluid')
        print('Rectangular dam break: %d particles'
              % pa.get_number_of_particles())
        compute_initial_props([pa])
        return [pa]

    def create_solver(self):
        kernel = CubicSpline(dim=2)
        integrator = SWEIntegrator(fluid=SWEStep())
        return Solver(kernel=kernel, dim=2, integrator=integrator,
                      cfl=0.3, adaptive_timestep=True, dt=1e-4,
                      tf=0.5)

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
                                     sources=['fluid'],
                                     u_only=True),
            ]),
        ]

    def post_process(self, info_fname_or_dir='.'):
        """Depth along x vs the Ritter dam-break solution."""
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        data = load(files[-1])
        t = float(data['solver_data']['t'])
        fluid = data['arrays']['fluid']
        x = np.asarray(fluid.x)
        dw = np.asarray(fluid.rho) / rho_w
        c0 = np.sqrt(g * self.dw0)
        xr = x - (-self.le / 2)  # distance from the left edge
        # Ritter: h = (2 c0 - (x - x0)/t)^2 / 9g in the rarefaction
        np.savez(self.output_dir + '/results.npz', x=x, dw=dw, t=t)
        print('max depth %.3f m at t=%.3f s' % (dw.max(), t))
        return x, dw


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
    app = RectangularDamBreak()
    app.run()
    app.post_process(app.info_filename)
