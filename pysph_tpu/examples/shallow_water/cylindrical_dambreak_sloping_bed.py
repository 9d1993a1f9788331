"""Cylindrical dam break over a sloping parabolic dry bed
(Rodriguez-Paz & Bonet 2005; parity case for
/root/reference/pysph/examples/shallow_water/cylindrical_dambreak_sloping_bed.py).

The bed is analytic: slope -tan(theta) along x and parabolic curvature
1/R across y, entering the SWE momentum equation through the bottom
gradient/curvature properties."""

import numpy as np

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array_swe as gpa_swe
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.equation import Equation, Group
from pysph_tpu.sph.swe.basic import (
    CheckConvergence, CorrectionFactorVariableSmoothingLength,
    DensityNewtonRaphsonIteration, DensityResidual,
    InitialGuessDensity, ParticleAcceleration, SummationDensity,
    SWEIntegrator, SWEOS, SWEStep, UpdateSmoothingLength)
from pysph_tpu.tools.sph_evaluator import SPHEvaluator

rho_w = 1000.0
g = 9.81
dim = 2


class AnalyticParabolicBottom(Equation):
    """Sets the bottom gradient/curvature props from the analytic bed
    b(x, y) = -tan(theta) x + y^2 / (2R) each step (the reference
    hardcodes these inside a ParticleAcceleration subclass,
    cylindrical_dambreak_sloping_bed.py:39)."""

    def __init__(self, dest, sources=None, theta=40.0, R=1.1):
        self.bx = -np.tan(np.deg2rad(theta))
        self.curv = 1.0 / R
        super(AnalyticParabolicBottom, self).__init__(dest, sources)

    def initialize(self, d_idx, d_y, d_bx, d_by, d_bxx, d_bxy, d_byy):
        d_bx[d_idx] = self.bx
        d_by[d_idx] = self.curv * d_y[d_idx]
        d_bxx[d_idx] = 0.0
        d_bxy[d_idx] = 0.0
        d_byy[d_idx] = self.curv


class CylindricalDamBreakSlopingBed(Application):
    def add_user_options(self, group):
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=2.0)
        group.add_argument('--dw0', action='store', type=float,
                           dest='dw0', default=0.25,
                           help='Initial column depth (m).')
        group.add_argument('--r', action='store', type=float,
                           dest='r', default=0.25,
                           help='Initial column radius (m).')
        group.add_argument('--n', action='store', type=int, dest='n',
                           default=50,
                           help='Number of concentric circles.')
        group.add_argument('--R', action='store', type=float,
                           dest='R', default=1.1,
                           help='Bed radius of curvature (m).')
        group.add_argument('--theta', action='store', type=float,
                           dest='theta', default=40.0,
                           help='Bed slope from horizontal (deg).')

    def consume_user_options(self):
        o = self.options
        self.hdx, self.dw0, self.r = o.hdx, o.dw0, o.r
        self.n, self.R, self.theta = o.n, o.R, o.theta

    def create_particles(self):
        n, r = self.n, self.r
        dr = r / n
        xs, ys = [], []
        rad = 0.0
        for j in range(1, n + 1):
            theta = np.arange(0, 2 * np.pi - 1e-10,
                              2 * np.pi / (4 * j))
            rad += dr
            xs.append(rad * np.cos(theta))
            ys.append(rad * np.sin(theta))
        x, y = np.concatenate(xs), np.concatenate(ys)
        m = np.full_like(x, 1.56 * dr * dr * rho_w * self.dw0)
        rho = np.full_like(x, rho_w * self.dw0)
        h = np.full_like(x, self.hdx * dr)
        pa = gpa_swe(x=x, y=y, m=m, rho=rho, rho0=rho.copy(), h=h,
                     h0=h.copy(), name='fluid')
        compute_initial_props([pa])
        return [pa]

    def create_solver(self):
        return Solver(kernel=CubicSpline(dim=2), dim=2,
                      integrator=SWEIntegrator(fluid=SWEStep()),
                      cfl=0.2, adaptive_timestep=True, dt=1e-4,
                      output_at_times=(0.2, 0.5, 1.0), tf=1.0)

    def create_equations(self):
        bed = AnalyticParabolicBottom('fluid', theta=self.theta,
                                      R=self.R)
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
                bed,
                ParticleAcceleration(dim=dim, dest='fluid',
                                     sources=['fluid']),
            ]),
        ]

    def post_process(self, info_fname_or_dir='.'):
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        data = load(files[-1])
        fluid = data['arrays']['fluid']
        t = float(data['solver_data']['t'])
        x = np.asarray(fluid.x)
        print('front x extent at t=%.2f: [%.3f, %.3f]'
              % (t, x.min(), x.max()))
        np.savez(self.output_dir + '/results.npz', x=x,
                 y=np.asarray(fluid.y),
                 dw=np.asarray(fluid.rho) / rho_w, t=t)


def compute_initial_props(particles):
    sph_eval = SPHEvaluator(particles, [Group(equations=[
        CorrectionFactorVariableSmoothingLength(dest='fluid',
                                                sources=['fluid']),
        SWEOS(dest='fluid'),
    ])], dim=2, kernel=CubicSpline(dim=2))
    sph_eval.evaluate()


if __name__ == '__main__':
    app = CylindricalDamBreakSlopingBed()
    app.run()
    app.post_process(app.info_filename)
