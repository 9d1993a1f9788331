"""Rectangular SWE dam break with particle splitting AND merging
(parity case for /root/reference/pysph/examples/shallow_water/
rectangular_dambreak_particle_split_and_merge.py).

Splitting refines the thinning front (area > A_max); past
x_min_merge, mutual-closest pairs below A_min are merged on device
(FindMergeable absorbs the partner's mass) and the absorbed partners
removed on the host between steps."""

import numpy as np

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array_swe as gpa_swe
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.swe.basic import (
    CheckConvergenceDensityResidual, CheckForParticlesToSplit,
    CorrectionFactorVariableSmoothingLength, DaughterVelocityEval,
    FindMergeable, GatherDensityEvalNextIteration,
    InitialDensityEvalAfterMerge, NonDimensionalDensityResidual,
    ParticleAcceleration, ParticleSplit, SWEIntegrator, SWEOS,
    SWEStep, UpdateSmoothingLength)
from pysph_tpu.tools.sph_evaluator import SPHEvaluator

rho_w = 1000.0
g = 9.81
dim = 2


class RectangularDamBreakSplitMerge(Application):
    def add_user_options(self, group):
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=1.5)
        group.add_argument('--dw0', action='store', type=float,
                           dest='dw0', default=1.0)
        group.add_argument('--le', action='store', type=float,
                           dest='le', default=2.0)
        group.add_argument('--w', action='store', type=float,
                           dest='w', default=1.0)
        group.add_argument('--dx', action='store', type=float,
                           dest='dx', default=0.05)
        group.add_argument('--coeff_A_split', action='store',
                           type=float, dest='coeff_A_max',
                           default=1.5)
        group.add_argument('--coeff_h_split', action='store',
                           type=float, dest='coeff_h_max',
                           default=2.0)
        group.add_argument('--coeff_A_merge', action='store',
                           type=float, dest='coeff_A_min',
                           default=0.5,
                           help='Merge when A < coeff * dx^2 ...')
        group.add_argument('--x_min_merge', action='store',
                           type=float, dest='x_min_merge',
                           default=3.0,
                           help='... and x > x_min_merge.')

    def consume_user_options(self):
        o = self.options
        self.hdx, self.dw0 = o.hdx, o.dw0
        self.le, self.w, self.dx = o.le, o.w, o.dx
        self.A_max = o.coeff_A_max * self.dx ** 2
        self.h_max = o.coeff_h_max * self.hdx * self.dx
        self.A_min = o.coeff_A_min * self.dx ** 2
        self.x_min_merge = o.x_min_merge

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
        compute_initial_props([pa])
        return [pa]

    def create_solver(self):
        return Solver(kernel=CubicSpline(dim=2), dim=2,
                      integrator=SWEIntegrator(fluid=SWEStep()),
                      cfl=0.3, adaptive_timestep=True, dt=1e-4,
                      tf=0.5)

    def create_equations(self):
        return [
            Group(equations=[
                FindMergeable(dest='fluid', sources=['fluid'],
                              A_min=self.A_min,
                              x_min=self.x_min_merge),
            ], update_nnps=True),
            Group(equations=[
                InitialDensityEvalAfterMerge(dest='fluid',
                                             sources=['fluid']),
            ]),
            Group(equations=[
                Group(equations=[
                    GatherDensityEvalNextIteration(
                        dest='fluid', sources=['fluid']),
                ]),
                Group(equations=[
                    NonDimensionalDensityResidual(dest='fluid'),
                ]),
                Group(equations=[
                    UpdateSmoothingLength(dim=dim, dest='fluid'),
                ], update_nnps=True),
                Group(equations=[
                    CheckConvergenceDensityResidual(dest='fluid'),
                ]),
            ], iterate=True, max_iterations=10),
            Group(equations=[
                CorrectionFactorVariableSmoothingLength(
                    dest='fluid', sources=['fluid']),
            ]),
            Group(equations=[
                DaughterVelocityEval(rhow=rho_w, dest='fluid',
                                     sources=['fluid']),
            ]),
            Group(equations=[SWEOS(dest='fluid')]),
            Group(equations=[
                ParticleAcceleration(dim=dim, dest='fluid',
                                     sources=['fluid'],
                                     u_only=True),
            ]),
            Group(equations=[
                CheckForParticlesToSplit(
                    dest='fluid', h_max=self.h_max,
                    A_max=self.A_max),
            ]),
        ]

    def pre_step(self, solver):
        solver._sync_to_host()
        for pa in self.particles:
            FindMergeable.remove(pa)
            ParticleSplit(pa).do_particle_split()
        solver._sync_to_device()
        solver._nnps_carry = None

    def post_process(self, info_fname_or_dir='.'):
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        data = load(files[-1])
        fluid = data['arrays']['fluid']
        t = float(data['solver_data']['t'])
        print('%d particles at t=%.2f (split+merge active)'
              % (np.asarray(fluid.x).size, t))


def compute_initial_props(particles):
    sph_eval = SPHEvaluator(particles, [Group(equations=[
        CorrectionFactorVariableSmoothingLength(dest='fluid',
                                                sources=['fluid']),
        SWEOS(dest='fluid'),
    ])], dim=2, kernel=CubicSpline(dim=2))
    sph_eval.evaluate()


if __name__ == '__main__':
    app = RectangularDamBreakSplitMerge()
    app.run()
    app.post_process(app.info_filename)
