"""Cylindrical SWE dam break with adaptive particle splitting: as
the column spreads, particles whose area exceeds A_max split 1->7
(Vacondio et al.; parity case for
/root/reference/pysph/examples/shallow_water/
cylindrical_dambreak_particle_split.py)."""

import os

import numpy as np
from numpy import arange, concatenate, cos, ones_like, pi, savez, sin, zeros

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array_swe as gpa_swe
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.swe.basic import (
    CheckConvergenceDensityResidual, CheckForParticlesToSplit,
    CorrectionFactorVariableSmoothingLength, DaughterVelocityEval,
    GatherDensityEvalNextIteration, NonDimensionalDensityResidual,
    ParticleAcceleration, ParticleSplit, SWEIntegrator, SWEOS,
    SWEStep, UpdateSmoothingLength)
from pysph_tpu.tools.sph_evaluator import SPHEvaluator

rho_w = 1000.0
g = 9.81
dim = 2


class CylindricalDamBreakSplit(Application):
    def add_user_options(self, group):
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=1.5)
        group.add_argument('--dw0', action='store', type=float,
                           dest='dw0', default=10.0,
                           help='Initial depth of the column (m)')
        group.add_argument('--r', action='store', type=float,
                           dest='r', default=500.0,
                           help='Initial radius of the column (m)')
        group.add_argument('--n', action='store', type=int,
                           dest='n', default=50,
                           help='Concentric fluid circles (dr=r/n)')
        group.add_argument('--coeff_A_split', action='store',
                           type=float, dest='coeff_A_max',
                           default=2.0,
                           help='Area ratio activating splitting')
        group.add_argument('--coeff_h_split', action='store',
                           type=float, dest='coeff_h_max',
                           default=3.0,
                           help='h ratio deactivating splitting')

    def consume_user_options(self):
        o = self.options
        self.hdx, self.dw0 = o.hdx, o.dw0
        self.r, self.n = o.r, int(o.n)
        self.coeff_A_max = o.coeff_A_max
        self.coeff_h_max = o.coeff_h_max
        self.dr = self.r / self.n
        # splitting active while A_i > A_max and h_i < h_max
        self.A_max = self.coeff_A_max * (1.56 * self.dr ** 2)
        self.h_max = self.coeff_h_max * self.hdx * self.dr

    def create_particles(self):
        dr, n = self.dr, self.n
        d = self.dw0
        hdx = self.hdx
        x = zeros(0)
        y = zeros(0)
        rad = 0.0
        for j in range(1, n + 1):
            npnts = 4 * j
            dtheta = (2 * pi) / npnts
            theta = arange(0, 2 * pi - 1e-10, dtheta)
            rad = rad + dr
            x = concatenate((x, rad * cos(theta)))
            y = concatenate((y, rad * sin(theta)))
        m = ones_like(x) * (1.56 * dr * dr) * rho_w * d
        rho = ones_like(x) * rho_w * d
        h = ones_like(x) * hdx * dr
        pa = gpa_swe(x=x, y=y, m=m, rho=rho, rho0=rho.copy(), h=h,
                     h0=h.copy(), name='fluid')
        compute_initial_props([pa])
        return [pa]

    def create_solver(self):
        kernel = CubicSpline(dim=2)
        integrator = SWEIntegrator(fluid=SWEStep())
        return Solver(kernel=kernel, dim=2, integrator=integrator,
                      cfl=0.3, adaptive_timestep=True,
                      output_at_times=(10.0, 30.0, 50.0), tf=50.0)

    def create_equations(self):
        return [
            Group(equations=[
                Group(equations=[
                    GatherDensityEvalNextIteration(
                        dest='fluid', sources=['fluid'])]),
                Group(equations=[
                    NonDimensionalDensityResidual(dest='fluid')]),
                Group(equations=[
                    UpdateSmoothingLength(dim=dim, dest='fluid')],
                    update_nnps=True),
                Group(equations=[
                    CheckConvergenceDensityResidual(dest='fluid')]),
            ], iterate=True, max_iterations=10),
            Group(equations=[
                CorrectionFactorVariableSmoothingLength(
                    dest='fluid', sources=['fluid'])]),
            Group(equations=[
                DaughterVelocityEval(rhow=rho_w, dest='fluid',
                                     sources=['fluid'])]),
            Group(equations=[SWEOS(dest='fluid')]),
            Group(equations=[
                ParticleAcceleration(dim=dim, dest='fluid',
                                     sources=['fluid'])]),
            Group(equations=[
                CheckForParticlesToSplit(
                    dest='fluid', h_max=self.h_max,
                    A_max=self.A_max)]),
        ]

    def pre_step(self, solver):
        solver._sync_to_host()
        for pa in self.particles:
            ParticleSplit(pa).do_particle_split()
        solver._sync_to_device()
        solver._nnps_carry = None

    def post_process(self, info_fname):
        if len(self.output_files) == 0:
            return
        from pysph_tpu.solver.output import load
        data = load(self.output_files[-1])
        fluid = data['arrays']['fluid']
        t = data['solver_data']['t']
        fname_res = os.path.join(self.output_dir, 'results.npz')
        savez(fname_res, t=t, x=np.asarray(fluid.x),
              y=np.asarray(fluid.y), dw=np.asarray(fluid.dw))


def compute_initial_props(particles):
    one_time_equations = [
        Group(equations=[SWEOS(dest='fluid')]),
    ]
    SPHEvaluator(particles, one_time_equations, dim=2,
                 kernel=CubicSpline(dim=2)).evaluate()


if __name__ == '__main__':
    app = CylindricalDamBreakSplit()
    app.run()
    app.post_process(app.info_filename)
