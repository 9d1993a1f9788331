"""1D rectangular dam break over a wet bed: two fluid columns of
different depth and spacing (parity case for
/root/reference/pysph/examples/shallow_water/
rectangular_dambreak_wetbed_1d.py)."""

import os

import numpy as np
from numpy import arange, concatenate, ones_like, savez, sqrt, where

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array_swe as gpa_swe
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.swe.basic import (
    CheckConvergenceDensityResidual,
    CorrectionFactorVariableSmoothingLength,
    GatherDensityEvalNextIteration, NonDimensionalDensityResidual,
    ParticleAcceleration, SWEIntegrator, SWEOS, SWEStep,
    UpdateSmoothingLength)
from pysph_tpu.tools.sph_evaluator import SPHEvaluator

rho_w = 1000.0
g = 9.81
dim = 1


class RectangularDamBreak(Application):
    def add_user_options(self, group):
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=1.5)
        group.add_argument('--dx1', action='store', type=float,
                           dest='dx1', default=5.0,
                           help='Spacing in the first column')
        group.add_argument('--dx2', action='store', type=float,
                           dest='dx2', default=10.0,
                           help='Spacing in the second column')
        group.add_argument('--dw01', action='store', type=float,
                           dest='dw01', default=10.0,
                           help='Depth of the first column (m)')
        group.add_argument('--dw02', action='store', type=float,
                           dest='dw02', default=5.0,
                           help='Depth of the second column (m)')
        group.add_argument('--l1', action='store', type=float,
                           dest='l1', default=1000.0,
                           help='Length of the first column (m)')
        group.add_argument('--l2', action='store', type=float,
                           dest='l2', default=1000.0,
                           help='Length of the second column (m)')

    def consume_user_options(self):
        o = self.options
        self.hdx = o.hdx
        self.dx1, self.dx2 = o.dx1, o.dx2
        self.dw01, self.dw02 = o.dw01, o.dw02
        self.l1, self.l2 = o.l1, o.l2

    def create_particles(self):
        hdx = self.hdx
        dx1, dx2 = self.dx1, self.dx2
        l1, l2 = self.l1, self.l2
        tot_l = l1 + l2
        d1, d2 = self.dw01, self.dw02

        x = concatenate((arange(0, l1, dx1),
                         arange(l1, tot_l + 1e-4, dx2)))
        left = x < l1
        dxs = where(left, dx1, dx2)
        ds = where(left, d1, d2)
        m = dxs * rho_w * ds
        h = hdx * dxs
        rho = rho_w * ds
        fluid = gpa_swe(x=x, m=m, rho=rho, rho0=rho.copy(), h=h,
                        h0=h.copy(), name='fluid')

        x = concatenate((arange(-2 * dx1, l1, dx1),
                         arange(l1, tot_l + 2 * dx2 + 1e-4, dx2)))
        keep = (x < 0) | (x > tot_l)
        x = x[keep]
        left = x < 0
        dxs = where(left, dx1, dx2)
        ds = where(left, d1, d2)
        boundary = gpa_swe(
            name='boundary', x=x, m=dxs * rho_w * ds, h=hdx * dxs,
            rho=rho_w * ds, dw=ds, cs=sqrt(9.8 * ds),
            alpha=dim * rho_w * ds)
        compute_initial_props([fluid, boundary])
        return [fluid, boundary]

    def create_solver(self):
        kernel = CubicSpline(dim=1)
        integrator = SWEIntegrator(fluid=SWEStep())
        return Solver(kernel=kernel, dim=1, integrator=integrator,
                      cfl=0.3, adaptive_timestep=True,
                      output_at_times=[10, 20, 30, 40, 50, 60],
                      tf=60)

    def create_equations(self):
        return [
            Group(equations=[
                Group(equations=[
                    GatherDensityEvalNextIteration(
                        dest='fluid',
                        sources=['fluid', 'boundary'])]),
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
                    dest='fluid', sources=['fluid', 'boundary'])]),
            Group(equations=[SWEOS(dest='fluid')]),
            Group(equations=[
                ParticleAcceleration(
                    dim=dim, dest='fluid',
                    sources=['fluid', 'boundary'], visc_option=2,
                    u_only=True)]),
        ]

    def post_process(self, info_fname):
        if len(self.output_files) == 0:
            return
        from pysph_tpu.solver.output import load
        data = load(self.output_files[-1])
        fluid = data['arrays']['fluid']
        t = data['solver_data']['t']
        x = np.asarray(fluid.x)
        dw = np.asarray(fluid.dw)
        u = np.asarray(fluid.u)
        fname_res = os.path.join(self.output_dir, 'results.npz')
        savez(fname_res, t=t, x=x, dw=dw, u=u)
        return x, dw


def compute_initial_props(particles):
    one_time_equations = [
        Group(equations=[SWEOS(dest='fluid')]),
    ]
    SPHEvaluator(particles, one_time_equations, dim=1,
                 kernel=CubicSpline(dim=1)).evaluate()


if __name__ == '__main__':
    app = RectangularDamBreak()
    app.run()
    app.post_process(app.info_filename)
