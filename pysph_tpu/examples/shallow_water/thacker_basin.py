"""Thacker basin: a circular water body sloshing in a frictionless
paraboloid basin — a classic analytic SWE benchmark with periodic
planar oscillation (parity case for
/root/reference/pysph/examples/shallow_water/thacker_basin.py)."""

import os

import numpy as np
from numpy import (arange, concatenate, cos, mgrid, ones_like, pi,
                   savez, sin, sqrt, zeros, zeros_like)

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array_swe as gpa_swe
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.swe.basic import (
    BedCurvature, BedGradient, CheckConvergenceDensityResidual,
    CorrectionFactorVariableSmoothingLength, FluidBottomCurvature,
    FluidBottomElevation, FluidBottomGradient,
    GatherDensityEvalNextIteration, GradientCorrection,
    GradientCorrectionPreStep, NonDimensionalDensityResidual,
    ParticleAcceleration, SWEIntegrator, SWEOS, SWEStep,
    UpdateSmoothingLength)
from pysph_tpu.tools.sph_evaluator import SPHEvaluator

rho_w = 1000.0
g = 9.81
dim = 2


class ThackerBasin(Application):
    def add_user_options(self, group):
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=1.5)
        group.add_argument('--r', action='store', type=float,
                           dest='r', default=3000.0,
                           help='Initial radius of the column (m)')
        group.add_argument('--n', action='store', type=int,
                           dest='n', default=75,
                           help='Concentric fluid circles (dr=r/n)')
        group.add_argument('--x_cen_fluid', action='store',
                           type=float, dest='x_cen_fluid',
                           default=1500.0,
                           help='x center of the fluid column (m)')
        group.add_argument('--y_cen_fluid', action='store',
                           type=float, dest='y_cen_fluid',
                           default=0.0,
                           help='y center of the fluid column (m)')
        group.add_argument('--zo', action='store', type=float,
                           dest='zo', default=10.0,
                           help='Parabola origin above bottom (m)')

    def consume_user_options(self):
        o = self.options
        self.hdx, self.r, self.n = o.hdx, o.r, int(o.n)
        self.x_cen_fluid = o.x_cen_fluid
        self.y_cen_fluid = o.y_cen_fluid
        self.zo = o.zo
        self.omega = sqrt(2 * g * self.zo) / self.r

    def create_particles(self):
        n = self.n
        hdx = self.hdx
        fluid_rad = self.r
        dr = (fluid_rad - 100) / n
        zo = self.zo

        dxb = 50.0
        xb, yb = mgrid[-5000:5000:dxb, -5000:5000:dxb]
        b = zo * ((xb ** 2 + yb ** 2) / fluid_rad ** 2)
        bed = gpa_swe(name='bed', x=xb, y=yb,
                      V=ones_like(xb) * dxb * dxb, b=b,
                      h=ones_like(xb) * hdx * dxb)
        bed.add_property('m_mat', stride=9)

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
        x = x + self.x_cen_fluid
        y = y + self.y_cen_fluid
        h = ones_like(x) * hdx * dr

        zeta = self.x_cen_fluid - 0.0
        u = zeros_like(x)
        v = ones_like(x) * -(zeta * self.omega)
        fluid_surf_hei = zo + (2 * zeta * (zo / fluid_rad) *
                               ((x / fluid_rad) -
                                (zeta / (2.0 * fluid_rad))))
        fluid = gpa_swe(x=x, y=y, h=h, h0=h.copy(), u=u, v=v,
                        vh=v.copy(), name='fluid')
        compute_fluid_elevation([fluid, bed])
        dw = fluid_surf_hei - fluid.b
        fluid.m = dw * rho_w * (1.56 * dr * dr)
        fluid.rho = dw * rho_w
        fluid.rho0 = dw * rho_w
        fluid.dw = dw
        compute_initial_props([fluid])
        return [fluid, bed]

    def create_solver(self):
        kernel = CubicSpline(dim=2)
        integrator = SWEIntegrator(fluid=SWEStep())
        tf = (2 * pi) / self.omega
        return Solver(kernel=kernel, dim=2, integrator=integrator,
                      cfl=0.3, adaptive_timestep=True,
                      output_at_times=[0.015 * tf, 0.505 * tf,
                                       0.980 * tf], tf=tf)

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
            Group(equations=[SWEOS(dest='fluid')]),
            Group(equations=[
                FluidBottomElevation(dest='fluid', sources=['bed'])]),
            Group(equations=[
                FluidBottomGradient(dest='fluid', sources=['bed'])]),
            Group(equations=[
                FluidBottomCurvature(dest='fluid', sources=['bed'])]),
            Group(equations=[
                ParticleAcceleration(dim=dim, dest='fluid',
                                     sources=['fluid'])]),
        ]

    def post_process(self, info_fname):
        if len(self.output_files) == 0:
            return
        from pysph_tpu.solver.output import load
        data = load(self.output_files[-1])
        fluid = data['arrays']['fluid']
        t = data['solver_data']['t']
        fname_res = os.path.join(self.output_dir, 'results.npz')
        savez(fname_res, t=t, x=np.asarray(fluid.x),
              y=np.asarray(fluid.y), dw=np.asarray(fluid.dw),
              u=np.asarray(fluid.u), v=np.asarray(fluid.v))


def compute_fluid_elevation(particles):
    one_time_equations = [
        Group(equations=[
            FluidBottomElevation(dest='fluid', sources=['bed'])]),
        Group(equations=[
            GradientCorrectionPreStep(dest='bed', sources=['bed'])]),
        Group(equations=[
            GradientCorrection(dest='bed', sources=['bed'])]),
        Group(equations=[BedGradient(dest='bed', sources=['bed'])]),
        Group(equations=[BedCurvature(dest='bed', sources=['bed'])]),
    ]
    SPHEvaluator(particles, one_time_equations, dim=2,
                 kernel=CubicSpline(dim=2)).evaluate()


def compute_initial_props(particles):
    one_time_equations = [
        Group(equations=[SWEOS(dest='fluid')]),
    ]
    SPHEvaluator(particles, one_time_equations, dim=2,
                 kernel=CubicSpline(dim=2)).evaluate()


if __name__ == '__main__':
    app = ThackerBasin()
    app.run()
    app.post_process(app.info_filename)
