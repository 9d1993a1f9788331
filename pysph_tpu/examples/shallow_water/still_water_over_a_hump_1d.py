"""Still water over a submerged sinusoidal hump, 1D SWE-SPH — the
surface should stay flat (Vacondio, Rogers & Stansby 2012; parity
case for /root/reference/pysph/examples/shallow_water/
still_water_over_a_hump_1d.py)."""

import os

from numpy import arange, array, ones_like, pi, savez, sin, sqrt, where

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
dim = 1


class StillWaterOverHump(Application):
    def add_user_options(self, group):
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=1.5,
                           help='h/dx.')
        group.add_argument('--dx', action='store', type=float,
                           dest='dx', default=0.005,
                           help='Spacing between the particles')
        group.add_argument('--fluid_surf_height', action='store',
                           type=float, dest='fluid_surf_hei',
                           default=0.4,
                           help='Surface height of fluid column (m)')
        group.add_argument('--le', action='store', type=float,
                           dest='le', default=1.0,
                           help='Initial length of the fluid column')

    def consume_user_options(self):
        self.hdx = self.options.hdx
        self.dx = self.options.dx
        self.fluid_surf_hei = self.options.fluid_surf_hei
        self.le = self.options.le

    def _boundary_dw(self, x_cb):
        return ones_like(x_cb) * self.fluid_surf_hei

    def _make_bed(self):
        dx = self.dx
        xb = arange(0, self.le + 1e-4, dx)
        cond = (0.25 < xb) & (xb < 0.75)
        b = where(cond, 0.05 * (1 + sin(pi * (4 * xb + 0.5))), 0)
        bed = gpa_swe(name='bed', x=xb, V=ones_like(xb) * dx, b=b,
                      h=ones_like(xb) * self.hdx * dx)
        # per-particle 3x3 gradient-correction matrix (the reference
        # declares it as a flat constant; here it is a stride-9 prop)
        bed.add_property('m_mat', stride=9)
        return bed

    def create_particles(self):
        hdx, dx = self.hdx, self.dx
        bed = self._make_bed()

        x = arange(0, self.le + 1e-4, dx)
        h = ones_like(x) * hdx * dx
        fluid = gpa_swe(x=x, h=h, h0=h.copy(), name='fluid')
        compute_fluid_elevation([fluid, bed])
        dw = self.fluid_surf_hei - fluid.b
        fluid.m = dw * rho_w * dx
        fluid.rho = dw * rho_w
        fluid.rho0 = dw * rho_w
        fluid.dw = dw
        compute_initial_props([fluid])

        x_cb = array([-2 * dx, -dx, self.le + dx, self.le + 2 * dx])
        dw_cb = self._boundary_dw(x_cb)
        boundary = gpa_swe(
            name='boundary', x=x_cb,
            m=rho_w * dx * dw_cb, h=ones_like(x_cb) * hdx * dx,
            rho=rho_w * dw_cb, dw=dw_cb, cs=sqrt(9.8 * dw_cb),
            alpha=dim * rho_w * dw_cb,
            no_art_visc=ones_like(x_cb, dtype=int))
        return [fluid, bed, boundary]

    def create_solver(self):
        kernel = CubicSpline(dim=1)
        integrator = SWEIntegrator(fluid=SWEStep())
        return Solver(kernel=kernel, dim=1, integrator=integrator,
                      cfl=0.3, adaptive_timestep=True, tf=5)

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
                FluidBottomElevation(dest='fluid', sources=['bed'])]),
            Group(equations=[
                FluidBottomGradient(dest='fluid', sources=['bed'])]),
            Group(equations=[
                FluidBottomCurvature(dest='fluid', sources=['bed'])]),
            Group(equations=[
                ParticleAcceleration(
                    dim=dim, dest='fluid',
                    sources=['fluid', 'boundary'], u_only=True)]),
        ]

    def post_process(self, info_fname):
        if len(self.output_files) == 0:
            return
        from pysph_tpu.solver.output import load
        import numpy as np
        data = load(self.output_files[-1])
        fluid = data['arrays']['fluid']
        t = data['solver_data']['t']
        x = np.asarray(fluid.x)
        dw = np.asarray(fluid.dw)
        b = np.asarray(fluid.b)
        u = np.asarray(fluid.u)
        surf = dw + b
        fname_res = os.path.join(self.output_dir, 'results.npz')
        savez(fname_res, t=t, x=x, b=b,
              exact_vel=np.zeros_like(x), u=u,
              numerical_fluid_surf_hei=surf,
              exact_fluid_surf_hei=ones_like(x) *
              self.fluid_surf_hei)
        return x, surf


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
    SPHEvaluator(particles, one_time_equations, dim=1,
                 kernel=CubicSpline(dim=1)).evaluate()


def compute_initial_props(particles):
    one_time_equations = [
        Group(equations=[SWEOS(dest='fluid')]),
    ]
    SPHEvaluator(particles, one_time_equations, dim=1,
                 kernel=CubicSpline(dim=1)).evaluate()


if __name__ == '__main__':
    app = StillWaterOverHump()
    app.run()
    app.post_process(app.info_filename)
