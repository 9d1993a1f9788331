"""Particle splitting in a square SWE domain: the interior particles
are flagged and split 1->7; the density after one evaluation measures
the splitting error (parity case for
/root/reference/pysph/examples/shallow_water/
particle_split_in_a_square_domain.py)."""

import numpy as np
from numpy import array, mgrid, ones_like, sqrt

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array_swe as gpa_swe
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.swe.basic import (
    CheckConvergenceDensityResidual, CheckForParticlesToSplit,
    GatherDensityEvalNextIteration, InitialGuessDensityVacondio,
    NonDimensionalDensityResidual, ParticleSplit, SWEIntegrator,
    SWEStep, UpdateSmoothingLength)
from pysph_tpu.tools.sph_evaluator import SPHEvaluator

rho_w = 10000.0
g = 9.81
dim = 2


class ParticleSplitTest(Application):
    def create_particles(self):
        hdx = 1.0
        d = 1.0
        dx = 50
        len_fluid_domain = 1400

        x, y = mgrid[0:len_fluid_domain + 1e-4:dx,
                     0:len_fluid_domain + 1e-4:dx]
        x = x.ravel()
        y = y.ravel()
        inner = ((6 * dx <= x) & (x <= len_fluid_domain - 6 * dx) &
                 (6 * dx <= y) & (y <= len_fluid_domain - 6 * dx))

        m = ones_like(x) * dx * dx * rho_w * d
        h = ones_like(x) * hdx * dx
        rho = ones_like(x) * rho_w * d
        A = m / rho
        A[inner] = 3000
        pa = gpa_swe(x=x, y=y, m=m, rho0=rho.copy(), rho=rho, h=h,
                     h0=h.copy(), A=A, name='fluid')

        x, y = mgrid[-2 * dx:len_fluid_domain + 2 * dx + 1e-4:dx,
                     -2 * dx:len_fluid_domain + 2 * dx + 1e-4:dx]
        x = x.ravel()
        y = y.ravel()
        sel = ((x < 0) | (y < 0) | (x > len_fluid_domain) |
               (y > len_fluid_domain))
        x, y = x[sel], y[sel]
        boundary = gpa_swe(
            name='boundary', x=x, y=y,
            m=ones_like(x) * dx * dx * rho_w * d,
            h=ones_like(x) * hdx * dx, rho=ones_like(x) * rho_w * d)
        compute_initial_props([pa])
        return [pa, boundary]

    def create_solver(self):
        kernel = CubicSpline(dim=2)
        integrator = SWEIntegrator(fluid=SWEStep())
        return Solver(kernel=kernel, dim=2, integrator=integrator,
                      dt=1e-4, tf=1e-4)

    def create_equations(self):
        return [
            Group(equations=[
                Group(equations=[
                    InitialGuessDensityVacondio(
                        dim=dim, dest='fluid', sources=['fluid'])]),
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
        ]

    def pre_step(self, solver):
        solver._sync_to_host()
        for pa in self.particles:
            ParticleSplit(pa).do_particle_split()
        solver._sync_to_device()
        solver._nnps_carry = None

    def post_process(self):
        rho_exact = 1e4
        rho_num = np.asarray(self.particles[0].rho)
        print('\nMax rho is %0.3f' % max(rho_num))
        l2_err_rho = sqrt(np.sum((rho_exact - rho_num) ** 2) /
                          len(rho_num))
        print('L2 error in density is %0.3f \n' % l2_err_rho)
        return l2_err_rho


def compute_initial_props(particles):
    one_time_equations = [
        Group(equations=[
            CheckForParticlesToSplit(
                dest='fluid', A_max=2900, x_min=300, x_max=1100,
                y_min=300, y_max=1100)]),
    ]
    SPHEvaluator(particles, one_time_equations, dim=2,
                 kernel=CubicSpline(dim=2)).evaluate()


if __name__ == '__main__':
    app = ParticleSplitTest()
    app.run()
    app.post_process()
