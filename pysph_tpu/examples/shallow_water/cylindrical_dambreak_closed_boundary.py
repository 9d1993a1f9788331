"""Cylindrical SWE dam break inside a circular closed wall: the
radial bore reflects off the wall (Vacondio et al.; parity case for
/root/reference/pysph/examples/shallow_water/
cylindrical_dambreak_closed_boundary.py)."""

import os

import numpy as np
from numpy import (arange, concatenate, cos, intersect1d, mgrid,
                   ones_like, pi, savez, sin, sqrt, where, zeros)

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
dim = 2


class CylindricalDamBreakClosedBoundary(Application):
    def add_user_options(self, group):
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=1.5)
        group.add_argument('--dw0', action='store', type=float,
                           dest='dw0', default=10.0,
                           help='Initial depth of the column (m)')
        group.add_argument('--r', action='store', type=float,
                           dest='r', default=10.0,
                           help='Initial radius of the column (m)')
        group.add_argument('--n', action='store', type=int,
                           dest='n', default=105,
                           help='Concentric fluid circles (dr=r/n)')
        group.add_argument('--inner_r_wall', action='store',
                           type=float, dest='inner_r_wall',
                           default=15.0,
                           help='Inner radius of the wall (m)')
        group.add_argument('--n_wall', action='store', type=float,
                           dest='n_wall', default=10,
                           help='Concentric wall circles')

    def consume_user_options(self):
        o = self.options
        self.hdx, self.dw0 = o.hdx, o.dw0
        self.r, self.n = o.r, int(o.n)
        self.inner_r_wall, self.n_wall = o.inner_r_wall, o.n_wall

    def create_particles(self):
        n, r = self.n, self.r
        dr = r / n
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
        fluid = gpa_swe(x=x, y=y, m=m, rho=rho, rho0=rho.copy(),
                        h=h, h0=h.copy(), name='fluid')
        compute_initial_props([fluid])

        inner_r_wall = self.inner_r_wall
        x, y = mgrid[-1.5 * inner_r_wall:1.5 * inner_r_wall:dr,
                     -1.5 * inner_r_wall:1.5 * inner_r_wall:dr]
        x = x.ravel()
        y = y.ravel()
        idx1 = where(inner_r_wall ** 2 <= (x ** 2 + y ** 2))[0]
        idx2 = where((x ** 2 + y ** 2) <
                     (inner_r_wall + self.n_wall * dr) ** 2)
        idx = intersect1d(idx1, idx2)
        x_cb, y_cb = x[idx], y[idx]
        rho_cb = ones_like(x_cb) * rho_w * d
        dw_cb = ones_like(x_cb) * d
        boundary = gpa_swe(
            name='boundary', x=x_cb, y=y_cb,
            m=ones_like(x_cb) * (1.56 * dr * dr) * rho_w * d,
            h=ones_like(x_cb) * hdx * dr, rho=rho_cb, dw=dw_cb,
            cs=sqrt(9.8 * dw_cb), alpha=dim * rho_cb,
            is_wall_boun_pa=ones_like(x_cb))
        return [fluid, boundary]

    def create_solver(self):
        kernel = CubicSpline(dim=2)
        integrator = SWEIntegrator(fluid=SWEStep())
        return Solver(kernel=kernel, dim=2, integrator=integrator,
                      cfl=0.1, adaptive_timestep=True,
                      output_at_times=(0.1, 0.4, 2.0), tf=2.0)

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
                    sources=['fluid', 'boundary'])]),
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
              y=np.asarray(fluid.y), dw=np.asarray(fluid.dw))


def compute_initial_props(particles):
    one_time_equations = [
        Group(equations=[SWEOS(dest='fluid')]),
    ]
    SPHEvaluator(particles, one_time_equations, dim=2,
                 kernel=CubicSpline(dim=2)).evaluate()


if __name__ == '__main__':
    app = CylindricalDamBreakClosedBoundary()
    app.run()
    app.post_process(app.info_filename)
