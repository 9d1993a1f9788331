"""A heavy wood cube falling onto a light cube floating in a tank —
two interacting rigid bodies coupled to fluid (parity case for
/root/reference/pysph/examples/rigid_body/cubes_colliding_in_tank.py).
"""

import numpy as np

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import (get_particle_array_rigid_body,
                                  get_particle_array_wcsph)
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.basic_equations import (ContinuityEquation,
                                           SummationDensity,
                                           XSPHCorrection)
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.integrator import EPECIntegrator
from pysph_tpu.sph.integrator_step import WCSPHStep
from pysph_tpu.sph.rigid_body import (BodyForce, LiuFluidForce,
                                      RigidBodyCollision,
                                      RigidBodyMoments,
                                      RigidBodyMotion,
                                      RK2StepRigidBody)
from pysph_tpu.sph.wc.basic import (MomentumEquation,
                                    TaitEOSHGCorrection)


def create_boundary():
    dx = 2
    xb = np.arange(-2 * dx, 140 + 2 * dx, dx)
    yb = np.arange(-2 * dx, 0, dx)
    xb, yb = np.meshgrid(xb, yb)
    xl = np.arange(-2 * dx, 0, dx)
    yl = np.arange(0, 150, dx)
    xl, yl = np.meshgrid(xl, yl)
    xr = np.arange(140, 140 + 2 * dx, dx)
    yr = np.arange(0, 150, dx)
    xr, yr = np.meshgrid(xr, yr)
    x = np.concatenate([xl.ravel(), xb.ravel(), xr.ravel()])
    y = np.concatenate([yl.ravel(), yb.ravel(), yr.ravel()])
    return x * 1e-3, y * 1e-3


def create_fluid():
    dx = 2
    xf = np.arange(0, 140, dx)
    yf = np.arange(0, 130, dx)
    xf, yf = np.meshgrid(xf, yf)
    xf, yf = xf.ravel(), yf.ravel()
    p = (xf > 59) & (xf < 81) & (yf > 119)
    return xf[~p] * 1e-3, yf[~p] * 1e-3


def create_cube(dx=1):
    x = np.arange(60, 80, dx)
    y = np.arange(121, 141, dx)
    x, y = np.meshgrid(x, y)
    return x.ravel() * 1e-3, y.ravel() * 1e-3


def get_density(y):
    c_0 = 2 * np.sqrt(2 * 9.81 * 130 * 1e-3)
    rho_0 = 1000
    height_water_clmn = 130 * 1e-3
    gamma = 7.0
    _tmp = gamma / (rho_0 * c_0 ** 2)
    p_i = rho_0 * 9.81 * (height_water_clmn - y)
    return rho_0 * (1 + p_i * _tmp) ** (1.0 / gamma)


class RigidFluidCoupling(Application):
    """A wood cube (rho 2120) falls onto a floating light cube."""

    def initialize(self):
        self.dx = 2 * 1e-3
        self.hdx = 1.2
        self.ro = 1000
        self.solid_rho = 500
        self.wood_rho = 2120
        self.m = 1000 * self.dx * self.dx
        self.co = 2 * np.sqrt(2 * 9.81 * 130 * 1e-3)
        self.alpha = 0.1

    def create_particles(self):
        xf, yf = create_fluid()
        m = get_density(yf) * self.dx * self.dx
        h = self.hdx * self.dx
        fluid = get_particle_array_wcsph(
            x=xf, y=yf, h=h, m=m, rho=self.ro, name='fluid')

        xt, yt = create_boundary()
        tank = get_particle_array_wcsph(
            x=xt, y=yt, h=h, m=1000 * self.dx * self.dx, rho=1000,
            rad_s=2 / 2.0 * 1e-3, name='tank')

        dx = 1
        xc, yc = create_cube(1)
        cube = get_particle_array_rigid_body(
            x=xc, y=yc, h=h, m=self.solid_rho * dx * dx * 1e-6,
            rho=self.solid_rho, rad_s=dx / 2.0 * 1e-3, cs=0.0,
            name='cube')

        xw, yw = create_cube(1)
        wood = get_particle_array_rigid_body(
            x=xw + 0.02, y=yw + 0.04, h=h,
            m=self.wood_rho * dx * dx * 1e-6, rho=self.wood_rho,
            rad_s=dx / 2.0 * 1e-3, cs=0.0, name='wood')
        return [fluid, tank, cube, wood]

    def create_solver(self):
        kernel = CubicSpline(dim=2)
        integrator = EPECIntegrator(
            fluid=WCSPHStep(), tank=WCSPHStep(),
            cube=RK2StepRigidBody(), wood=RK2StepRigidBody())
        dt = 0.125 * self.dx * self.hdx / (self.co * 1.1) / 2.0
        return Solver(kernel=kernel, dim=2, integrator=integrator,
                      dt=dt, tf=1.5, adaptive_timestep=False)

    def create_equations(self):
        return [
            Group(equations=[
                BodyForce(dest='cube', sources=None, gy=-9.81),
                BodyForce(dest='wood', sources=None, gy=-9.81),
                SummationDensity(dest='cube',
                                 sources=['fluid', 'cube']),
                SummationDensity(dest='wood',
                                 sources=['fluid', 'wood']),
            ], real=False),
            Group(equations=[
                TaitEOSHGCorrection(dest='wood', sources=None,
                                    rho0=self.wood_rho, c0=self.co,
                                    gamma=7.0),
                TaitEOSHGCorrection(dest='cube', sources=None,
                                    rho0=self.solid_rho, c0=self.co,
                                    gamma=7.0),
                TaitEOSHGCorrection(dest='fluid', sources=None,
                                    rho0=self.ro, c0=self.co,
                                    gamma=7.0),
                TaitEOSHGCorrection(dest='tank', sources=None,
                                    rho0=self.ro, c0=self.co,
                                    gamma=7.0),
            ], real=False),
            Group(equations=[
                ContinuityEquation(
                    dest='fluid',
                    sources=['fluid', 'tank', 'cube', 'wood']),
                ContinuityEquation(
                    dest='tank',
                    sources=['fluid', 'tank', 'cube', 'wood']),
                MomentumEquation(dest='fluid',
                                 sources=['fluid', 'tank'],
                                 alpha=self.alpha, beta=0.0,
                                 c0=self.co, gy=-9.81),
                LiuFluidForce(dest='fluid', sources=['cube']),
                LiuFluidForce(dest='fluid', sources=['wood']),
                XSPHCorrection(dest='fluid',
                               sources=['fluid', 'tank']),
            ]),
            Group(equations=[
                RigidBodyCollision(dest='cube',
                                   sources=['tank', 'wood'],
                                   kn=1e6)]),
            Group(equations=[RigidBodyMoments(dest='cube',
                                              sources=None)]),
            Group(equations=[RigidBodyMotion(dest='cube',
                                             sources=None)]),
            Group(equations=[
                RigidBodyCollision(dest='wood',
                                   sources=['tank', 'cube'],
                                   kn=1e6)]),
            Group(equations=[RigidBodyMoments(dest='wood',
                                              sources=None)]),
            Group(equations=[RigidBodyMotion(dest='wood',
                                             sources=None)]),
        ]


if __name__ == '__main__':
    app = RigidFluidCoupling()
    app.run()
