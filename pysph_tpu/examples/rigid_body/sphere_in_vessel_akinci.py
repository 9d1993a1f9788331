"""A sphere of density 500 falling into a hydrostatic tank, coupled
with the Akinci rigid-fluid formulation (parity case for
/root/reference/pysph/examples/rigid_body/sphere_in_vessel_akinci.py).
"""

import numpy as np

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import (get_particle_array_rigid_body,
                                  get_particle_array_wcsph)
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.basic_equations import (SummationDensity,
                                           XSPHCorrection)
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.integrator import EPECIntegrator
from pysph_tpu.sph.integrator_step import WCSPHStep
from pysph_tpu.sph.rigid_body import (AkinciRigidFluidCoupling,
                                      BodyForce, RigidBodyCollision,
                                      RigidBodyMoments,
                                      RigidBodyMotion,
                                      RK2StepRigidBody,
                                      SummationDensityBoundary)
from pysph_tpu.sph.wc.basic import (MomentumEquation,
                                    TaitEOSHGCorrection)


def create_boundary():
    dx = 2
    xb = np.arange(-2 * dx, 100 + 2 * dx, dx)
    yb = np.arange(-2 * dx, 0, dx)
    xb, yb = np.meshgrid(xb, yb)
    xl = np.arange(-2 * dx, 0, dx)
    yl = np.arange(0, 250, dx)
    xl, yl = np.meshgrid(xl, yl)
    xr = np.arange(100, 100 + 2 * dx, dx)
    yr = np.arange(0, 250, dx)
    xr, yr = np.meshgrid(xr, yr)
    x = np.concatenate([xl.ravel(), xb.ravel(), xr.ravel()])
    y = np.concatenate([yl.ravel(), yb.ravel(), yr.ravel()])
    return x * 1e-3, y * 1e-3


def create_fluid():
    dx = 2
    xf = np.arange(0, 100, dx)
    yf = np.arange(0, 150, dx)
    xf, yf = np.meshgrid(xf, yf)
    return xf.ravel() * 1e-3, yf.ravel() * 1e-3


def create_sphere(dx=1):
    x = np.arange(0, 100, dx)
    y = np.arange(151, 251, dx)
    x, y = np.meshgrid(x, y)
    x, y = x.ravel(), y.ravel()
    p = ((x - 50) ** 2 + (y - 200) ** 2) < 20 ** 2
    return x[p] * 1e-3, (y[p] - 20) * 1e-3


class RigidFluidCoupling(Application):
    def initialize(self):
        self.dx = 2 * 1e-3
        self.hdx = 1.2
        self.ro = 1000
        self.solid_rho = 500
        self.m = 1000 * self.dx * self.dx
        self.co = 2 * np.sqrt(2 * 9.81 * 150 * 1e-3)
        self.alpha = 0.1

    def create_particles(self):
        xf, yf = create_fluid()
        h = self.hdx * self.dx
        fluid = get_particle_array_wcsph(
            x=xf, y=yf, h=h, m=self.ro * self.dx * self.dx,
            rho=self.ro, name='fluid')

        dx = 2
        xt, yt = create_boundary()
        tank = get_particle_array_wcsph(
            x=xt, y=yt, h=h, m=1000 * self.dx * self.dx, rho=1000,
            rad_s=2 / 2.0 * 1e-3, V=dx * dx * 1e-6, name='tank')
        for name in ('fx', 'fy', 'fz'):
            tank.add_property(name)

        dx = 1
        xc, yc = create_sphere(1)
        cube = get_particle_array_rigid_body(
            x=xc, y=yc, h=h, m=self.solid_rho * dx * dx * 1e-6,
            rho=self.solid_rho, rad_s=dx / 2.0 * 1e-3,
            V=dx * dx * 1e-6, cs=0.0, name='cube')
        return [fluid, tank, cube]

    def create_solver(self):
        kernel = CubicSpline(dim=2)
        integrator = EPECIntegrator(fluid=WCSPHStep(),
                                    tank=WCSPHStep(),
                                    cube=RK2StepRigidBody())
        dt = 0.125 * self.dx * self.hdx / (self.co * 1.1) / 2.0
        return Solver(kernel=kernel, dim=2, integrator=integrator,
                      dt=dt, tf=0.5, adaptive_timestep=False)

    def create_equations(self):
        return [
            Group(equations=[
                BodyForce(dest='cube', sources=None, gy=-9.81),
            ], real=False),
            Group(equations=[
                SummationDensity(dest='fluid', sources=['fluid']),
                SummationDensityBoundary(
                    dest='fluid', sources=['tank', 'cube'],
                    fluid_rho=1000.0)]),
            Group(equations=[
                TaitEOSHGCorrection(dest='fluid', sources=None,
                                    rho0=self.ro, c0=self.co,
                                    gamma=7.0)], real=False),
            Group(equations=[
                MomentumEquation(dest='fluid', sources=['fluid'],
                                 alpha=self.alpha, beta=0.0,
                                 c0=self.co, gy=-9.81),
                AkinciRigidFluidCoupling(dest='fluid',
                                         sources=['cube', 'tank']),
                XSPHCorrection(dest='fluid',
                               sources=['fluid', 'tank']),
            ]),
            Group(equations=[
                RigidBodyCollision(dest='cube', sources=['tank'],
                                   kn=1e5)]),
            Group(equations=[RigidBodyMoments(dest='cube',
                                              sources=None)]),
            Group(equations=[RigidBodyMotion(dest='cube',
                                             sources=None)]),
        ]


if __name__ == '__main__':
    app = RigidFluidCoupling()
    app.run()
