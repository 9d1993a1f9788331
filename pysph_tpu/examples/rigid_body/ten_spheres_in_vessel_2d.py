"""Ten spheres — five light (500) and five heavy (1500) — dropped
into a wide 2D vessel of water (parity case for
/root/reference/pysph/examples/rigid_body/ten_spheres_in_vessel_2d.py).
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


def get_2d_dam(length=10, height=15, dx=0.1, layers=2):
    _x = np.arange(0, length, dx)
    _y = np.arange(0, height, dx)
    x, y = np.meshgrid(_x, _y)
    x, y = x.ravel(), y.ravel()
    cond = ((x > (layers - 1) * dx) &
            (x < (x[-1] - (layers - 1) * dx)) &
            (y > (layers - 1) * dx))
    return x[~cond], y[~cond]


def get_2d_block(length=10, height=15, dx=0.1):
    x = np.arange(0, length, dx)
    y = np.arange(0, height, dx)
    x, y = np.meshgrid(x, y)
    return x.ravel(), y.ravel()


def get_fluid_and_dam_geometry(d_l, d_h, f_l, f_h, d_layers, d_dx,
                               f_dx, fluid_left_extreme=None):
    xd, yd = get_2d_dam(d_l, d_h, d_dx, d_layers)
    xf, yf = get_2d_block(f_l, f_h, f_dx)
    if fluid_left_extreme:
        xf = xf + fluid_left_extreme[0]
        yf = yf + fluid_left_extreme[1]
    else:
        xf = xf + 2 * d_dx
        yf = yf + 2 * d_dx
    return xd, yd, xf, yf


def get_circle(centre=(0, 0), radius=1, dx=0.1):
    x = np.arange(0, radius * 2, dx)
    x, y = np.meshgrid(x, x)
    x, y = x.ravel(), y.ravel()
    cond = ((x - radius) ** 2 + (y - radius) ** 2) <= radius ** 2
    x, y = x[cond], y[cond]
    return x + centre[0] - radius, y + centre[1] - radius


def create_ten_circles(radius=20e-3, spacing=1e-3,
                       fluid_height=300e-3):
    x1, y1 = get_circle(
        centre=[100e-3, fluid_height + radius + 30e-3],
        radius=radius, dx=spacing)
    x2, y2 = x1 + 2 * radius, y1 + 3 * radius
    x3, y3 = x2 + 2 * radius, y1
    x4, y4 = x3 + 2 * radius, y2
    x5, y5 = x4 + 2 * radius, y3
    x_left = np.concatenate([x1, x2, x3, x4, x5])
    y_left = np.concatenate([y1, y2, y3, y4, y5])
    x = np.concatenate([x_left, x_left + 500e-3])
    y = np.concatenate([y_left, y_left])
    return x, y


def get_rho_of_each_sphere(xc, yc, radius=20e-3, spacing=1e-3):
    x1, _ = get_circle(radius=radius, dx=spacing)
    pars = len(x1)
    rho = np.ones_like(xc)
    for i in range(len(rho) // pars):
        rho[i * pars:(i + 1) * pars] = 500 if i < 5 else 1500
    return rho


def get_body_id_of_each_sphere(xc, yc, radius=20e-3, spacing=1e-3):
    x1, _ = get_circle(radius=radius, dx=spacing)
    pars = len(x1)
    body_id = np.ones_like(xc, dtype=int)
    for i in range(len(body_id) // pars):
        body_id[i * pars:(i + 1) * pars] = i
    return body_id


class RigidFluidCoupling(Application):
    def initialize(self):
        self.dam_length = 1000e-3
        self.dam_height = 500e-3
        self.dam_spacing = 2e-3
        self.dam_layers = 3
        self.fluid_length = (1000e-3 -
                             3 * self.dam_layers * self.dam_spacing)
        self.fluid_height = 300e-3
        self.fluid_spacing = 5e-3
        self.fluid_rho = 1000.0
        self.sphere_radius = 30e-3
        self.sphere_spacing = 4e-3
        self.hdx = 1.2
        self.co = 2 * np.sqrt(2 * 9.81 * self.fluid_height)
        self.alpha = 0.1

    def create_particles(self):
        xt, yt, xf, yf = get_fluid_and_dam_geometry(
            self.dam_length, self.dam_height, self.fluid_length,
            self.fluid_height, self.dam_layers, self.dam_spacing,
            self.fluid_spacing,
            [3 * self.dam_spacing, 3 * self.dam_spacing])

        fluid = get_particle_array_wcsph(
            x=xf, y=yf, h=self.hdx * self.fluid_spacing,
            m=self.fluid_rho * self.fluid_spacing ** 2,
            rho=self.fluid_rho, name='fluid')
        tank = get_particle_array_wcsph(
            x=xt, y=yt, h=self.hdx * self.dam_spacing,
            m=self.fluid_rho * self.dam_spacing ** 2, rho=1000,
            rad_s=self.dam_spacing / 2.0, V=self.dam_spacing ** 2,
            name='tank')
        for name in ('fx', 'fy', 'fz'):
            tank.add_property(name)

        xc, yc = create_ten_circles(radius=self.sphere_radius,
                                    spacing=self.sphere_spacing,
                                    fluid_height=self.fluid_height)
        rho = get_rho_of_each_sphere(xc, yc, self.sphere_radius,
                                     self.sphere_spacing)
        body_id = get_body_id_of_each_sphere(
            xc, yc, self.sphere_radius, self.sphere_spacing)
        cube = get_particle_array_rigid_body(
            x=xc, y=yc, h=self.hdx * self.sphere_spacing,
            m=rho * self.sphere_spacing ** 2, rho=rho,
            rad_s=self.sphere_spacing / 2.0,
            V=self.sphere_spacing ** 2, cs=0.0, body_id=body_id,
            name='cube')
        return [fluid, tank, cube]

    def create_solver(self):
        kernel = CubicSpline(dim=2)
        integrator = EPECIntegrator(fluid=WCSPHStep(),
                                    cube=RK2StepRigidBody(),
                                    tank=WCSPHStep())
        return Solver(kernel=kernel, dim=2, integrator=integrator,
                      dt=1e-4, tf=1, adaptive_timestep=False)

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
                                    rho0=self.fluid_rho, c0=self.co,
                                    gamma=7.0)], real=False),
            Group(equations=[
                MomentumEquation(dest='fluid', sources=['fluid'],
                                 alpha=self.alpha, beta=0.0,
                                 c0=self.co, gy=-9.81),
                AkinciRigidFluidCoupling(dest='fluid',
                                         sources=['cube', 'tank']),
                XSPHCorrection(dest='fluid',
                               sources=['fluid', 'tank', 'cube']),
            ]),
            Group(equations=[
                RigidBodyCollision(dest='cube',
                                   sources=['tank', 'cube'],
                                   kn=1e5)]),
            Group(equations=[RigidBodyMoments(dest='cube',
                                              sources=None)]),
            Group(equations=[RigidBodyMotion(dest='cube',
                                             sources=None)]),
        ]


if __name__ == '__main__':
    app = RigidFluidCoupling()
    app.run()
