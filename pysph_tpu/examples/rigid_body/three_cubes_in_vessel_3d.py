"""Three cubes of different density (2000/800/500) falling into a 3D
tank of water — sink, hover and float (parity case for
/root/reference/pysph/examples/rigid_body/three_cubes_in_vessel_3d.py).
"""

import numpy as np

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import (get_particle_array_rigid_body,
                                  get_particle_array_wcsph)
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.basic_equations import (ContinuityEquation,
                                           XSPHCorrection)
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.integrator import EPECIntegrator
from pysph_tpu.sph.integrator_step import WCSPHStep
from pysph_tpu.sph.rigid_body import (AkinciRigidFluidCoupling,
                                      BodyForce, RigidBodyCollision,
                                      RigidBodyMoments,
                                      RigidBodyMotion,
                                      RK2StepRigidBody)
from pysph_tpu.sph.wc.basic import (MomentumEquation,
                                    TaitEOSHGCorrection)


def get_3d_dam(length=10, height=15, depth=10, dx=0.1, layers=2):
    _x = np.arange(0, length, dx)
    _y = np.arange(0, height, dx)
    _z = np.arange(0, depth, dx)
    x, y, z = np.meshgrid(_x, _y, _z)
    x, y, z = x.ravel(), y.ravel(), z.ravel()
    tmp = layers - 1
    cond_1 = ((x > tmp * dx) & (x < _x[-1] - tmp * dx) &
              (y > tmp * dx))
    cond_2 = (z > tmp * dx) & (z < z[-1] - tmp * dx)
    cond = cond_1 & cond_2
    return x[~cond], y[~cond], z[~cond]


def get_3d_block(length=10, height=15, depth=10, dx=0.1):
    x = np.arange(0, length, dx)
    y = np.arange(0, height, dx)
    z = np.arange(0, depth, dx)
    x, y, z = np.meshgrid(x, y, z)
    return x.ravel(), y.ravel(), z.ravel()


def get_fluid_and_dam_geometry_3d(d_l, d_h, d_d, f_l, f_h, f_d,
                                  d_layers, d_dx, f_dx,
                                  fluid_left_extreme=None):
    xd, yd, zd = get_3d_dam(d_l, d_h, d_d, d_dx, d_layers)
    xf, yf, zf = get_3d_block(f_l, f_h, f_d, f_dx)
    if fluid_left_extreme:
        xt, yt, zt = fluid_left_extreme
        xf, yf, zf = xf + xt, yf + yt, zf + zt
    else:
        xf = xf + 2 * d_dx
        yf = yf + 2 * d_dx
        zf = zf + 2 * d_dx
    return xd, yd, zd, xf, yf, zf


def get_sphere(centre=(0, 0, 0), radius=1, dx=0.1):
    x = np.arange(0, radius * 2, dx)
    x, y, z = np.meshgrid(x, x, x)
    x, y, z = x.ravel(), y.ravel(), z.ravel()
    cond = ((x - radius) ** 2 + (y - radius) ** 2 +
            (z - radius) ** 2) <= radius ** 2
    x, y, z = x[cond], y[cond], z[cond]
    return (x + centre[0] - radius, y + centre[1] - radius,
            z + centre[2] - radius)


class RigidFluidCoupling(Application):
    def initialize(self):
        self._spacing = 4
        self.spacing = self._spacing * 1e-3
        self.dx = self.spacing
        self.hdx = 1.2
        self.ro = 1000
        self.solid_rho = 800
        self.m = 1000 * self.dx ** 3
        self.co = 2 * np.sqrt(2 * 9.81 * 150 * 1e-3)
        self.alpha = 0.1

    def create_particles(self):
        layers = 2
        flu_len = 150 - 2 * layers * self._spacing
        xt, yt, zt, xf, yf, zf = get_fluid_and_dam_geometry_3d(
            d_l=150, d_h=150, d_d=150, f_l=flu_len, f_h=52,
            f_d=flu_len, d_layers=2, d_dx=self._spacing,
            f_dx=self._spacing)
        xt, yt, zt = xt * 1e-3, yt * 1e-3, zt * 1e-3
        xf, yf, zf = xf * 1e-3, yf * 1e-3, zf * 1e-3

        xc, yc, zc = get_3d_block(20, 20, 20, self._spacing / 2.0)
        xc1, yc1, zc1 = ((xc + 60) * 1e-3, (yc + 120) * 1e-3,
                         (zc + 70) * 1e-3)
        xc2, yc2, zc2 = ((xc + 4 * self._spacing) * 1e-3,
                         (yc + 120) * 1e-3, (zc + 70) * 1e-3)
        xc3, yc3, zc3 = ((xc + 100) * 1e-3, (yc + 120) * 1e-3,
                         (zc + 70) * 1e-3)
        xc = np.concatenate((xc1, xc2, xc3))
        yc = np.concatenate((yc1, yc2, yc3))
        zc = np.concatenate((zc1, zc2, zc3))

        m = self.ro * self.spacing ** 3
        h = self.hdx * self.spacing
        fluid = get_particle_array_wcsph(
            x=xf, y=yf, z=zf, h=h, m=m, rho=self.ro, name='fluid')
        tank = get_particle_array_wcsph(
            x=xt, y=yt, z=zt, h=h, m=1000 * self.spacing ** 3,
            rho=1000, rad_s=self.spacing / 2.0,
            V=self.spacing ** 3, name='tank')
        for name in ('fx', 'fy', 'fz'):
            tank.add_property(name)

        h = self.hdx * self.spacing / 2.0
        rho = np.concatenate((np.full_like(xc1, 2000),
                              np.full_like(xc1, 800),
                              np.full_like(xc1, 500)))
        body = np.concatenate(
            (np.zeros_like(xc1, dtype=int),
             np.ones_like(xc1, dtype=int),
             np.full_like(xc1, 2, dtype=int)))
        cube = get_particle_array_rigid_body(
            x=xc, y=yc, z=zc, h=h, m=rho * (self.spacing / 2.0) ** 3,
            rho=rho, rad_s=self.spacing / 4.0,
            V=(self.spacing / 2.0) ** 3, cs=0.0, body_id=body,
            name='cube')
        print(fluid.get_number_of_particles(),
              tank.get_number_of_particles(),
              cube.get_number_of_particles())
        return [fluid, tank, cube]

    def create_solver(self):
        kernel = CubicSpline(dim=3)
        integrator = EPECIntegrator(fluid=WCSPHStep(),
                                    tank=WCSPHStep(),
                                    cube=RK2StepRigidBody())
        return Solver(kernel=kernel, dim=3, integrator=integrator,
                      dt=1e-4, tf=0.6, adaptive_timestep=False)

    def create_equations(self):
        return [
            Group(equations=[
                BodyForce(dest='cube', sources=None, gy=-9.81),
            ], real=False),
            Group(equations=[
                ContinuityEquation(dest='fluid',
                                   sources=['fluid', 'tank', 'cube']),
                ContinuityEquation(dest='tank',
                                   sources=['tank', 'fluid', 'cube']),
            ]),
            Group(equations=[
                TaitEOSHGCorrection(dest='fluid', sources=None,
                                    rho0=self.ro, c0=self.co,
                                    gamma=7.0),
                TaitEOSHGCorrection(dest='tank', sources=None,
                                    rho0=self.ro, c0=self.co,
                                    gamma=7.0),
            ], real=False),
            Group(equations=[
                MomentumEquation(dest='fluid',
                                 sources=['fluid', 'tank'],
                                 alpha=self.alpha, beta=0.0,
                                 c0=self.co, gy=-9.81),
                AkinciRigidFluidCoupling(dest='fluid',
                                         sources=['cube']),
                XSPHCorrection(dest='fluid',
                               sources=['fluid', 'tank']),
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
