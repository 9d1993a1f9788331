"""A light solid sphere dropped into a hydrostatic tank, rising to
float — rigid-fluid coupling via Liu fluid force (parity case for
/root/reference/pysph/examples/rigid_body/solid_body_floating_in_tank.py).
"""

import numpy as np

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import (get_particle_array_rigid_body,
                                  get_particle_array_wcsph)
from pysph_tpu.examples.rigid_body.sphere_in_vessel_akinci import (
    create_boundary, create_fluid, create_sphere)
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


def get_density(y):
    height = 150
    c_0 = 2 * np.sqrt(2 * 9.81 * height * 1e-3)
    rho_0 = 1000
    gamma = 7.0
    _tmp = gamma / (rho_0 * c_0 ** 2)
    p_i = rho_0 * 9.81 * (height * 1e-3 - y)
    return rho_0 * (1 + p_i * _tmp) ** (1.0 / gamma)


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
        m = get_density(yf) * self.dx * self.dx
        h = self.hdx * self.dx
        fluid = get_particle_array_wcsph(
            x=xf, y=yf, h=h, m=m, rho=self.ro, name='fluid')

        xt, yt = create_boundary()
        tank = get_particle_array_wcsph(
            x=xt, y=yt, h=h, m=1000 * self.dx * self.dx, rho=1000,
            rad_s=2 / 2.0 * 1e-3, name='tank')

        dx = 1
        xc, yc = create_sphere(1)
        cube = get_particle_array_rigid_body(
            x=xc, y=yc, h=h, m=self.solid_rho * dx * dx * 1e-6,
            rho=self.solid_rho, rad_s=dx / 2.0 * 1e-3, cs=0.0,
            name='cube')
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
                SummationDensity(dest='cube',
                                 sources=['fluid', 'cube']),
            ], real=False),
            Group(equations=[
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
                ContinuityEquation(dest='fluid',
                                   sources=['fluid', 'tank', 'cube']),
                ContinuityEquation(dest='tank',
                                   sources=['fluid', 'tank', 'cube']),
                MomentumEquation(dest='fluid',
                                 sources=['fluid', 'tank', 'cube'],
                                 alpha=self.alpha, beta=0.0,
                                 c0=self.co, gy=-9.81),
                LiuFluidForce(dest='fluid', sources=['cube']),
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
