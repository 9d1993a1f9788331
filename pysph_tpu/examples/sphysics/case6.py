"""SPHysics case 6: flap wavemaker in a beach channel with three
floating rigid obstacles (parity case for
/root/reference/pysph/examples/sphysics/case6.py).

The paddle kinematics run as a traced prescribed-motion equation
(see case3) instead of the reference's host pre_step hook."""

import numpy as np

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import (get_particle_array,
                                  get_particle_array_rigid_body)
from pysph_tpu.examples.sphysics.beach_geometry import get_beach_geometry_2d
from pysph_tpu.examples.sphysics.case3 import PaddleMotion
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.integrator_step import TwoStageRigidBodyStep
from pysph_tpu.sph.rigid_body import (BodyForce, LiuFluidForce,
                                      RigidBodyCollision,
                                      RigidBodyMoments,
                                      RigidBodyMotion,
                                      RK2StepRigidBody)
from pysph_tpu.sph.scheme import (AdamiHuAdamsScheme, SchemeChooser,
                                  WCSPHScheme)
from pysph_tpu.sph.wc.edac import EDACScheme
from pysph_tpu.tools.geometry import (get_2d_block,
                                      remove_overlap_particles)

h_fluid = 0.18
co = 10.0 * np.sqrt(2.0 * 9.81 * h_fluid)
ro = 1000.0
alp = 0.2
gamma = 7.0
flat_l = 2.0
side = 0.06
lx = 4.75
ly = 0.3
amplitude = 1.5
period = 1.4


def get_wavespaddle_geometry(hdx=1.5, dx_f=0.1, dx_s=0.05, r_f=100.,
                             r_s=100., length=3.75, height=0.3,
                             flat_l=1., angle=4.2364, h_fluid=0.2,
                             obstacle_side=0.06):
    x1, y1, x2, y2 = get_beach_geometry_2d(dx_s, length, height,
                                           flat_l, angle, 3)
    wall = get_particle_array(
        name='wall', x=x1, y=y1, rho=r_s, m=r_s * dx_s * dx_s,
        h=hdx * dx_s, cs=0.0, rad_s=dx_s)
    paddle = get_particle_array(
        name='paddle', x=x2, y=y2, rho=r_s, m=r_s * dx_s * dx_s,
        h=hdx * dx_s)
    fluid_center = np.array([flat_l - length / 2.0, h_fluid / 2.0])
    x_fluid, y_fluid = get_2d_block(dx_f, length, h_fluid,
                                    fluid_center)
    theta = np.pi * angle / 180.0
    keep = y_fluid >= np.tan(-theta) * x_fluid
    fluid = get_particle_array(
        name='fluid', x=x_fluid[keep], y=y_fluid[keep], rho=r_f,
        m=r_f * dx_f * dx_f, h=hdx * dx_f)
    xs, ys, bs = [], [], []
    for i, cx_cy in enumerate(((-0.38, 0.16), (-0.7, 0.16),
                               (-1.56, 0.22))):
        bx, by = get_2d_block(dx_s, obstacle_side, obstacle_side,
                              np.array(cx_cy))
        xs.append(bx)
        ys.append(by)
        bs.append(np.full_like(bx, i, dtype=int))
    x4 = np.concatenate(xs)
    y4 = np.concatenate(ys)
    b = np.concatenate(bs)
    obstacle = get_particle_array_rigid_body(
        name='obstacle', x=x4, y=y4, h=hdx * dx_s, rho=r_s * 0.5,
        m=r_s * 0.5 * dx_s * dx_s, cs=0.0, rad_s=dx_s, body_id=b)
    remove_overlap_particles(fluid, wall, dx_s, 2)
    remove_overlap_particles(fluid, paddle, dx_s, 2)
    remove_overlap_particles(fluid, obstacle, dx_s, 2)
    return fluid, wall, paddle, obstacle


class WavesPaddle2D(Application):
    def add_user_options(self, group):
        group.add_argument(
            '--hdx', action='store', type=float, dest='hdx',
            default=1.3,
            help='h/dx value used in SPH to change the smoothness')
        group.add_argument(
            '--dx', action='store', type=float, dest='dx',
            default=0.01, help='spacing between the particles')

    def consume_user_options(self):
        self.hdx = self.options.hdx
        self.dx = self.options.dx
        self.h0 = self.hdx * self.dx
        self.dt = 0.25 * self.h0 / co

    def create_particles(self):
        f, w, pad, obst = get_wavespaddle_geometry(
            self.hdx, self.dx, 0.75 * self.dx, length=lx, height=ly,
            h_fluid=h_fluid, obstacle_side=side, flat_l=flat_l,
            r_f=ro, r_s=ro)
        self.scheme.setup_properties([f, w, pad, obst], clean=False)
        for p in ('u0', 'v0', 'w0', 'x0', 'y0', 'z0'):
            if p not in pad.properties:
                pad.add_property(p)
        return [f, w, pad, obst]

    def create_scheme(self):
        wcsph = WCSPHScheme(
            ['fluid'], ['wall', 'paddle', 'obstacle'], dim=2,
            rho0=ro, c0=co, h0=0.01, hdx=1.3, gy=-9.81,
            hg_correction=True, alpha=alp, gamma=gamma,
            update_h=True)
        edac = EDACScheme(
            ['fluid'], ['wall', 'paddle', 'obstacle'], dim=2,
            rho0=ro, c0=co, gy=-9.81, alpha=alp, nu=0.0, h=0.01,
            clamp_p=True)
        aha = AdamiHuAdamsScheme(
            ['fluid'], ['wall', 'paddle', 'obstacle'], dim=2,
            rho0=ro, h0=0.01, gamma=1.0, alpha=alp, gy=-9.81, nu=0.0,
            c0=co)
        return SchemeChooser(default='wcsph', aha=aha, wcsph=wcsph,
                             edac=edac)

    def create_equations(self):
        eqns = self.scheme.get_equations()
        eqns.insert(0, Group(equations=[
            PaddleMotion(dest='paddle', sources=None, dx=self.dx,
                         amplitude=amplitude, period=period,
                         flat_l=flat_l)], real=False))
        eqns.append(Group(equations=[
            BodyForce(dest='obstacle', sources=None, gy=-9.81),
            RigidBodyCollision(dest='obstacle', sources=['wall'],
                               kn=1.0e4, en=0.8)], real=False))
        eqns.append(Group(equations=[
            LiuFluidForce(dest='fluid', sources=['obstacle'])]))
        eqns.append(Group(equations=[
            RigidBodyMoments(dest='obstacle', sources=None)]))
        eqns.append(Group(equations=[
            RigidBodyMotion(dest='obstacle', sources=None)]))
        return eqns

    def configure_scheme(self):
        s = self.scheme
        scheme = self.options.scheme
        if scheme == 'wcsph':
            s.configure(h0=self.h0, hdx=self.hdx)
        elif scheme == 'edac':
            s.configure(h=self.h0)
        step = dict(paddle=TwoStageRigidBodyStep(),
                    obstacle=RK2StepRigidBody())
        s.configure_solver(
            kernel=CubicSpline(dim=2), tf=7.0, dt=self.dt,
            adaptive_timestep=False, extra_steppers=step)


if __name__ == '__main__':
    app = WavesPaddle2D()
    app.run()
