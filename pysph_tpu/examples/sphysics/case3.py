"""SPHysics case 3: flap wavemaker driving waves onto a beach
(parity case for /root/reference/pysph/examples/sphysics/case3.py).

The reference drives the paddle from a host-side ``pre_step`` hook;
here the same kinematics run device-side as a prescribed-motion
equation (the established pattern of sloshing_tank_pitch /
spheric.moving_square), so chunked dispatch stays available."""

import numpy as np
import jax.numpy as jnp

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.examples.sphysics.beach_geometry import get_beach_geometry_2d
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.equation import Equation, Group
from pysph_tpu.sph.integrator_step import TwoStageRigidBodyStep
from pysph_tpu.sph.scheme import (AdamiHuAdamsScheme, SchemeChooser,
                                  WCSPHScheme)
from pysph_tpu.sph.wc.edac import EDACScheme
from pysph_tpu.tools.geometry import (get_2d_block,
                                      remove_overlap_particles)

h_fluid = 0.25
co = 10.0 * np.sqrt(2.0 * 9.81 * h_fluid)
flat_l = 1.0
gamma = 7.0
ro = 100.0
alp = 0.2
amplitude = 1.0
period = 1.4


def get_wavespaddle_geometry(hdx=1.5, dx_f=0.1, dx_s=0.1, r_f=100.,
                             r_s=100., length=3.75, height=0.3,
                             flat_l=1., angle=4.2364, h_fluid=0.2):
    x1, y1, x2, y2 = get_beach_geometry_2d(dx_s, length, height,
                                           flat_l, angle, 5)
    wall = get_particle_array(name='wall', x=x1, y=y1, rho=r_s,
                              m=r_s * dx_s * dx_s, h=hdx * dx_s)
    paddle = get_particle_array(name='paddle', x=x2, y=y2, rho=r_s,
                                m=r_s * dx_s * dx_s, h=hdx * dx_s)
    fluid_center = np.array([flat_l - length / 2.0, h_fluid / 2.0])
    x_fluid, y_fluid = get_2d_block(dx_f, length, h_fluid,
                                    fluid_center)
    theta = np.pi * angle / 180.0
    keep = y_fluid >= np.tan(-theta) * x_fluid
    fluid = get_particle_array(
        name='fluid', x=x_fluid[keep], y=y_fluid[keep], rho=r_f,
        m=r_f * dx_f * dx_f, h=hdx * dx_f)
    remove_overlap_particles(fluid, wall, dx_s, 2)
    remove_overlap_particles(fluid, paddle, dx_s, 2)
    return fluid, wall, paddle


class PaddleMotion(Equation):
    """Flap kinematics of the reference pre_step hook."""

    def __init__(self, dest, sources, dx, amplitude, period, flat_l):
        self.dx = dx
        self.amplitude = amplitude
        self.period = period
        self.flat_l = flat_l
        super(PaddleMotion, self).__init__(dest, sources)

    def initialize(self, d_idx, d_u, d_v, d_x, d_y, t=0.0):
        theta = 2.0 * jnp.pi * t / self.period
        d_u[d_idx] = self.amplitude * (d_y[d_idx] - self.dx) * \
            jnp.cos(theta)
        d_v[d_idx] = self.amplitude * (self.flat_l - d_x[d_idx]) * \
            jnp.cos(theta)


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
        fluid, wall, paddle = get_wavespaddle_geometry(
            self.hdx, self.dx, self.dx, h_fluid=h_fluid)
        self.scheme.setup_properties([fluid, wall, paddle])
        for p in ('u0', 'v0', 'w0', 'x0', 'y0', 'z0'):
            if p not in paddle.properties:
                paddle.add_property(p)
        return [fluid, wall, paddle]

    def create_scheme(self):
        aha = AdamiHuAdamsScheme(
            ['fluid'], ['wall', 'paddle'], dim=2, rho0=ro, c0=co,
            alpha=alp, gy=-9.81, nu=0.0, h0=0.01, gamma=1.0)
        wcsph = WCSPHScheme(
            ['fluid'], ['wall', 'paddle'], dim=2, rho0=ro, c0=co,
            h0=0.01, hdx=1.3, hg_correction=True, gy=-9.81,
            alpha=alp, gamma=gamma, update_h=True)
        edac = EDACScheme(
            ['fluid'], ['wall', 'paddle'], dim=2, rho0=ro, c0=co,
            gy=-9.81, alpha=0.0, nu=0.0, h=0.01, clamp_p=True)
        return SchemeChooser(default='wcsph', wcsph=wcsph, aha=aha,
                             edac=edac)

    def create_equations(self):
        eqns = self.scheme.get_equations()
        eqns.insert(0, Group(equations=[
            PaddleMotion(dest='paddle', sources=None, dx=self.dx,
                         amplitude=amplitude, period=period,
                         flat_l=flat_l)], real=False))
        return eqns

    def configure_scheme(self):
        s = self.scheme
        scheme = self.options.scheme
        if scheme == 'wcsph':
            s.configure(h0=self.h0, hdx=self.hdx)
        elif scheme == 'aha':
            s.configure(h0=self.h0)
        elif scheme == 'edac':
            s.configure(h=self.h0)
        step = dict(paddle=TwoStageRigidBodyStep())
        s.configure_solver(
            kernel=CubicSpline(dim=2), tf=5.0, dt=self.dt,
            adaptive_timestep=False, extra_steppers=step)


if __name__ == '__main__':
    app = WavesPaddle2D()
    app.run()
