"""A very simple benchmark case: a cube of water falling freely
under gravity, WCSPH, 5 time steps at a configurable particle count
(parity case for /root/reference/pysph/examples/cube.py).

Run with ``pysph_tpu run cube --np 2e6 --disable-output`` to gauge
raw throughput at a given particle count."""

import numpy

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array_wcsph
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.scheme import WCSPHScheme

rho0 = 1000.0


class Cube(Application):
    def add_user_options(self, group):
        group.add_argument(
            '--np', action='store', type=float, dest='np',
            default=int(1e5),
            help='Number of particles in the cube (1e5 by default).')

    def consume_user_options(self):
        self.hdx = 1.5
        self.dx = 1.0 / pow(self.options.np, 1.0 / 3.0)

    def configure_scheme(self):
        self.scheme.configure(h0=self.hdx * self.dx, hdx=self.hdx)
        kernel = CubicSpline(dim=3)
        self.scheme.configure_solver(kernel=kernel, tf=5e-4, dt=1e-4)

    def create_scheme(self):
        return WCSPHScheme(
            ['fluid'], [], dim=3, rho0=rho0, c0=10.0, h0=0.1,
            hdx=1.5, gz=-9.81, gamma=7.0, alpha=0.5, beta=0.0)

    def create_particles(self):
        dx = self.dx
        x, y, z = numpy.mgrid[0:1:dx, 0:1:dx, 0:1:dx]
        x, y, z = x.ravel(), y.ravel(), z.ravel()
        fluid = get_particle_array_wcsph(name='fluid', x=x, y=y, z=z)
        fluid.m[:] = rho0 * dx ** 3
        fluid.h[:] = self.hdx * dx
        fluid.rho[:] = rho0
        print("Number of particles:", x.size)
        return [fluid]


if __name__ == '__main__':
    app = Cube()
    app.run()
