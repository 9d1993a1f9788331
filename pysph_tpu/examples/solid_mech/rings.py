"""Colliding elastic rings (2D elastic dynamics).

Parity case for /root/reference/pysph/examples/solid_mech/rings.py:
exercises the ElasticSolidsScheme (Hookean stress rate, artificial
stress via batched eigendecomposition)."""

import numpy

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.solid_mech.basic import (
    ElasticSolidsScheme, get_particle_array_elastic_dynamics)


class Rings(Application):
    def initialize(self):
        self.E = 1e7
        self.nu = 0.3975
        self.rho0 = 1.0
        self.dx = 0.0005
        self.hdx = 1.5
        self.h = self.hdx * self.dx
        self.ri = 0.03
        self.ro = 0.04
        self.spacing = 0.041
        self.dt = 1e-8
        self.tf = 5e-5

    def add_user_options(self, group):
        group.add_argument('--dx', action='store', type=float,
                           dest='dx', default=0.0005,
                           help='Particle spacing.')

    def consume_user_options(self):
        self.dx = self.options.dx
        self.h = self.hdx * self.dx

    def create_particles(self):
        spacing = self.spacing
        x, y = numpy.mgrid[-self.ro:self.ro:self.dx,
                           -self.ro:self.ro:self.dx]
        x = x.ravel()
        y = y.ravel()
        d = x * x + y * y
        keep = numpy.flatnonzero((self.ri ** 2 <= d) &
                                 (d < self.ro ** 2))
        x = x[keep]
        y = y[keep]
        x = numpy.concatenate([x - spacing, x + spacing])
        y = numpy.concatenate([y, y])
        dx = self.dx
        m = numpy.ones_like(x) * dx * dx
        h = numpy.ones_like(x) * self.hdx * dx
        rho = numpy.ones_like(x)
        kernel = CubicSpline(dim=2)
        wdeltap = float(kernel.kernel(rij=dx, h=self.h))
        pa = get_particle_array_elastic_dynamics(
            name='solid', x=x + spacing, y=y, m=m, rho=rho, h=h,
            constants=dict(wdeltap=wdeltap, n=4, rho_ref=self.rho0,
                           E=self.E, nu=self.nu))
        print('Elastic collision with %d particles' % x.size)
        u_f = 0.059
        pa.u = numpy.asarray(pa.cs) * u_f * (2 * (x < 0) - 1)
        return [pa]

    def create_scheme(self):
        s = ElasticSolidsScheme(elastic_solids=['solid'], solids=[],
                                dim=2)
        s.configure_solver(dt=self.dt, tf=self.tf, pfreq=500)
        return s


if __name__ == '__main__':
    app = Rings()
    app.run()
