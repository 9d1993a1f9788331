r"""Cheng and Shu's 1D acoustic wave propagation (parity case for
/root/reference/pysph/examples/gas_dynamics/cheng_shu_1d.py).

.. math::
        \rho = \rho_0 + \Delta\rho \sin(kx),\qquad p = 1,
        \qquad u = 1 + 0.1\sin(kx)

with :math:`\Delta\rho = 1`, :math:`k = 2\pi/\lambda`,
:math:`\rho_0 = 2` and :math:`\gamma = 1.4` on a periodic domain.
"""

import numpy

from pysph_tpu.base.domain import DomainManager
from pysph_tpu.base.utils import get_particle_array as gpa
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.gas_dynamics.magma2 import MAGMA2Scheme
from pysph_tpu.sph.gas_dynamics.psph import PSPHScheme
from pysph_tpu.sph.gas_dynamics.tsph import TSPHScheme
from pysph_tpu.sph.scheme import GSPHScheme, SchemeChooser


class ChengShu(Application):
    def initialize(self):
        self.xmin = 0.0
        self.xmax = 1.0
        self.gamma = 1.4
        self.p_0 = 1.0
        self.c_0 = 1.0
        self.delta_rho = 1
        self.n_particles = 1000
        self.domain_length = self.xmax - self.xmin
        self.dx = self.domain_length / (self.n_particles - 1)
        self.k = 2 * numpy.pi / self.domain_length
        self.hdx = 2.0
        self.dt = 1e-4
        self.tf = 1.0
        self.dim = 1

    def add_user_options(self, group):
        group.add_argument('--n-particles', action='store', type=int,
                           dest='n_particles', default=1000,
                           help='Number of particles.')

    def consume_user_options(self):
        self.n_particles = self.options.n_particles
        self.dx = self.domain_length / (self.n_particles - 1)

    def create_domain(self):
        return DomainManager(xmin=self.xmin, xmax=self.xmax,
                             periodic_in_x=True)

    def create_particles(self):
        x = numpy.linspace(self.xmin, self.xmax, self.n_particles)
        rho = 2 + numpy.sin(2 * numpy.pi * x) * self.delta_rho
        p = numpy.ones_like(x)
        u = 1 + 0.1 * numpy.sin(2 * numpy.pi * x)
        cs = numpy.sqrt(self.gamma * p / rho)
        h = numpy.ones_like(x) * self.dx * self.hdx
        m = numpy.ones_like(x) * self.dx * rho
        e = p / ((self.gamma - 1) * rho)
        fluid = gpa(name='fluid', x=x, p=p, rho=rho, u=u, h=h, m=m,
                    e=e, cs=cs)
        self.scheme.setup_properties([fluid])
        return [fluid]

    def create_scheme(self):
        gsph = GSPHScheme(
            fluids=['fluid'], solids=[], dim=self.dim,
            gamma=self.gamma, kernel_factor=1.0, g1=0.0, g2=0.0,
            rsolver=3, interpolation=1, monotonicity=1,
            interface_zero=True, hybrid=False, blend_alpha=5.0,
            niter=200, tol=1e-6)
        psph = PSPHScheme(
            fluids=['fluid'], solids=[], dim=self.dim,
            gamma=self.gamma, hfact=1.2)
        tsph = TSPHScheme(
            fluids=['fluid'], solids=[], dim=self.dim,
            gamma=self.gamma, hfact=1.2)
        magma2 = MAGMA2Scheme(
            fluids=['fluid'], solids=[], dim=self.dim,
            gamma=self.gamma, ndes=7)
        return SchemeChooser(default='gsph', gsph=gsph, psph=psph,
                             tsph=tsph, magma2=magma2)

    def configure_scheme(self):
        s = self.scheme
        if self.options.scheme in ('tsph', 'psph'):
            s.configure(hfact=1.2)
        s.configure_solver(dt=self.dt, tf=self.tf,
                           adaptive_timestep=False, pfreq=1000)


if __name__ == "__main__":
    app = ChengShu()
    app.run()
