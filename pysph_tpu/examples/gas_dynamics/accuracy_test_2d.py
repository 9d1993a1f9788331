"""2D constant-pressure accuracy test: particles simply advect in a
periodic domain; the L1 density error against the advected exact
profile measures scheme accuracy (parity case for
/root/reference/pysph/examples/gas_dynamics/accuracy_test_2d.py)."""

import numpy

from pysph_tpu.base.domain import DomainManager
from pysph_tpu.base.utils import get_particle_array as gpa
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.gas_dynamics.magma2 import MAGMA2Scheme
from pysph_tpu.sph.gas_dynamics.psph import PSPHScheme
from pysph_tpu.sph.gas_dynamics.tsph import TSPHScheme
from pysph_tpu.sph.scheme import (ADKEScheme, GasDScheme, GSPHScheme,
                                  SchemeChooser)
from pysph_tpu.sph.wc.crksph import CRKSPHScheme
from pysph_tpu.tools import uniform_distribution as ud

dim = 2
gamma = 1.4
gamma1 = gamma - 1.0
tf = 1.0

xmin, xmax = 0.0, 1.0
ymin, ymax = 0.0, 1.0

alpha1 = 1.0
alpha2 = 0.1
beta = 2.0
kernel_factor = 1.5


class AccuracyTest2D(Application):
    def initialize(self):
        self.xmin, self.xmax = xmin, xmax
        self.ymin, self.ymax = ymin, ymax
        self.ny = 128
        self.nx = self.ny
        self.dx = (self.xmax - self.xmin) / self.nx
        self.hdx = 2.0
        self.p = 1.0
        self.u = 1
        self.v = -1
        self.c_0 = 1.18
        self.cfl = 0.1

    def add_user_options(self, group):
        group.add_argument(
            '--nparticles', action='store', type=int, dest='nprt',
            default=256, help='Number of particles in domain')

    def consume_user_options(self):
        self.nx = self.options.nprt
        self.ny = self.nx
        self.dx = (self.xmax - self.xmin) / self.nx
        self.dt = self.cfl * self.dx / self.c_0

    def create_domain(self):
        return DomainManager(
            xmin=xmin, xmax=xmax, ymin=ymin, ymax=ymax,
            periodic_in_x=True, periodic_in_y=True)

    def create_particles(self):
        data = ud.uniform_distribution_cubic2D(
            self.dx, xmin, xmax, ymin, ymax)
        x = numpy.ravel(data[0])
        y = numpy.ravel(data[1])
        dx = data[2]
        volume = dx * dx
        rho = 1 + 0.2 * numpy.sin(numpy.pi * (x + y))
        p = numpy.ones_like(x) * self.p
        h = numpy.ones_like(x) * self.hdx * dx
        m = numpy.ones_like(x) * volume * rho
        u = numpy.ones_like(x) * self.u
        v = numpy.ones_like(x) * self.v
        e = p / (gamma1 * rho)
        fluid = gpa(name='fluid', x=x, y=y, rho=rho, p=p, e=e, h=h,
                    m=m, h0=h.copy(), u=u, v=v)
        self.scheme.setup_properties([fluid])
        print("2D Accuracy Test with %d particles"
              % fluid.get_number_of_particles())
        return [fluid]

    def create_scheme(self):
        self.tf = tf
        adke = ADKEScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            alpha=0, beta=0, k=1.5, eps=0.0, g1=0.0, g2=0.0)
        mpm = GasDScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            kernel_factor=kernel_factor, alpha1=0, alpha2=0,
            beta=beta)
        crksph = CRKSPHScheme(
            fluids=['fluid'], dim=dim, rho0=0, c0=0, nu=0, h0=0,
            p0=0, gamma=gamma, cl=2)
        gsph = GSPHScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            kernel_factor=1.0, g1=0.0, g2=0.0, rsolver=7,
            interpolation=1, monotonicity=1, interface_zero=True,
            hybrid=False, blend_alpha=5.0, niter=40, tol=1e-6)
        psph = PSPHScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            hfact=kernel_factor)
        tsph = TSPHScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            hfact=kernel_factor)
        magma2 = MAGMA2Scheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            hfact=None, ndes=50)
        return SchemeChooser(
            default='gsph', adke=adke, mpm=mpm, gsph=gsph,
            crksph=crksph, psph=psph, tsph=tsph, magma2=magma2)

    def configure_scheme(self):
        s = self.scheme
        if self.options.scheme == 'mpm':
            s.configure(kernel_factor=kernel_factor)
            s.configure_solver(dt=self.dt, tf=self.tf,
                               adaptive_timestep=True, pfreq=50)
        else:
            s.configure_solver(dt=self.dt, tf=self.tf,
                               adaptive_timestep=False, pfreq=50)

    def post_process(self):
        from pysph_tpu.solver.output import load
        if len(self.output_files) < 1:
            return
        data = load(self.output_files[-1])
        pa = data['arrays']['fluid']
        x_c = numpy.asarray(pa.x)
        y_c = numpy.asarray(pa.y)
        rho_c = numpy.asarray(pa.rho)
        rho_e = 1 + 0.2 * numpy.sin(numpy.pi * (x_c + y_c))
        l1_norm = numpy.sum(numpy.abs(rho_c - rho_e)) / rho_c.size
        print(l1_norm)
        return l1_norm


if __name__ == '__main__':
    app = AccuracyTest2D()
    app.run()
    app.post_process()
