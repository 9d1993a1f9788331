"""Hydrostatic box: a dense square in pressure equilibrium inside a
light medium — the solution should not evolve in time (parity case
for /root/reference/pysph/examples/gas_dynamics/hydrostatic_box.py).
"""

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


class HydrostaticBox(Application):
    def initialize(self):
        self.xmin = 0.0
        self.xmax = 1.0
        self.ymin = 0.0
        self.ymax = 1.0
        self.gamma = 1.5
        self.p = 1
        self.rho0 = 1
        self.rhoi = 4
        self.nx = 50
        self.ny = self.nx
        self.dx = (self.xmax - self.xmin) / self.nx
        self.hdx = 1.5
        self.dt = 1e-3
        self.tf = 10

    def add_user_options(self, group):
        group.add_argument('--nx', action='store', type=int,
                           dest='nx', default=50,
                           help='Particles along x.')

    def consume_user_options(self):
        self.nx = self.options.nx
        self.ny = self.nx
        self.dx = (self.xmax - self.xmin) / self.nx

    def create_particles(self):
        data = ud.uniform_distribution_cubic2D(
            self.dx, self.xmin, self.xmax, self.ymin, self.ymax)
        x, y = data[0], data[1]
        box = (x > 0.25) & (x < 0.75) & (y > 0.25) & (y < 0.75)
        rho = numpy.where(box, float(self.rhoi), float(self.rho0))
        e = self.p / ((self.gamma - 1) * rho)
        m = self.dx * self.dx * rho
        h = self.hdx * self.dx
        fluid = gpa(name='fluid', x=x, y=y, p=self.p, rho=rho, e=e,
                    u=0.0, v=0.0, h=h, m=m, h0=h)
        self.scheme.setup_properties([fluid])
        return [fluid]

    def create_domain(self):
        return DomainManager(
            xmin=self.xmin, xmax=self.xmax, ymin=self.ymin,
            ymax=self.ymax, periodic_in_x=True, periodic_in_y=True)

    def create_scheme(self):
        gsph = GSPHScheme(
            fluids=['fluid'], solids=[], dim=2, gamma=self.gamma,
            kernel_factor=1.0, g1=0.0, g2=0.0, rsolver=7,
            interpolation=1, monotonicity=1, interface_zero=True,
            hybrid=False, blend_alpha=5.0, niter=40, tol=1e-6)
        mpm = GasDScheme(
            fluids=['fluid'], solids=[], dim=2, gamma=self.gamma,
            kernel_factor=1.2, alpha1=0, alpha2=0, beta=2.0,
            update_alpha1=False, update_alpha2=False)
        crk = CRKSPHScheme(
            fluids=['fluid'], dim=2, rho0=0, c0=0, nu=0, h0=0, p0=0,
            gamma=self.gamma, cl=2)
        adke = ADKEScheme(
            fluids=['fluid'], solids=[], dim=2, gamma=self.gamma,
            alpha=0.1, beta=0.1, k=1.5, eps=0.0, g1=0.1, g2=0.1)
        psph = PSPHScheme(
            fluids=['fluid'], solids=[], dim=2, gamma=self.gamma,
            hfact=1.2)
        tsph = TSPHScheme(
            fluids=['fluid'], solids=[], dim=2, gamma=self.gamma,
            hfact=1.2)
        magma2 = MAGMA2Scheme(
            fluids=['fluid'], solids=[], dim=2, gamma=self.gamma,
            ndes=50)
        return SchemeChooser(
            default='crksph', crksph=crk, adke=adke, mpm=mpm,
            gsph=gsph, psph=psph, tsph=tsph, magma2=magma2)

    def configure_scheme(self):
        s = self.scheme
        adaptive = self.options.scheme in ('gsph', 'mpm')
        if self.options.scheme == 'mpm':
            s.configure(kernel_factor=1.2)
        elif self.options.scheme in ('tsph', 'psph'):
            s.configure(hfact=1.2)
        s.configure_solver(dt=self.dt, tf=self.tf,
                           adaptive_timestep=adaptive, pfreq=50)


if __name__ == "__main__":
    app = HydrostaticBox()
    app.run()
