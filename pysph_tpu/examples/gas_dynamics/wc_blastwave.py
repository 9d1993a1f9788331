"""Woodward–Colella interacting blastwaves: two discontinuities
driven toward each other between reflecting walls (parity case for
/root/reference/pysph/examples/gas_dynamics/wc_blastwave.py)."""

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

dim = 1
gamma = 1.4
gamma1 = gamma - 1.0
dt = 5e-6
tf = 0.038


class WCBlastwave(Application):
    def initialize(self):
        self.xmin = 0.0
        self.xmax = 1.0
        self.domain_length = self.xmax - self.xmin
        self.rho = 1.0
        self.p1 = 1000
        self.p2 = 0.01
        self.p3 = 100
        self.u = 0.0
        self.gamma = gamma
        self.hdx = 1.5
        self.n_particles = 1000

    def add_user_options(self, group):
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=1.5,
                           help='Ratio h/dx.')
        group.add_argument('--nparticles', action='store', type=float,
                           dest='nprt', default=1000,
                           help='Number of particles')

    def consume_user_options(self):
        self.n_particles = self.options.nprt

    def create_particles(self):
        self.dx = self.domain_length / self.n_particles
        x = numpy.arange(self.xmin + self.dx * 0.5, self.xmax,
                         self.dx)
        p = numpy.ones_like(x) * self.p2
        p[x < 0.1] = self.p1
        p[x > 0.9] = self.p3
        h = self.hdx * self.dx
        m = self.dx * self.rho
        e = p / ((self.gamma - 1) * self.rho)
        cs = numpy.sqrt(self.gamma * p / self.rho)
        fluid = gpa(name='fluid', x=x, rho=self.rho, p=p, h=h, m=m,
                    e=e, cs=cs, h0=h, u=0)
        self.scheme.setup_properties([fluid])
        return [fluid]

    def create_domain(self):
        return DomainManager(xmin=self.xmin, xmax=self.xmax,
                             mirror_in_x=True)

    def create_scheme(self):
        self.dt = dt
        self.tf = tf
        adke = ADKEScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            alpha=1, beta=1.0, k=1.0, eps=0.8, g1=0.2, g2=0.4)
        mpm = GasDScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            kernel_factor=1.2, alpha1=1.0, alpha2=0.1, beta=2.0,
            update_alpha1=True, update_alpha2=True)
        gsph = GSPHScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            kernel_factor=1.0, g1=0.2, g2=0.4, rsolver=2,
            interpolation=1, monotonicity=1, interface_zero=True,
            hybrid=False, blend_alpha=2.0, niter=20, tol=1e-6)
        crk = CRKSPHScheme(
            fluids=['fluid'], dim=dim, rho0=0, c0=0, nu=0, h0=0,
            p0=0, gamma=gamma, cl=4, cq=1, eta_crit=0.2)
        psph = PSPHScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            hfact=1.2)
        tsph = TSPHScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            hfact=1.2)
        magma2 = MAGMA2Scheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            ndes=7, recycle_accelerations=False)
        return SchemeChooser(
            default='gsph', gsph=gsph, adke=adke, mpm=mpm,
            crksph=crk, psph=psph, tsph=tsph, magma2=magma2)

    def configure_scheme(self):
        s = self.scheme
        if self.options.scheme == 'mpm':
            s.configure(kernel_factor=1.2)
            s.configure_solver(dt=self.dt, tf=self.tf,
                               adaptive_timestep=True, pfreq=50)
        elif self.options.scheme in ('tsph', 'psph'):
            s.configure(hfact=1.2)
            s.configure_solver(dt=self.dt, tf=self.tf,
                               adaptive_timestep=False, pfreq=50)
        elif self.options.scheme == 'crksph':
            s.configure_solver(dt=self.dt, tf=self.tf,
                               adaptive_timestep=False, pfreq=20)
        else:
            s.configure_solver(dt=self.dt, tf=self.tf,
                               adaptive_timestep=False, pfreq=50)

    def post_process(self):
        if len(self.output_files) < 1:
            return
        from pysph_tpu.solver.output import load
        import os
        data = load(self.output_files[-1])
        pa = data['arrays']['fluid']
        fname = os.path.join(self.output_dir, 'results.npz')
        numpy.savez(fname, x=numpy.asarray(pa.x),
                    u=numpy.asarray(pa.u), e=numpy.asarray(pa.e),
                    cs=numpy.asarray(pa.cs),
                    rho=numpy.asarray(pa.rho),
                    p=numpy.asarray(pa.p), h=numpy.asarray(pa.h))


if __name__ == '__main__':
    app = WCBlastwave()
    app.run()
    app.post_process()
