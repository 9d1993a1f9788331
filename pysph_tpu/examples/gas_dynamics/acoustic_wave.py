"""Propagation of a small-amplitude 1D acoustic wave in a periodic
domain (parity case for
/root/reference/pysph/examples/gas_dynamics/acoustic_wave.py, ~5 min
serial CPU there).

rho = rho0 + drho sin(kx), p = p0 + c0^2 drho sin(kx),
u = c0 drho sin(kx) / rho0 with drho = 1e-6; after one period the
profile should return to the initial state — the L1 error measures
scheme diffusion."""

import numpy as np

from pysph_tpu.base.domain import DomainManager
from pysph_tpu.base.utils import get_particle_array as gpa
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.gas_dynamics.magma2 import MAGMA2Scheme
from pysph_tpu.sph.gas_dynamics.psph import PSPHScheme
from pysph_tpu.sph.gas_dynamics.tsph import TSPHScheme
from pysph_tpu.sph.scheme import (ADKEScheme, GasDScheme, GSPHScheme,
                                  SchemeChooser)
from pysph_tpu.sph.wc.crksph import CRKSPHScheme


class AcousticWave(Application):
    def initialize(self):
        self.xmin = 0.0
        self.xmax = 1.0
        self.gamma = 1.4
        self.rho_0 = self.gamma
        self.p_0 = 1.0
        self.c_0 = 1.0
        self.delta_rho = 1e-6
        self.domain_length = self.xmax - self.xmin
        self.k = -2 * np.pi / self.domain_length
        self.cfl = 0.1
        self.hdx = 1.0
        self.tf = 5.0
        self.dim = 1

    def create_domain(self):
        return DomainManager(xmin=0, xmax=1, periodic_in_x=True)

    def add_user_options(self, group):
        group.add_argument('--nparticles', action='store', type=int,
                           dest='nprt', default=256)

    def consume_user_options(self):
        self.n_particles = self.options.nprt
        self.dx = self.domain_length / self.n_particles
        self.dt = self.cfl * self.dx / self.c_0

    def create_particles(self):
        x = np.arange(self.xmin + self.dx * 0.5, self.xmax, self.dx)
        rho = self.rho_0 + self.delta_rho * np.sin(self.k * x)
        p = self.p_0 + self.c_0 ** 2 * self.delta_rho * \
            np.sin(self.k * x)
        u = self.c_0 * self.delta_rho * np.sin(self.k * x) / \
            self.rho_0
        h = np.full_like(x, self.dx * self.hdx)
        fluid = gpa(name='fluid', x=x, p=p, rho=rho, u=u, h=h,
                    m=self.dx * rho, e=p / ((self.gamma - 1) * rho),
                    cs=np.sqrt(self.gamma * p / rho), h0=h.copy())
        self.scheme.setup_properties([fluid])
        return [fluid]

    def create_scheme(self):
        g = self.gamma
        mpm = GasDScheme(fluids=['fluid'], solids=[], dim=1, gamma=g,
                         kernel_factor=1.2)
        adke = ADKEScheme(fluids=['fluid'], solids=[], dim=1,
                          gamma=g, alpha=0, beta=0.0, k=1.5, eps=0.0,
                          g1=0.0, g2=0.0, has_ghosts=True)
        gsph = GSPHScheme(fluids=['fluid'], solids=[], dim=1,
                          gamma=g, kernel_factor=1.0, g1=0.0, g2=0.0,
                          rsolver=7, interpolation=1, monotonicity=1,
                          interface_zero=True, hybrid=False,
                          blend_alpha=2.0, niter=40, tol=1e-6,
                          has_ghosts=True)
        crksph = CRKSPHScheme(fluids=['fluid'], dim=1, rho0=0, c0=0,
                              nu=0, h0=0, p0=0, gamma=g, cl=2,
                              has_ghosts=True)
        psph = PSPHScheme(fluids=['fluid'], solids=[], dim=1,
                          gamma=g, hfact=1.2)
        tsph = TSPHScheme(fluids=['fluid'], solids=[], dim=1,
                          gamma=g, hfact=1.2)
        magma2 = MAGMA2Scheme(fluids=['fluid'], solids=[], dim=1,
                              gamma=g, ndes=7,
                              reconstruction_order=2)
        return SchemeChooser(default='gsph', adke=adke, mpm=mpm,
                             gsph=gsph, crksph=crksph, psph=psph,
                             tsph=tsph, magma2=magma2)

    def configure_scheme(self):
        self.scheme.configure_solver(dt=self.dt, tf=self.tf,
                                     adaptive_timestep=False,
                                     pfreq=1000)

    def post_process(self, info_fname_or_dir='.'):
        """L1 density error vs the exact (initial) profile."""
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        data = load(files[-1])
        fluid = data['arrays']['fluid']
        x = np.asarray(fluid.x)
        rho = np.asarray(fluid.rho)
        rho_e = self.rho_0 + self.delta_rho * np.sin(self.k * x)
        l1 = np.mean(np.abs(rho - rho_e))
        np.savez(self.output_dir + '/results.npz', x=x, rho=rho,
                 rho_e=rho_e, l1=l1)
        print('L1 density error: %.3e' % l1)
        return l1


if __name__ == '__main__':
    app = AcousticWave()
    app.run()
    app.post_process(app.info_filename)
