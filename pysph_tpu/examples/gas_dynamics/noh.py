"""Noh's cylindrical implosion test (parity case for
/root/reference/pysph/examples/gas_dynamics/noh.py, ~10 min serial
CPU there).

Gas with uniform radial inflow vr = -1 forms an infinite-strength
shock; the post-shock state has rho = 16, p = 16/3 for gamma = 5/3."""

import numpy as np

from pysph_tpu.base.utils import get_particle_array as gpa
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.gas_dynamics.magma2 import MAGMA2Scheme
from pysph_tpu.sph.gas_dynamics.psph import PSPHScheme
from pysph_tpu.sph.gas_dynamics.tsph import TSPHScheme
from pysph_tpu.sph.scheme import (ADKEScheme, GasDScheme, GSPHScheme,
                                  SchemeChooser)
from pysph_tpu.sph.wc.crksph import CRKSPHScheme

dim = 2
gamma = 5.0 / 3.0
alpha1 = 1.0
alpha2 = 0.1
beta = 2.0
kernel_factor = 1.5
dt = 1e-3
tf = 0.6
xmin = ymin = -1.0
xmax = ymax = 1.0
nx = 50
dx = (xmax - xmin) / nx
h0 = kernel_factor * dx
rho0 = 1.0
m0 = dx * dx * rho0
vr = -1.0


class NohImplosion(Application):
    def add_user_options(self, group):
        group.add_argument('--nx', action='store', type=int,
                           dest='nx', default=nx)

    def create_particles(self):
        n = self.options.nx
        d = (xmax - xmin) / n
        x, y = np.mgrid[xmin + d / 2:xmax:d, ymin + d / 2:ymax:d]
        x, y = x.ravel(), y.ravel()
        theta = np.arctan2(y, x)
        fluid = gpa(
            name='fluid', x=x, y=y,
            m=np.full_like(x, d * d * rho0),
            rho=np.full_like(x, rho0),
            h=np.full_like(x, kernel_factor * d),
            u=vr * np.cos(theta), v=vr * np.sin(theta),
            p=np.full_like(x, 1e-12),
            e=np.full_like(x, 2.5e-11), h0=np.full_like(x,
                                                        kernel_factor
                                                        * d))
        self.scheme.setup_properties([fluid])
        print("Noh's problem with %d particles"
              % fluid.get_number_of_particles())
        return [fluid]

    def create_scheme(self):
        mpm = GasDScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            kernel_factor=kernel_factor, alpha1=alpha1,
            alpha2=alpha2, beta=beta, adaptive_h_scheme='mpm',
            update_alpha1=True, update_alpha2=True, has_ghosts=True)
        crksph = CRKSPHScheme(
            fluids=['fluid'], dim=2, rho0=0, c0=0, nu=0, h0=0, p0=0,
            gamma=gamma, cl=2, has_ghosts=True)
        gsph = GSPHScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            kernel_factor=1.5, g1=0.25, g2=0.5, rsolver=7,
            interpolation=1, monotonicity=2, interface_zero=True,
            hybrid=False, blend_alpha=2.0, niter=40, tol=1e-6,
            has_ghosts=True)
        adke = ADKEScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            alpha=1, beta=1, k=1.0, eps=0.8, g1=0.5, g2=0.5,
            has_ghosts=True)
        psph = PSPHScheme(fluids=['fluid'], solids=[], dim=dim,
                          gamma=gamma, hfact=1.2)
        tsph = TSPHScheme(fluids=['fluid'], solids=[], dim=dim,
                          gamma=gamma, hfact=1.2)
        magma2 = MAGMA2Scheme(fluids=['fluid'], solids=[], dim=dim,
                              gamma=gamma, ndes=30)
        return SchemeChooser(
            default='crksph', crksph=crksph, mpm=mpm, adke=adke,
            gsph=gsph, psph=psph, tsph=tsph, magma2=magma2)

    def configure_scheme(self):
        s = self.scheme
        adaptive = self.options.scheme == 'mpm'
        if self.options.scheme == 'mpm':
            s.configure(kernel_factor=1.2)
        s.configure_solver(dt=dt, tf=tf, adaptive_timestep=adaptive,
                           pfreq=50)

    def post_process(self, info_fname_or_dir='.'):
        """Radial density profile vs the exact post-shock state."""
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        data = load(files[-1])
        fluid = data['arrays']['fluid']
        x = np.asarray(fluid.x)
        y = np.asarray(fluid.y)
        rho = np.asarray(fluid.rho)
        r = np.sqrt(x * x + y * y)
        tfin = data['solver_data']['t']
        rs = tfin / 3.0  # shock radius for gamma = 5/3
        post = rho[r < 0.8 * rs]
        np.savez(self.output_dir + '/results.npz', r=r, rho=rho)
        if post.size:
            print('mean post-shock rho = %.3f (exact 16)'
                  % post.mean())
        return r, rho


if __name__ == '__main__':
    app = NohImplosion()
    app.run()
    app.post_process(app.info_filename)
