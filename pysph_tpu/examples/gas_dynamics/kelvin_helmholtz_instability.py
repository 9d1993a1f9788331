"""Kelvin-Helmholtz instability in a doubly-periodic box (parity case
for /root/reference/pysph/examples/gas_dynamics/kelvin_helmholtz_instability.py).

Two counter-streaming density layers with smoothed interfaces and a
sinusoidal transverse seed; selectable between all seven gas-dynamics
scheme families (--scheme crksph/gsph/adke/mpm/psph/tsph/magma2)."""

import numpy as np

from pysph_tpu.base.domain import DomainManager
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.gas_dynamics.magma2 import MAGMA2Scheme
from pysph_tpu.sph.gas_dynamics.psph import PSPHScheme
from pysph_tpu.sph.gas_dynamics.tsph import TSPHScheme
from pysph_tpu.sph.scheme import (
    ADKEScheme, GasDScheme, GSPHScheme, SchemeChooser)
from pysph_tpu.sph.wc.crksph import CRKSPHScheme

dim = 2
gamma = 5.0 / 3.0
rhoi_1, rhoi_2 = 1.0, 2.0
rhoi_m = 0.5 * (rhoi_1 - rhoi_2)
v_i1, v_i2 = 0.5, -0.5
v_im = 0.5 * (v_i1 - v_i2)
delta = 0.025
dely = 0.01
wavelen = 0.5
dt = 1e-3
tf = 2.0


class KHInstability(Application):
    def add_user_options(self, group):
        group.add_argument('--nx', action='store', type=int,
                           dest='nx', default=200)

    def consume_user_options(self):
        self.nx = self.options.nx
        self.dx = 1.0 / self.nx
        self.hdx = 1.5

    def create_particles(self):
        dx = self.dx
        span = np.arange(dx / 2, 1.0, dx)
        x, y = np.meshgrid(span, span)
        x, y = x.ravel(), y.ravel()

        # smoothed double interface at y = 0.25 and 0.75
        rho = np.where(
            y < 0.25, rhoi_1 - rhoi_m * np.exp((y - 0.25) / delta),
            np.where(
                y < 0.5, rhoi_2 + rhoi_m * np.exp((0.25 - y) / delta),
                np.where(
                    y < 0.75,
                    rhoi_2 + rhoi_m * np.exp((y - 0.75) / delta),
                    rhoi_1 - rhoi_m * np.exp((0.75 - y) / delta))))
        u = np.where(
            y < 0.25, v_i1 - v_im * np.exp((y - 0.25) / delta),
            np.where(
                y < 0.5, v_i2 + v_im * np.exp((0.25 - y) / delta),
                np.where(
                    y < 0.75,
                    v_i2 + v_im * np.exp((y - 0.75) / delta),
                    v_i1 - v_im * np.exp((0.75 - y) / delta))))
        v = dely * np.sin(2 * np.pi * x / wavelen)
        p = 2.5
        e = p / ((gamma - 1) * rho)
        fluid = get_particle_array(
            name='fluid', x=x, y=y, u=u, v=v, rho=rho,
            p=np.full_like(x, p), e=e, m=dx * dx * rho,
            h=np.full_like(x, self.hdx * dx),
            h0=np.full_like(x, self.hdx * dx),
            additional_props=['e', 'h0'])
        print('KHI: %d particles' % fluid.get_number_of_particles())
        self.scheme.setup_properties([fluid])
        return [fluid]

    def create_domain(self):
        return DomainManager(xmin=0, xmax=1, ymin=0, ymax=1,
                             periodic_in_x=True, periodic_in_y=True)

    def create_scheme(self):
        crk = CRKSPHScheme(
            fluids=['fluid'], dim=dim, rho0=0, c0=0, nu=0, h0=0,
            p0=0, gamma=gamma, cl=2, has_ghosts=True)
        adke = ADKEScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            alpha=0.1, beta=0.1, k=1.2, eps=0.1, g1=0.1, g2=0.2,
            has_ghosts=True)
        mpm = GasDScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            kernel_factor=1.2, alpha1=1.0, alpha2=0.1, beta=2.0,
            update_alpha1=True, update_alpha2=True, has_ghosts=True)
        gsph = GSPHScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            kernel_factor=1.5, g1=0.2, g2=0.4, rsolver=2,
            interpolation=1, monotonicity=2, interface_zero=True,
            hybrid=False, blend_alpha=2.0, niter=40, tol=1e-6,
            has_ghosts=True)
        psph = PSPHScheme(fluids=['fluid'], solids=[], dim=dim,
                          gamma=gamma, hfact=1.2)
        tsph = TSPHScheme(fluids=['fluid'], solids=[], dim=dim,
                          gamma=gamma, hfact=1.2)
        magma2 = MAGMA2Scheme(fluids=['fluid'], solids=[], dim=dim,
                              gamma=gamma, ndes=50, has_ghosts=True)
        return SchemeChooser(default='crksph', crksph=crk, gsph=gsph,
                             adke=adke, mpm=mpm, psph=psph,
                             tsph=tsph, magma2=magma2)

    def configure_scheme(self):
        s = self.scheme
        adaptive = self.options.scheme == 'mpm'
        if self.options.scheme == 'mpm':
            s.configure(kernel_factor=1.2)
        elif self.options.scheme in ('tsph', 'psph'):
            s.configure(hfact=1.2)
        s.configure_solver(dt=dt, tf=tf,
                           adaptive_timestep=adaptive, pfreq=50)

    def post_process(self, info_fname_or_dir='.'):
        """Growth of the transverse kinetic energy (instability
        amplitude)."""
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        rows = []
        for f in files:
            data = load(f)
            fluid = data['arrays']['fluid']
            t = float(data['solver_data']['t'])
            vy = np.asarray(fluid.v)
            m = np.asarray(fluid.m)
            rows.append((t, float(np.sum(0.5 * m * vy * vy))))
        out = np.array(rows)
        np.savez(self.output_dir + '/results.npz', t=out[:, 0],
                 ky=out[:, 1])
        print('transverse KE at t=%.2f: %.3e' % tuple(out[-1]))
        return out


if __name__ == '__main__':
    app = KHInstability()
    app.run()
    app.post_process(app.info_filename)
