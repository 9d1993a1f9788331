"""Taylor-Green vortex: 2D periodic decaying vortices (TVF scheme).

Parity case for /root/reference/pysph/examples/taylor_green.py: the
velocity field decays as exp(-8 pi^2 t / Re) with an exact solution for
validation.  Exercises the periodic domain (min-image stencil wrap) and
the Transport Velocity Formulation.
"""

import os

import numpy as np

from pysph_tpu.base.domain import DomainManager
from pysph_tpu.base.kernels import QuinticSpline
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.iisph import IISPHScheme
from pysph_tpu.sph.isph.isph import ISPHScheme
from pysph_tpu.sph.isph.sisph import SISPHScheme
from pysph_tpu.sph.scheme import SchemeChooser, TVFScheme, WCSPHScheme
from pysph_tpu.sph.wc.crksph import CRKSPHScheme
from pysph_tpu.sph.wc.edac import EDACScheme
from pysph_tpu.sph.wc.gtvf import GTVFScheme
from pysph_tpu.sph.wc.pcisph import PCISPHScheme

L = 1.0
U = 1.0
rho0 = 1.0
c0 = 10 * U
p0 = c0 ** 2 * rho0


def exact_solution(U, b, t, x, y):
    """Decaying Taylor-Green velocities/pressure (reference
    taylor_green.py:67)."""
    factor = U * np.exp(b * t)
    pi2 = 2 * np.pi
    u = -np.cos(pi2 * x) * np.sin(pi2 * y)
    v = np.sin(pi2 * x) * np.cos(pi2 * y)
    p = -0.25 * (np.cos(2 * pi2 * x) + np.cos(2 * pi2 * y))
    return factor * u, factor * v, factor * factor * p


class TaylorGreen(Application):
    def add_user_options(self, group):
        group.add_argument(
            '--perturb', action='store', type=float, dest='perturb',
            default=0, help='Random perturbation fraction of dx.')
        group.add_argument(
            '--nx', action='store', type=int, dest='nx', default=50,
            help='Number of points along x.')
        group.add_argument(
            '--re', action='store', type=float, dest='re', default=100,
            help='Reynolds number.')
        group.add_argument(
            '--hdx', action='store', type=float, dest='hdx', default=1.0,
            help='h/dx.')
        group.add_argument(
            '--pb-factor', action='store', type=float, dest='pb_factor',
            default=1.0, help='Background pressure factor.')

    def consume_user_options(self):
        nx = self.options.nx
        re = self.options.re
        self.nu = U * L / re
        self.dx = L / nx
        self.hdx = self.options.hdx
        h0 = self.hdx * self.dx
        dt_cfl = 0.25 * h0 / (c0 + U)
        dt_viscous = 0.125 * h0 ** 2 / self.nu
        self.dt = min(dt_cfl, dt_viscous, 0.25)
        self.tf = 2.0

    def create_scheme(self):
        h0 = None
        wcsph = WCSPHScheme(['fluid'], [], dim=2, rho0=rho0, c0=c0,
                            h0=h0, hdx=None, nu=None, gamma=7.0,
                            alpha=0.0, beta=0.0)
        tvf = TVFScheme(['fluid'], [], dim=2, rho0=rho0, c0=c0, nu=None,
                        p0=p0, pb=None, h0=h0)
        edac = EDACScheme(['fluid'], [], dim=2, rho0=rho0, c0=c0,
                          nu=None, pb=p0, h=h0)
        iisph = IISPHScheme(fluids=['fluid'], solids=[], dim=2,
                            nu=None, rho0=rho0)
        crksph = CRKSPHScheme(fluids=['fluid'], dim=2, nu=None,
                              rho0=rho0, h0=h0, c0=c0, p0=0.0)
        gtvf = GTVFScheme(fluids=['fluid'], solids=[], dim=2,
                          rho0=rho0, c0=c0, nu=None, h0=None,
                          pref=None)
        pcisph = PCISPHScheme(['fluid'], dim=2, rho0=rho0, nu=None,
                              tolerance=0.05)
        sisph = SISPHScheme(fluids=['fluid'], solids=[], dim=2,
                            nu=None, rho0=rho0, c0=c0, alpha=0.0,
                            pref=p0, rho_cutoff=0.2,
                            internal_flow=True, gtvf=True)
        isph = ISPHScheme(fluids=['fluid'], solids=[], dim=2,
                          nu=None, rho0=rho0, c0=c0, alpha=0.0)
        return SchemeChooser(default='tvf', wcsph=wcsph, tvf=tvf,
                             edac=edac, iisph=iisph, crksph=crksph,
                             gtvf=gtvf, pcisph=pcisph, sisph=sisph,
                             isph=isph)

    def configure_scheme(self):
        h0 = self.hdx * self.dx
        pfreq = 500
        kernel = QuinticSpline(dim=2)
        choice = self.options.scheme
        if choice == 'tvf':
            self.scheme.configure(pb=self.options.pb_factor * p0,
                                  nu=self.nu, h0=h0)
        elif choice == 'wcsph':
            self.scheme.configure(hdx=self.hdx, nu=self.nu, h0=h0)
        elif choice == 'edac':
            self.scheme.configure(h=h0, nu=self.nu,
                                  pb=self.options.pb_factor * p0)
        elif choice.endswith('isph'):
            pfreq = 10
            self.scheme.configure(nu=self.nu)
        elif choice == 'crksph':
            self.scheme.configure(h0=h0, nu=self.nu)
        elif choice == 'gtvf':
            self.scheme.configure(pref=p0, nu=self.nu, h0=h0)
        self.scheme.configure_solver(kernel=kernel, tf=self.tf,
                                     dt=self.dt, pfreq=pfreq)

    def create_domain(self):
        return DomainManager(xmin=0, xmax=L, ymin=0, ymax=L,
                             periodic_in_x=True, periodic_in_y=True)

    def create_particles(self):
        dx = self.dx
        span = np.arange(dx / 2, L, dx)
        x, y = np.meshgrid(span, span)
        x = x.ravel()
        y = y.ravel()
        if self.options.perturb > 0:
            rng = np.random.RandomState(1234)
            factor = dx * self.options.perturb
            x += rng.random(x.shape) * factor
            y += rng.random(y.shape) * factor
        h = np.ones_like(x) * self.hdx * dx
        m = np.ones_like(x) * dx * dx * rho0
        u, v, p = exact_solution(U, 0.0, 0.0, x, y)
        pa = get_particle_array(
            name='fluid', x=x, y=y, h=h, m=m, rho=rho0 * np.ones_like(x),
            u=u, v=v, p=p)
        self.scheme.setup_properties([pa])
        pa.V = 1.0 / (dx * dx) * np.ones_like(x)
        print('Taylor-Green: %d particles, dt=%g' % (len(x), self.dt))
        return [pa]

    def post_process(self, info_fname_or_dir='.'):
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        decay_rate = -8.0 * np.pi ** 2 / self.options.re
        results = []
        for f in files:
            data = load(f)
            fluid = data['arrays']['fluid']
            t = float(data['solver_data']['t'])
            x, y = np.asarray(fluid.x), np.asarray(fluid.y)
            u, v = np.asarray(fluid.u), np.asarray(fluid.v)
            u_e, v_e, p_e = exact_solution(U, decay_rate, t, x, y)
            vmag = np.sqrt(u ** 2 + v ** 2)
            vmag_e = np.sqrt(u_e ** 2 + v_e ** 2)
            decay = vmag.max()
            decay_ex = U * np.exp(decay_rate * t)
            l1_err = np.mean(np.abs(vmag - vmag_e))
            results.append((t, decay, decay_ex, l1_err))
        results = np.array(results)
        out = os.path.join(self.output_dir, 'results.npz')
        np.savez(out, t=results[:, 0], decay=results[:, 1],
                 decay_ex=results[:, 2], l1=results[:, 3])
        print('t=%.3f: max|v|=%.4f exact=%.4f L1=%.5f' %
              tuple(results[-1]))
        return results


if __name__ == '__main__':
    app = TaylorGreen()
    app.run()
    app.post_process(app.info_filename)
