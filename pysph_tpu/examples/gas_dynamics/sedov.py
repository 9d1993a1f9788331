"""Sedov point explosion (2D) across four gas-dynamics schemes
(parity case for /root/reference/pysph/examples/gas_dynamics/sedov.py;
~7 min serial CPU there).  The reference loads precomputed ndspmhd
initial conditions; here the standard setup is generated directly: a
uniform lattice with the blast energy deposited kernel-smoothed at
the origin."""

import numpy

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array as gpa
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.gas_dynamics.magma2 import MAGMA2Scheme
from pysph_tpu.sph.gas_dynamics.psph import PSPHScheme
from pysph_tpu.sph.gas_dynamics.tsph import TSPHScheme
from pysph_tpu.sph.scheme import GasDScheme, SchemeChooser

dim = 2
gamma = 5.0 / 3.0
gamma1 = gamma - 1.0

dt = 1e-4
tf = 0.1

alpha1 = 10.0
alpha2 = 1.0
beta = 2.0
kernel_factor = 1.2


class SedovPointExplosion(Application):
    def add_user_options(self, group):
        group.add_argument('--nx', action='store', type=int,
                           dest='nx', default=101,
                           help='Particles per side.')

    def create_particles(self):
        nx = self.options.nx
        dx = 1.0 / (nx - 1)
        x, y = numpy.mgrid[-0.5:0.5 + 1e-9:dx, -0.5:0.5 + 1e-9:dx]
        x, y = x.ravel(), y.ravel()
        rho0 = 1.0
        m = rho0 * dx * dx
        h = kernel_factor * dx

        # blast energy E=1 smoothed over the central kernel support
        kernel = CubicSpline(dim=2)
        r = numpy.sqrt(x ** 2 + y ** 2)
        import jax.numpy as jnp
        w = numpy.asarray(kernel.kernel(
            [jnp.asarray(x), jnp.asarray(y), jnp.zeros_like(
                jnp.asarray(x))], jnp.asarray(r), 2 * h))
        # per-mass energy with total blast energy E = 1:
        # e_i = E w_i / sum_j(m_j w_j)
        E = 1.0
        e = 1e-9 + E * w / max(m * w.sum(), 1e-30)
        p = gamma1 * rho0 * e

        fluid = gpa(name='fluid', x=x, y=y, rho=rho0, p=p, e=e, h=h,
                    m=m, additional_props=['e'])
        self.scheme.setup_properties([fluid])
        fluid.h[:] = kernel_factor * (
            numpy.asarray(fluid.m) / numpy.asarray(fluid.rho)
        ) ** (1.0 / dim)
        print("Sedov's point explosion with %d particles"
              % fluid.get_number_of_particles())
        return [fluid]

    def create_scheme(self):
        mpm = GasDScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            kernel_factor=kernel_factor, alpha1=alpha1,
            alpha2=alpha2, beta=beta, adaptive_h_scheme='mpm',
            update_alpha1=True, update_alpha2=True)
        psph = PSPHScheme(fluids=['fluid'], solids=[], dim=dim,
                          gamma=gamma, hfact=kernel_factor)
        tsph = TSPHScheme(fluids=['fluid'], solids=[], dim=dim,
                          gamma=gamma, hfact=kernel_factor)
        magma2 = MAGMA2Scheme(fluids=['fluid'], solids=[], dim=dim,
                              gamma=gamma, ndes=40,
                              reconstruction_order=0)
        return SchemeChooser(default='mpm', mpm=mpm, psph=psph,
                             tsph=tsph, magma2=magma2)

    def configure_scheme(self):
        self.scheme.configure_solver(dt=dt, tf=tf,
                                     adaptive_timestep=False,
                                     pfreq=25)

    def post_process(self, info_fname_or_dir='.'):
        """Radial density profile at the final time."""
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        data = load(files[-1])
        fluid = data['arrays']['fluid']
        r = numpy.sqrt(numpy.asarray(fluid.x) ** 2 +
                       numpy.asarray(fluid.y) ** 2)
        rho = numpy.asarray(fluid.rho)
        numpy.savez(self.output_dir + '/results.npz', r=r, rho=rho)
        print('peak density %.3f at r=%.3f' % (rho.max(),
                                               r[rho.argmax()]))
        return r, rho


if __name__ == '__main__':
    app = SedovPointExplosion()
    app.run()
    app.post_process(app.info_filename)
