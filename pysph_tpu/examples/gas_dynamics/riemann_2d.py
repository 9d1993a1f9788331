"""2D Riemann problem: four-quadrant initial states whose waves
interact at the center of the domain (parity case for
/root/reference/pysph/examples/gas_dynamics/riemann_2d.py; case 3 is
the four-shock configuration)."""

import numpy

from pysph_tpu.base.domain import DomainManager
from pysph_tpu.base.utils import get_particle_array as gpa
from pysph_tpu.examples.gas_dynamics.riemann_2d_config import R2DConfig
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.gas_dynamics.magma2 import MAGMA2Scheme
from pysph_tpu.sph.gas_dynamics.psph import PSPHScheme
from pysph_tpu.sph.gas_dynamics.tsph import TSPHScheme
from pysph_tpu.sph.scheme import (ADKEScheme, GasDScheme, GSPHScheme,
                                  SchemeChooser)
from pysph_tpu.sph.wc.crksph import CRKSPHScheme

case = 3
config = R2DConfig(case)
gamma = 1.4
gamma1 = gamma - 1
kernel_factor = 1.5
dt = 1e-4
dim = 2


class Riemann2D(Application):
    def initialize(self):
        self.dt = dt
        self.tf = config.endtime

    def add_user_options(self, group):
        group.add_argument(
            '--dscheme', choices=['constant_mass', 'constant_volume'],
            dest='dscheme', default='constant_volume',
            help='Spatial discretization scheme.')
        group.add_argument('--nparticles', action='store', type=int,
                           dest='nparticles', default=200)

    def consume_user_options(self):
        self.nx = self.options.nparticles
        self.ny = self.nx
        self.dx = (config.xmax - config.xmin) / self.nx
        if self.options.dscheme == 'constant_volume':
            self.dfunction = self.create_particles_constant_volume
        else:
            self.dfunction = self.create_particles_constant_mass

    def _quadrant_states(self):
        return [(config.p1, config.rho1, config.u1, config.v1),
                (config.p2, config.rho2, config.u2, config.v2),
                (config.p3, config.rho3, config.u3, config.v3),
                (config.p4, config.rho4, config.u4, config.v4)]

    def create_particles_constant_volume(self):
        dx = self.dx
        dx2 = dx * 0.5
        vol = dx * dx
        x, y = numpy.mgrid[config.xmin + dx2:config.xmax:dx,
                           config.ymin + dx2:config.ymax:dx]
        x = x.ravel()
        y = y.ravel()
        right = x > config.xmid
        upper = y > config.ymid
        quads = (right & upper, ~right & upper, ~right & ~upper,
                 right & ~upper)
        rho = numpy.ones_like(x)
        p = numpy.ones_like(x)
        u = numpy.zeros_like(x)
        v = numpy.zeros_like(x)
        for mask, (pq, rq, uq, vq) in zip(quads,
                                          self._quadrant_states()):
            rho[mask] = rq
            p[mask] = pq
            u[mask] = uq
            v[mask] = vq
        e = p / (gamma1 * rho)
        m = vol * rho
        h = kernel_factor * (m / rho) ** (1.0 / dim)
        return gpa(name='fluid', x=x, y=y, m=m, rho=rho, h=h, u=u,
                   v=v, p=p, e=e, h0=h.copy())

    def create_particles_constant_mass(self):
        # equal-mass particles: per-quadrant lattices spaced so each
        # carries the same m0 (reference riemann_2d.py:128-224)
        nb4 = self.nx / 4
        dx0 = (config.xmax - config.xmid) / nb4
        vol0 = dx0 * dx0
        m0 = config.rho_max * vol0
        xs, ys, ps, us, vs, rhos = [], [], [], [], [], []
        spans = [
            # (x-range, y-range) per quadrant, marching outward from
            # the center
            ((config.xmid, config.xmax, 1), (config.ymid, config.ymax, 1)),
            ((config.xmid, config.xmin, -1), (config.ymid, config.ymax, 1)),
            ((config.xmid, config.xmin, -1), (config.ymid, config.ymin, -1)),
            ((config.xmid, config.xmax, 1), (config.ymid, config.ymin, -1)),
        ]
        for ((x0, x1, sx), (y0, y1, sy)), (pq, rq, uq, vq) in zip(
                spans, self._quadrant_states()):
            vol = config.rho_max / rq * vol0
            dx = numpy.sqrt(vol)
            xq, yq = numpy.mgrid[
                x0 + sx * 0.5 * dx:x1:sx * dx,
                y0 + sy * 0.5 * dx:y1:sy * dx]
            xq = xq.ravel()
            yq = yq.ravel()
            xs.append(xq)
            ys.append(yq)
            ps.append(numpy.full_like(xq, pq))
            us.append(numpy.full_like(xq, uq))
            vs.append(numpy.full_like(xq, vq))
            rhos.append(numpy.full_like(xq, rq))
        x = numpy.concatenate(xs)
        y = numpy.concatenate(ys)
        p = numpy.concatenate(ps)
        u = numpy.concatenate(us)
        v = numpy.concatenate(vs)
        rho = numpy.concatenate(rhos)
        m = numpy.full_like(x, m0)
        h = kernel_factor * numpy.sqrt(m / rho)
        e = p / (gamma1 * rho)
        return gpa(name='fluid', x=x, y=y, m=m, rho=rho, h=h, u=u,
                   v=v, p=p, e=e, h0=h.copy())

    def create_particles(self):
        fluid = self.dfunction()
        self.scheme.setup_properties([fluid])
        return [fluid]

    def create_domain(self):
        return DomainManager(
            xmin=config.xmin, xmax=config.xmax, ymin=config.ymin,
            ymax=config.ymax, mirror_in_x=True, mirror_in_y=True)

    def create_scheme(self):
        gsph = GSPHScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            kernel_factor=1.5, g1=0.25, g2=0.5, rsolver=2,
            interpolation=1, monotonicity=1, interface_zero=True,
            hybrid=False, blend_alpha=2.0, niter=40, tol=1e-6)
        adke = ADKEScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            alpha=1, beta=1.0, k=1.0, eps=0.5, g1=0.2, g2=0.4)
        crksph = CRKSPHScheme(
            fluids=['fluid'], dim=dim, rho0=0, c0=0, nu=0, h0=0,
            p0=0, gamma=gamma, cl=2)
        mpm = GasDScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            kernel_factor=1.2, alpha1=1.0, alpha2=0.1, beta=2.0,
            update_alpha1=True, update_alpha2=True)
        psph = PSPHScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            hfact=1.2)
        tsph = TSPHScheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            hfact=1.2)
        magma2 = MAGMA2Scheme(
            fluids=['fluid'], solids=[], dim=dim, gamma=gamma,
            ndes=50, reconstruction_order=2)
        return SchemeChooser(
            default='gsph', gsph=gsph, adke=adke, crksph=crksph,
            mpm=mpm, psph=psph, tsph=tsph, magma2=magma2)

    def configure_scheme(self):
        s = self.scheme
        if self.options.scheme == 'mpm':
            s.configure(kernel_factor=kernel_factor)
        elif self.options.scheme in ('tsph', 'psph'):
            s.configure(hfact=kernel_factor)
        s.configure_solver(dt=self.dt, tf=self.tf,
                           adaptive_timestep=False, pfreq=50)

    def post_process(self):
        if len(self.output_files) < 1:
            return
        try:
            import matplotlib
            matplotlib.use('Agg')
            from matplotlib import pyplot
        except ImportError:
            print("Post processing requires matplotlib.")
            return
        from pysph_tpu.solver.output import load
        import os
        data = load(self.output_files[-1])
        pa = data['arrays']['fluid']
        pyplot.scatter(numpy.asarray(pa.x), numpy.asarray(pa.y), s=1)
        pyplot.xlim((0.1, 0.6))
        pyplot.ylim((0.1, 0.6))
        fig = os.path.join(self.output_dir, "positions.png")
        pyplot.savefig(fig, dpi=300)
        pyplot.close('all')


if __name__ == "__main__":
    app = Riemann2D()
    app.run()
    app.post_process()
