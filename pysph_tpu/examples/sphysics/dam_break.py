"""The standard SPHysics/DualSPHysics 3D dam-break benchmark: a
0.4 m water column collapsing in a vessel with a square post (parity
case for /root/reference/pysph/examples/sphysics/dam_break.py)."""

import numpy as np

from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.scheme import WCSPHScheme


def ravel(*args):
    return tuple(np.ravel(x) for x in args)


def rhstack(*args):
    """Ravel then stack the matching elements of the given tuples."""
    return tuple(np.hstack(ravel(*t)) for t in zip(*args))


class DamBreak(Application):
    def add_user_options(self, group):
        group.add_argument(
            '--dx', action='store', type=float, dest='dx',
            default=0.0085, help='Particle spacing.')
        group.add_argument(
            '--hdx', action='store', type=float, dest='hdx',
            default=np.sqrt(3),
            help='Specify the hdx factor where h = hdx * dx.')

    def consume_user_options(self):
        self.dx = self.options.dx
        self.hdx = self.options.hdx

    def create_scheme(self):
        self.c0 = c0 = 10.0 * np.sqrt(2.0 * 9.81 * 0.3)
        self.hdx = hdx = np.sqrt(3)
        dx = 0.01
        return WCSPHScheme(
            ['fluid'], ['boundary'], dim=3, rho0=1000, c0=c0,
            h0=hdx * dx, hdx=hdx, gz=-9.81, alpha=0.1, beta=0.0,
            gamma=7.0, hg_correction=True, tensile_correction=False)

    def configure_scheme(self):
        s = self.scheme
        h0 = self.dx * self.hdx
        s.configure(h0=h0, hdx=self.hdx)
        dt = 0.25 * h0 / (1.1 * self.c0)
        s.configure_solver(tf=1.5, dt=dt, adaptive_timestep=True,
                           n_damp=50)

    def create_particles(self):
        dx = self.dx
        l, b, h = 1.6, 0.67, 0.4
        lw, hw = 0.4, 0.3

        x, y, z = np.mgrid[0:l + dx:dx, 0:b + dx:dx, 0:h:dx]

        # the post
        x3, y3, z3 = np.mgrid[0.9:1.02:dx, 0.25:0.37:dx, dx:0.45:dx]
        xmax = max(x3.flat)
        ymax = max(y3.flat)
        zmax = max(z3.flat)
        post_cond = ~((x3 > 0.9) & (x3 < xmax) & (y3 > 0.25) &
                      (y3 < ymax) & (z3 < zmax))
        p_post = x3[post_cond], y3[post_cond], z3[post_cond]

        wcond = ((x > 0) & (x < lw) & (y > 0) & (y < b) & (z > 0) &
                 (z < hw))
        box = ~((x > 0) & (x <= l) & (y > 0) & (y < b) & (z > 0) &
                (z <= h))
        p_box = x[box], y[box], z[box]
        xf, yf, zf = x[wcond], y[wcond], z[wcond]
        xs, ys, zs = rhstack(p_box, p_post)

        m = dx ** 3 * 1000
        f = get_particle_array(name='fluid', x=xf, y=yf, z=zf, m=m,
                               h=dx * self.hdx, rho=1000.0)
        bnd = get_particle_array(name='boundary', x=xs, y=ys, z=zs,
                                 m=m, h=dx * self.hdx, rho=1000.0)
        self.scheme.setup_properties([f, bnd])
        return [f, bnd]


if __name__ == '__main__':
    app = DamBreak()
    app.run()
