"""Evolution of a circular patch of incompressible fluid — the
minimal scheme-based setup (parity case for
/root/reference/pysph/examples/elliptical_drop_simple.py, ~30 s
serial CPU there).

See Monaghan, "Simulating Free Surface Flows with SPH", JCP 100
(1994) 399-406."""

import numpy as np

from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.scheme import WCSPHScheme


class EllipticalDrop(Application):
    def initialize(self):
        self.co = 1400.0
        self.ro = 1.0
        self.hdx = 1.3
        self.dx = 0.025
        self.alpha = 0.1

    def create_scheme(self):
        s = WCSPHScheme(
            ['fluid'], [], dim=2, rho0=self.ro, c0=self.co,
            h0=self.dx * self.hdx, hdx=self.hdx, gamma=7.0,
            alpha=self.alpha, beta=0.0)
        s.configure_solver(dt=5e-6, tf=0.0076)
        return s

    def create_particles(self):
        dx = self.dx
        x, y = np.mgrid[-1.05:1.05 + 1e-4:dx, -1.05:1.05 + 1e-4:dx]
        x, y = x.ravel(), y.ravel()
        keep = x * x + y * y < 1.0
        x, y = x[keep], y[keep]
        pa = get_particle_array(
            name='fluid', x=x, y=y, u=-100.0 * x, v=100.0 * y,
            rho=np.full_like(x, self.ro),
            m=np.full_like(x, dx * dx * self.ro),
            h=np.full_like(x, self.hdx * dx))
        self.scheme.setup_properties([pa])
        print('%d particles' % pa.get_number_of_particles())
        return [pa]


if __name__ == '__main__':
    app = EllipticalDrop()
    app.run()
