"""Taylor-Green vortex started from a packed (relaxed, non-lattice)
particle distribution instead of a perturbed lattice (parity case
for /root/reference/pysph/examples/tg_with_packed_particles.py)."""

import numpy as np

from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.examples.taylor_green import (L, U, TaylorGreen,
                                             exact_solution, rho0)


class TGPacked(TaylorGreen):
    def _get_packed_points(self):
        """returns xs, ys, zs, xf, yf, zf"""
        from pysph_tpu.tools.geometry import (
            get_packed_periodic_packed_particles)
        return get_packed_periodic_packed_particles(
            self.add_user_options, self.output_dir, self.dx, L=L,
            B=L)

    def create_particles(self):
        xs, ys, zs, xf, yf, zf = self._get_packed_points()
        x, y = xf, yf
        dx = self.dx
        h = np.ones_like(x) * self.hdx * dx
        m = np.ones_like(x) * dx * dx * rho0
        u, v, p = exact_solution(U, 0.0, 0.0, x, y)
        pa = get_particle_array(
            name='fluid', x=x, y=y, h=h, m=m,
            rho=rho0 * np.ones_like(x), u=u, v=v, p=p)
        self.scheme.setup_properties([pa])
        pa.V = 1.0 / (dx * dx) * np.ones_like(x)
        print('Packed Taylor-Green: %d particles, dt=%g'
              % (len(x), self.dt))
        return [pa]


if __name__ == '__main__':
    app = TGPacked()
    app.run()
    app.post_process(app.info_filename)
