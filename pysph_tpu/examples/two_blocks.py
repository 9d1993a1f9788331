"""Two square blocks of water colliding head-on, solved with IISPH
(parity case for /root/reference/pysph/examples/two_blocks.py, ~20 s
serial CPU there)."""

import numpy as np

from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.iisph import IISPHScheme
from pysph_tpu.tools.geometry_utils import create_2D_filled_region

dx = 0.025
hdx = 1.0
rho0 = 1000.0


class TwoBlocks(Application):
    def create_particles(self):
        x1, y1 = create_2D_filled_region(-1, 0, 0, 1, dx)
        x2, y2 = create_2D_filled_region(0.5, 0, 1.5, 1, dx)
        x = np.concatenate((x1, x2))
        y = np.concatenate((y1, y2))
        u = np.concatenate((np.ones_like(x1), -np.ones_like(x2)))

        fluid = get_particle_array(
            name='fluid', x=x, y=y, u=u, rho=np.full_like(x, rho0),
            m=np.full_like(x, dx * dx * rho0),
            h=np.full_like(x, hdx * dx))
        self.scheme.setup_properties([fluid])
        return [fluid]

    def create_scheme(self):
        return IISPHScheme(fluids=['fluid'], solids=[], dim=2,
                           rho0=rho0)

    def configure_scheme(self):
        self.scheme.configure_solver(dt=2e-3, tf=1.0,
                                     adaptive_timestep=False,
                                     pfreq=10)


if __name__ == '__main__':
    app = TwoBlocks()
    app.run()
