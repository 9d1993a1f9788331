"""Equilibrium rod on a staggered (hexagonal-like) lattice — same
Young–Laplace check as equilibrium_rod but with half-mass particles
on two interleaved grids (parity case for
/root/reference/pysph/examples/surface_tension/equilibrium_rod_hex.py).
"""

import numpy as np

from pysph_tpu.examples.surface_tension.equilibrium_rod import (
    Lx, Ly, MultiPhase, dx, rho0, volume)


class MultiPhaseHex(MultiPhase):
    def _lattice(self):
        x, y = np.mgrid[-0.5 * Lx:0.5 * Lx:dx,
                        -0.5 * Ly:0.5 * Ly:dx]
        xc = x + 0.5 * dx
        yc = y + 0.5 * dx
        fx = np.concatenate([x.ravel(), xc.ravel()]) + 0.25 * dx
        fy = np.concatenate([y.ravel(), yc.ravel()]) + 0.25 * dx
        return fx, fy

    def _particle_mass(self):
        return rho0 * volume * 0.5


if __name__ == '__main__':
    app = MultiPhaseHex()
    app.run()
    app.post_process()
