"""Parshikov Riemann-based WCSPH continuity/momentum (parity with
/root/reference/pysph/sph/wc/parshikov.py)."""

import jax.numpy as jnp

from pysph_tpu.sph.equation import Equation


def _radial_velocities(XIJ, RIJ, ul_vec, ur_vec):
    near = RIJ >= 1e-16
    safe_r = jnp.where(near, RIJ, 1.0)
    ul = -(ul_vec[0] * XIJ[0] + ul_vec[1] * XIJ[1] +
           ul_vec[2] * XIJ[2]) / safe_r
    ur = -(ur_vec[0] * XIJ[0] + ur_vec[1] * XIJ[1] +
           ur_vec[2] * XIJ[2]) / safe_r
    return jnp.where(near, ul, 0.0), jnp.where(near, ur, 0.0)


class Continuity(Equation):
    """Acoustic-Riemann continuity (reference parshikov.py:4)."""

    def initialize(self, d_idx, d_arho):
        d_arho[d_idx] = 0.0

    def loop(self, d_idx, s_idx, s_m, d_u, d_v, d_w, s_u, s_v, s_w,
             d_cs, s_cs, d_rho, d_arho, s_rho, d_p, s_p, DWIJ, RIJ,
             XIJ):
        rl, rr = d_rho[d_idx], s_rho[s_idx]
        pl, pr = d_p[d_idx], s_p[s_idx]
        cl, cr = d_cs[d_idx], s_cs[s_idx]
        ul, ur = _radial_velocities(
            XIJ, RIJ, (d_u[d_idx], d_v[d_idx], d_w[d_idx]),
            (s_u[s_idx], s_v[s_idx], s_w[s_idx]))
        u_star = (ul * rl * cl + ur * rr * cr + pl - pr) / \
            (rl * cl + rr * cr)
        dwdr = jnp.sqrt(DWIJ[0] ** 2 + DWIJ[1] ** 2 + DWIJ[2] ** 2)
        d_arho[d_idx] += 2.0 * s_m[s_idx] * dwdr * (ul - u_star) * \
            rl / rr


class Momentum(Equation):
    """Acoustic-Riemann momentum (reference parshikov.py:29)."""

    def __init__(self, dest, sources, gx=0.0, gy=0.0, gz=0.0):
        self.gx = gx
        self.gy = gy
        self.gz = gz
        super(Momentum, self).__init__(dest, sources)

    def initialize(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] = self.gx
        d_av[d_idx] = self.gy
        d_aw[d_idx] = self.gz

    def loop(self, d_idx, s_idx, s_m, d_u, d_v, d_w, s_u, s_v, s_w,
             d_cs, s_cs, d_rho, s_rho, d_p, s_p, d_au, d_av, d_aw,
             RIJ, XIJ, DWIJ):
        rl, rr = d_rho[d_idx], s_rho[s_idx]
        pl, pr = d_p[d_idx], s_p[s_idx]
        cl, cr = d_cs[d_idx], s_cs[s_idx]
        ul, ur = _radial_velocities(
            XIJ, RIJ, (d_u[d_idx], d_v[d_idx], d_w[d_idx]),
            (s_u[s_idx], s_v[s_idx], s_w[s_idx]))
        p_star = (pl * rr * cr + pr * cl * rl -
                  rl * rr * cl * cr * (ur - ul)) / (rl * cl + rr * cr)
        factor = -2.0 * s_m[s_idx] * p_star / (rl * rr)
        d_au[d_idx] += factor * DWIJ[0]
        d_av[d_idx] += factor * DWIJ[1]
        d_aw[d_idx] += factor * DWIJ[2]
