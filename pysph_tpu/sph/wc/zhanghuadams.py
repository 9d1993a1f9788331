"""Zhang-Hu-Adams low-dissipation Riemann WCSPH (parity with
/root/reference/pysph/sph/wc/zhanghuadams.py)."""

import jax.numpy as jnp

from pysph_tpu.sph.equation import Equation


def _unit_eij(XIJ, RIJ):
    near = RIJ >= 1e-12
    safe_r = jnp.where(near, RIJ, 1.0)
    return [jnp.where(near, -XIJ[i] / safe_r, 0.0) for i in range(3)]


class Continuity(Equation):
    """Linearized-Riemann continuity (reference zhanghuadams.py:4)."""

    def __init__(self, dest, sources, c0):
        self.c0 = c0
        super(Continuity, self).__init__(dest, sources)

    def initialize(self, d_idx, d_arho):
        d_arho[d_idx] = 0.0

    def loop(self, d_idx, s_idx, s_m, d_u, d_v, d_w, s_u, s_v, s_w,
             d_cs, s_cs, d_rho, d_arho, s_rho, d_p, s_p, DWIJ, RIJ,
             XIJ):
        rl, rr = d_rho[d_idx], s_rho[s_idx]
        pl, pr = d_p[d_idx], s_p[s_idx]
        co = self.c0
        uvecl = (d_u[d_idx], d_v[d_idx], d_w[d_idx])
        uvecr = (s_u[s_idx], s_v[s_idx], s_w[s_idx])
        vij = [0.5 * (uvecl[i] + uvecr[i]) for i in range(3)]
        eij = _unit_eij(XIJ, RIJ)
        ul = sum(uvecl[i] * eij[i] for i in range(3))
        ur = sum(uvecr[i] * eij[i] for i in range(3))
        rhobar = 0.5 * (rl + rr)
        u_star = 0.5 * (ul + ur) + 0.5 * (pl - pr) / (rhobar * co)
        v_star = [(u_star - 0.5 * (ul + ur)) * eij[i] + vij[i]
                  for i in range(3)]
        vdotw = ((uvecl[0] - v_star[0]) * DWIJ[0] +
                 (uvecl[1] - v_star[1]) * DWIJ[1] +
                 (uvecl[2] - v_star[2]) * DWIJ[2])
        d_arho[d_idx] += 2.0 * s_m[s_idx] * vdotw * rl / rr


class MomentumFluid(Equation):
    """Linearized-Riemann momentum (reference zhanghuadams.py:55)."""

    def __init__(self, dest, sources, c0, gx=0.0, gy=0.0, gz=0.0):
        self.gx = gx
        self.gy = gy
        self.gz = gz
        self.c0 = c0
        super(MomentumFluid, self).__init__(dest, sources)

    def initialize(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] = self.gx
        d_av[d_idx] = self.gy
        d_aw[d_idx] = self.gz

    def loop(self, d_idx, s_idx, s_m, d_u, d_v, d_w, s_u, s_v, s_w,
             d_cs, s_cs, d_rho, s_rho, d_p, s_p, d_au, d_av, d_aw,
             RIJ, XIJ, DWIJ, HIJ):
        rl, rr = d_rho[d_idx], s_rho[s_idx]
        pl, pr = d_p[d_idx], s_p[s_idx]
        co = self.c0
        uvecl = (d_u[d_idx], d_v[d_idx], d_w[d_idx])
        uvecr = (s_u[s_idx], s_v[s_idx], s_w[s_idx])
        eij = _unit_eij(XIJ, RIJ)
        ul = sum(uvecl[i] * eij[i] for i in range(3))
        ur = sum(uvecr[i] * eij[i] for i in range(3))
        rhobar = 0.5 * (rl + rr)
        p_star = 0.5 * (pl + pr) + 0.5 * rhobar * co * (ul - ur)
        factor = -2.0 * s_m[s_idx] * p_star / (rl * rr)
        d_au[d_idx] += factor * DWIJ[0]
        d_av[d_idx] += factor * DWIJ[1]
        d_aw[d_idx] += factor * DWIJ[2]
