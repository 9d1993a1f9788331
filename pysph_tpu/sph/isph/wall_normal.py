"""Wall normals + extrapolated wall velocities (parity with
/root/reference/pysph/sph/isph/wall_normal.py)."""

import jax.numpy as jnp

from pysph_tpu.sph.equation import Equation


class ComputeNormals(Equation):
    """SPH boundary normal estimate (reference wall_normal.py:7)."""

    def initialize(self, d_idx, d_normal_tmp, d_normal):
        for i in range(3):
            d_normal_tmp[3 * d_idx + i] = 0.0
            d_normal[3 * d_idx + i] = 0.0

    def loop(self, d_idx, d_normal_tmp, s_idx, s_m, s_rho, DWIJ):
        fac = -s_m[s_idx] / s_rho[s_idx]
        d_normal_tmp[3 * d_idx + 0] += fac * DWIJ[0]
        d_normal_tmp[3 * d_idx + 1] += fac * DWIJ[1]
        d_normal_tmp[3 * d_idx + 2] += fac * DWIJ[2]

    def post_loop(self, d_idx, d_normal_tmp, d_h):
        n = [d_normal_tmp[3 * d_idx + i] for i in range(3)]
        mag = jnp.sqrt(n[0] ** 2 + n[1] ** 2 + n[2] ** 2)
        ok = mag > 0.25 / d_h[d_idx]
        mag_safe = jnp.where(mag > 0.0, mag, 1.0)
        for i in range(3):
            d_normal_tmp[3 * d_idx + i] = jnp.where(
                ok, n[i] / mag_safe, 0.0)


class SmoothNormals(Equation):
    """(reference wall_normal.py:51)"""

    def loop(self, d_idx, d_normal, s_normal_tmp, s_idx, s_m, s_rho,
             WIJ):
        fac = s_m[s_idx] / s_rho[s_idx] * WIJ
        d_normal[3 * d_idx + 0] += fac * s_normal_tmp[3 * s_idx + 0]
        d_normal[3 * d_idx + 1] += fac * s_normal_tmp[3 * s_idx + 1]
        d_normal[3 * d_idx + 2] += fac * s_normal_tmp[3 * s_idx + 2]

    def post_loop(self, d_idx, d_normal, d_h):
        n = [d_normal[3 * d_idx + i] for i in range(3)]
        mag = jnp.sqrt(n[0] ** 2 + n[1] ** 2 + n[2] ** 2)
        ok = mag > 1e-3
        mag_safe = jnp.where(mag > 0.0, mag, 1.0)
        for i in range(3):
            d_normal[3 * d_idx + i] = jnp.where(ok, n[i] / mag_safe,
                                                0.0)


class SetWallVelocityNew(Equation):
    """Extrapolate fluid velocity onto walls with a half-support
    Shepard filter, then reflect and remove inward normal flow
    (reference wall_normal.py:75)."""

    def initialize(self, d_idx, d_uf, d_vf, d_wf, d_wij):
        d_uf[d_idx] = 0.0
        d_vf[d_idx] = 0.0
        d_wf[d_idx] = 0.0
        d_wij[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_uf, d_vf, d_wf, s_u, s_v, s_w,
             d_wij, XIJ, RIJ, HIJ, SPH_KERNEL):
        wij = SPH_KERNEL.kernel(XIJ, RIJ, 0.5 * HIJ)
        d_wij[d_idx] += wij
        d_uf[d_idx] += s_u[s_idx] * wij
        d_vf[d_idx] += s_v[s_idx] * wij
        d_wf[d_idx] += s_w[s_idx] * wij

    def post_loop(self, d_uf, d_vf, d_wf, d_wij, d_idx, d_ug, d_vg,
                  d_wg, d_u, d_v, d_w, d_normal):
        ok = d_wij[d_idx] > 1e-12
        denom = jnp.where(ok, d_wij[d_idx], 1.0)
        uf = jnp.where(ok, d_uf[d_idx] / denom, d_uf[d_idx])
        vf = jnp.where(ok, d_vf[d_idx] / denom, d_vf[d_idx])
        wf = jnp.where(ok, d_wf[d_idx] / denom, d_wf[d_idx])
        d_uf[d_idx] = uf
        d_vf[d_idx] = vf
        d_wf[d_idx] = wf

        ug = 2 * d_u[d_idx] - uf
        vg = 2 * d_v[d_idx] - vf
        wg = 2 * d_w[d_idx] - wf
        n = [d_normal[3 * d_idx + i] for i in range(3)]
        vn = ug * n[0] + vg * n[1] + wg * n[2]
        neg = vn < 0
        d_ug[d_idx] = jnp.where(neg, ug - vn * n[0], ug)
        d_vg[d_idx] = jnp.where(neg, vg - vn * n[1], vg)
        d_wg[d_idx] = jnp.where(neg, wg - vn * n[2], wg)
