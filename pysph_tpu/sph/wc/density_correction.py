"""Density reinitialization (parity with
/root/reference/pysph/sph/wc/density_correction.py): Shepard filter and
first-order Moving-Least-Squares in 2D/3D.

The per-particle MLS moment systems become one batched linear solve over
all particles."""

import jax.numpy as jnp

from pysph_tpu.sph.equation import Equation
from pysph_tpu.sph.wc.linalg import gj_solve  # noqa: F401 (API parity)


class ShepardFilter(Equation):
    """Zeroth-order density reinitialization
    (reference density_correction.py:7)."""

    def initialize(self, d_idx, d_rho, d_rhotmp):
        d_rhotmp[d_idx] = d_rho[d_idx]

    def loop_all(self, d_idx, d_rho, s_idx, s_m, s_rhotmp, WIJ,
                 PAIR_MASK):
        mj = s_m[s_idx]
        w = jnp.where(PAIR_MASK, WIJ, 0.0)
        num = jnp.sum(w * mj, axis=2)
        den = jnp.sum(w * mj / s_rhotmp[s_idx], axis=2)
        d_rho[d_idx] = num / jnp.where(den > 0, den, 1.0)


class MLSFirstOrder2D(Equation):
    """First-order MLS density reinitialization in 2D, Dilts 1999
    (reference density_correction.py:49)."""

    def initialize(self, d_idx, d_rho, d_rhotmp):
        d_rhotmp[d_idx] = d_rho[d_idx]

    def loop_all(self, d_idx, d_rho, s_idx, s_m, s_rhotmp, WIJ, XIJ,
                 PAIR_MASK):
        mj = s_m[s_idx]
        Vj = mj / s_rhotmp[s_idx]
        w = jnp.where(PAIR_MASK, WIJ * Vj, 0.0)
        # p = [1, xij, yij]; A = sum w p p^T  -> (cells, M, 3, 3)
        p = [jnp.ones_like(XIJ[0]), XIJ[0], XIJ[1]]
        A = jnp.stack(
            [jnp.stack([jnp.sum(w * p[i] * p[j], axis=2)
                        for j in range(3)], axis=-1)
             for i in range(3)], axis=-2)
        b = jnp.zeros(A.shape[:-1]).at[..., 0].set(1.0)
        beta = gj_solve(A, b)
        wmls = (beta[..., 0:1] + beta[..., 1:2] * XIJ[0] +
                beta[..., 2:3] * XIJ[1]) * WIJ
        d_rho[d_idx] = jnp.sum(
            jnp.where(PAIR_MASK, mj * wmls, 0.0), axis=2)


class MLSFirstOrder3D(Equation):
    """First-order MLS density reinitialization in 3D
    (reference density_correction.py:143)."""

    def initialize(self, d_idx, d_rho, d_rhotmp):
        d_rhotmp[d_idx] = d_rho[d_idx]

    def loop_all(self, d_idx, d_rho, s_idx, s_m, s_rhotmp, WIJ, XIJ,
                 PAIR_MASK):
        mj = s_m[s_idx]
        Vj = mj / s_rhotmp[s_idx]
        w = jnp.where(PAIR_MASK, WIJ * Vj, 0.0)
        p = [jnp.ones_like(XIJ[0]), XIJ[0], XIJ[1], XIJ[2]]
        A = jnp.stack(
            [jnp.stack([jnp.sum(w * p[i] * p[j], axis=2)
                        for j in range(4)], axis=-1)
             for i in range(4)], axis=-2)
        b = jnp.zeros(A.shape[:-1]).at[..., 0].set(1.0)
        beta = gj_solve(A, b)
        wmls = (beta[..., 0:1] + beta[..., 1:2] * XIJ[0] +
                beta[..., 2:3] * XIJ[1] + beta[..., 3:4] * XIJ[2]) * WIJ
        d_rho[d_idx] = jnp.sum(
            jnp.where(PAIR_MASK, mj * wmls, 0.0), axis=2)
