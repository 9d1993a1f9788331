"""Kernel corrections of Bonet & Lok 1999 (parity with
/root/reference/pysph/sph/wc/kernel_correction.py).

The per-pair Gauss-Jordan solves of the reference become batched linear
algebra: the correction matrix is inverted once per destination particle
(``jnp.linalg.inv`` on an (N, n, n) batch, which XLA maps efficiently) and
applied to every pair's kernel gradient with one contraction.
"""

import jax.numpy as jnp

from pysph_tpu.sph.equation import Equation


class KernelCorrection(Equation):
    """Shepard denominator, Bonet-Lok eq. (53) (reference
    kernel_correction.py:23)."""

    def initialize(self, d_idx, d_cwij):
        d_cwij[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_cwij, s_m, s_rho, WIJ):
        d_cwij[d_idx] += s_m[s_idx] * WIJ / s_rho[s_idx]


class GradientCorrectionPreStep(Equation):
    """Accumulate the moment matrix L^-1 = -sum V dW (x) xij
    (reference kernel_correction.py:40)."""

    def __init__(self, dest, sources, dim=2):
        self.dim = dim
        super(GradientCorrectionPreStep, self).__init__(dest, sources)

    def initialize(self, d_idx, d_m_mat):
        for i in range(9):
            d_m_mat[9 * d_idx + i] = 0.0

    def loop(self, d_idx, s_idx, d_m_mat, s_m, s_rho, DWIJ, XIJ):
        V = s_m[s_idx] / s_rho[s_idx]
        n = self.dim
        for i in range(n):
            for j in range(n):
                d_m_mat[9 * d_idx + 3 * i + j] += -V * DWIJ[i] * XIJ[j]


class GradientCorrection(Equation):
    """Correct DWIJ in place: DWIJ <- L_a DWIJ, Bonet-Lok eq. (42)/(45)
    (reference kernel_correction.py:77).  Later equations in the same
    group see the corrected gradient."""

    def __init__(self, dest, sources, dim=2, tol=0.1):
        self.dim = dim
        self.tol = tol
        super(GradientCorrection, self).__init__(dest, sources)

    def loop(self, d_idx, d_m_mat, DWIJ, HIJ):
        from pysph_tpu.sph.wc.linalg import small_solve_cols
        n = self.dim
        eps = 1.0e-4 * HIJ
        # closed-form adjugate solve on the raw column reads: plain
        # arithmetic only, so the loop lowers inside pallas kernels
        # (jnp.linalg.inv needs an LU primitive Mosaic lacks)
        a = [[d_m_mat[9 * d_idx + 3 * i + j] for j in range(n)]
             for i in range(n)]
        res = small_solve_cols(a, [DWIJ[i] for i in range(n)], n)
        res_mag = sum(jnp.abs(res[i]) for i in range(n))
        dwij_mag = sum(jnp.abs(DWIJ[i]) for i in range(n))
        change = jnp.abs(res_mag - dwij_mag) / (dwij_mag + eps)
        ok = change < self.tol
        for i in range(n):
            DWIJ[i] = jnp.where(ok, res[i], DWIJ[i])


class MixedKernelCorrectionPreStep(Equation):
    """Mixed correction prestep, Bonet-Lok eq. (54)/(57)/(58)
    (reference kernel_correction.py:130).

    Written against the vectorized engine: the first accumulation (den and
    gamma) completes before its value is read, so the reference's two
    neighbor passes collapse into sequential whole-array ops."""

    def __init__(self, dest, sources, dim=2):
        self.dim = dim
        super(MixedKernelCorrectionPreStep, self).__init__(dest, sources)

    def initialize(self, d_idx, d_m_mat, d_cwij, d_dw_gamma):
        for i in range(9):
            d_m_mat[9 * d_idx + i] = 0.0
        d_cwij[d_idx] = 0.0
        for i in range(3):
            d_dw_gamma[3 * d_idx + i] = 0.0

    def loop_all(self, d_idx, s_idx, d_m_mat, s_m, s_rho, d_cwij,
                 d_dw_gamma, WIJ, DWIJ, XIJ, RIJ):
        n = self.dim
        V = s_m[s_idx] / s_rho[s_idx]
        # pass 1: denominator and gamma (complete after these writes)
        d_cwij[d_idx] += V * WIJ
        for i in range(n):
            d_dw_gamma[3 * d_idx + i] += V * DWIJ[i]
        den = d_cwij[d_idx]
        for i in range(n):
            d_dw_gamma[3 * d_idx + i] = d_dw_gamma[3 * d_idx + i] / den
        # pass 2: moment matrix with the centered, normalized gradient
        for i in range(n):
            dwij1_i = (DWIJ[i] - d_dw_gamma[3 * d_idx + i]) / den
            for j in range(n):
                contrib = jnp.where(RIJ > 1e-12, -V * dwij1_i * XIJ[j],
                                    0.0)
                d_m_mat[9 * d_idx + 3 * i + j] += contrib


class MixedGradientCorrection(Equation):
    """Mixed kernel-gradient correction (reference
    kernel_correction.py:216)."""

    def __init__(self, dest, sources, dim=2, tol=0.1):
        self.dim = dim
        self.tol = tol
        super(MixedGradientCorrection, self).__init__(dest, sources)

    def loop(self, d_idx, d_m_mat, d_dw_gamma, d_cwij, DWIJ, HIJ):
        from pysph_tpu.sph.wc.linalg import small_solve_cols
        n = self.dim
        eps = 1.0e-4 * HIJ
        den = d_cwij[d_idx]
        dwij = [(DWIJ[i] - d_dw_gamma[3 * d_idx + i]) / den
                for i in range(n)]
        # adjugate solve (pallas-lowerable; see GradientCorrection)
        a = [[d_m_mat[9 * d_idx + 3 * i + j] for j in range(n)]
             for i in range(n)]
        res = small_solve_cols(a, dwij, n)
        res_mag = sum(jnp.abs(res[i]) for i in range(n))
        dwij_mag = sum(jnp.abs(dwij[i]) for i in range(n))
        change = jnp.abs(res_mag - dwij_mag) / (dwij_mag + eps)
        ok = change < self.tol
        for i in range(n):
            DWIJ[i] = jnp.where(ok, res[i], DWIJ[i])
