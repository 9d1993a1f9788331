"""First-order (moment-matrix) property extrapolation for open
boundaries (parity with /root/reference/pysph/sph/bc/interpolate.py).

The per-particle 4x4 Gauss-Jordan solves become one batched
``jnp.linalg.solve`` over the active (dim+1) block.  Ghost->io copies
(``initialize_pair`` methods) are index-matched in PARTICLE space: the
source view is gathered at ``D_PIDX`` (this slot's particle id), which
the view translates through the source's own layout.
"""

import jax.numpy as jnp

from pysph_tpu.sph.equation import Equation


def _solve4(d_A, d_idx, rhs_cols, n):
    """Solve the leading (n x n) block of each particle's 4x4 moment
    matrix for each rhs in ``rhs_cols`` (list of length-4 component
    lists).  Returns a list of length-4 solution component lists."""
    rows = []
    for i in range(n):
        cols = [d_A[16 * d_idx + 4 * i + j] for j in range(n)]
        rows.append(jnp.stack(cols, axis=-1))
    A = jnp.stack(rows, axis=-2)                     # (N, n, n)
    det = jnp.linalg.det(A)
    good = jnp.abs(det) > 1e-12
    eye = jnp.broadcast_to(jnp.eye(n), A.shape)
    A = jnp.where(good[..., None, None], A, eye)
    outs = []
    for comps in rhs_cols:
        b = jnp.stack(comps[:n], axis=-1)            # (N, n)
        sol = jnp.linalg.solve(A, b[..., None])[..., 0]
        sol = jnp.where(good[..., None], sol, 0.0)
        full = [sol[..., i] for i in range(n)]
        full += [jnp.zeros_like(full[0]) for _ in range(4 - n)]
        outs.append(full)
    return outs


class UpdateMomentMatrix(Equation):
    """Accumulate the 4x4 moment matrix A (reference
    interpolate.py:331)."""

    def __init__(self, dest, sources, dim=1):
        self.dim = dim
        super(UpdateMomentMatrix, self).__init__(dest, sources)

    def initialize(self, d_idx, d_A):
        for i in range(16):
            d_A[16 * d_idx + i] = 0.0

    def loop(self, d_idx, s_idx, s_rho, s_m, d_A, XIJ, WIJ, DWIJ):
        Vj = s_m[s_idx] / s_rho[s_idx]
        d_A[16 * d_idx + 0] += WIJ * Vj
        d_A[16 * d_idx + 1] += -XIJ[0] * WIJ * Vj
        d_A[16 * d_idx + 2] += -XIJ[1] * WIJ * Vj
        d_A[16 * d_idx + 3] += -XIJ[2] * WIJ * Vj
        for k in range(3):
            d_A[16 * d_idx + 4 * (k + 1)] += DWIJ[k] * Vj
            for m in range(3):
                d_A[16 * d_idx + 4 * (k + 1) + m + 1] += \
                    -XIJ[m] * DWIJ[k] * Vj


class EvaluateUhat(Equation):
    """First-order fit of uhat/vhat/what around each ghost
    (reference interpolate.py:5)."""

    def __init__(self, dest, sources, dim=1):
        self.dim = dim
        super(EvaluateUhat, self).__init__(dest, sources)

    def initialize(self, d_idx, d_uho, d_Buh, d_vho, d_Bvh, d_who,
                   d_Bwh):
        for i in range(4):
            d_uho[4 * d_idx + i] = 0.0
            d_Buh[4 * d_idx + i] = 0.0
            d_vho[4 * d_idx + i] = 0.0
            d_Bvh[4 * d_idx + i] = 0.0
            d_who[4 * d_idx + i] = 0.0
            d_Bwh[4 * d_idx + i] = 0.0

    def loop(self, d_idx, s_rho, s_m, s_idx, XIJ, DWIJ, WIJ, s_uhat,
             d_Buh, s_vhat, d_Bvh, s_what, d_Bwh):
        Vj = s_m[s_idx] / s_rho[s_idx]
        for prop, acc in ((s_uhat, d_Buh), (s_vhat, d_Bvh),
                          (s_what, d_Bwh)):
            fj = prop[s_idx]
            acc[4 * d_idx + 0] += fj * WIJ * Vj
            acc[4 * d_idx + 1] += fj * DWIJ[0] * Vj
            acc[4 * d_idx + 2] += fj * DWIJ[1] * Vj
            acc[4 * d_idx + 3] += fj * DWIJ[2] * Vj

    def post_loop(self, d_idx, d_A, d_uho, d_Buh, d_vho, d_Bvh, d_who,
                  d_Bwh):
        n = self.dim + 1
        rhs = [[d_Buh[4 * d_idx + i] for i in range(4)],
               [d_Bvh[4 * d_idx + i] for i in range(4)],
               [d_Bwh[4 * d_idx + i] for i in range(4)]]
        uo, vo, wo = _solve4(d_A, d_idx, rhs, n)
        for i in range(4):
            d_uho[4 * d_idx + i] = uo[i]
            d_vho[4 * d_idx + i] = vo[i]
            d_who[4 * d_idx + i] = wo[i]


class ExtrapolateUhat(Equation):
    """(reference interpolate.py:96)"""

    def initialize(self, d_idx, d_uhat, d_vhat, d_what):
        d_uhat[d_idx] = 0.0
        d_vhat[d_idx] = 0.0
        d_what[d_idx] = 0.0

    def post_loop(self, d_idx, d_uhat, d_uho, d_vhat, d_vho, d_what,
                  d_who, d_disp, d_xn, d_yn, d_zn):
        delx = 2 * d_disp[d_idx] * d_xn[d_idx]
        dely = 2 * d_disp[d_idx] * d_yn[d_idx]
        delz = 2 * d_disp[d_idx] * d_zn[d_idx]
        d_uhat[d_idx] = -1.0 * (d_uho[4 * d_idx + 0] -
                                delx * d_uho[4 * d_idx + 1] -
                                dely * d_uho[4 * d_idx + 2] -
                                delz * d_uho[4 * d_idx + 3])
        d_vhat[d_idx] = (d_vho[4 * d_idx + 0] -
                         delx * d_vho[4 * d_idx + 1] -
                         dely * d_vho[4 * d_idx + 2] -
                         delz * d_vho[4 * d_idx + 3])
        d_what[d_idx] = (d_who[4 * d_idx + 0] -
                         delx * d_who[4 * d_idx + 1] -
                         dely * d_who[4 * d_idx + 2] -
                         delz * d_who[4 * d_idx + 3])


class CopyUhatFromGhost(Equation):
    """(reference interpolate.py:127)"""

    def initialize_pair(self, d_idx, d_uhat, s_uhat, d_vhat, s_vhat,
                        d_what, s_what, D_PIDX):
        d_uhat[d_idx] = -1.0 * s_uhat[D_PIDX]
        d_vhat[d_idx] = s_vhat[D_PIDX]
        d_what[d_idx] = s_what[D_PIDX]


class EvaluateU(Equation):
    """(reference interpolate.py:138)"""

    def __init__(self, dest, sources, dim=1):
        self.dim = dim
        super(EvaluateU, self).__init__(dest, sources)

    def initialize(self, d_idx, d_uo, d_Bu, d_vo, d_Bv, d_wo, d_Bw):
        for i in range(4):
            d_uo[4 * d_idx + i] = 0.0
            d_Bu[4 * d_idx + i] = 0.0
            d_vo[4 * d_idx + i] = 0.0
            d_Bv[4 * d_idx + i] = 0.0
            d_wo[4 * d_idx + i] = 0.0
            d_Bw[4 * d_idx + i] = 0.0

    def loop(self, d_idx, s_rho, s_m, s_idx, XIJ, DWIJ, WIJ, s_u,
             d_Bu, s_v, d_Bv, s_w, d_Bw):
        Vj = s_m[s_idx] / s_rho[s_idx]
        for prop, acc in ((s_u, d_Bu), (s_v, d_Bv), (s_w, d_Bw)):
            fj = prop[s_idx]
            acc[4 * d_idx + 0] += fj * WIJ * Vj
            acc[4 * d_idx + 1] += fj * DWIJ[0] * Vj
            acc[4 * d_idx + 2] += fj * DWIJ[1] * Vj
            acc[4 * d_idx + 3] += fj * DWIJ[2] * Vj

    def post_loop(self, d_idx, d_A, d_uo, d_Bu, d_vo, d_Bv, d_wo,
                  d_Bw):
        n = self.dim + 1
        rhs = [[d_Bu[4 * d_idx + i] for i in range(4)],
               [d_Bv[4 * d_idx + i] for i in range(4)],
               [d_Bw[4 * d_idx + i] for i in range(4)]]
        uo, vo, wo = _solve4(d_A, d_idx, rhs, n)
        for i in range(4):
            d_uo[4 * d_idx + i] = uo[i]
            d_vo[4 * d_idx + i] = vo[i]
            d_wo[4 * d_idx + i] = wo[i]


class ExtrapolateU(Equation):
    """(reference interpolate.py:229)"""

    def initialize(self, d_idx, d_u, d_v, d_w):
        d_u[d_idx] = 0.0
        d_v[d_idx] = 0.0
        d_w[d_idx] = 0.0

    def post_loop(self, d_idx, d_u, d_uo, d_v, d_vo, d_w, d_wo,
                  d_disp, d_xn, d_yn, d_zn):
        delx = 2 * d_disp[d_idx] * d_xn[d_idx]
        dely = 2 * d_disp[d_idx] * d_yn[d_idx]
        delz = 2 * d_disp[d_idx] * d_zn[d_idx]
        d_u[d_idx] = -1.0 * (d_uo[4 * d_idx + 0] -
                             delx * d_uo[4 * d_idx + 1] -
                             dely * d_uo[4 * d_idx + 2] -
                             delz * d_uo[4 * d_idx + 3])
        d_v[d_idx] = (d_vo[4 * d_idx + 0] -
                      delx * d_vo[4 * d_idx + 1] -
                      dely * d_vo[4 * d_idx + 2] -
                      delz * d_vo[4 * d_idx + 3])
        d_w[d_idx] = (d_wo[4 * d_idx + 0] -
                      delx * d_wo[4 * d_idx + 1] -
                      dely * d_wo[4 * d_idx + 2] -
                      delz * d_wo[4 * d_idx + 3])


class CopyUFromGhost(Equation):
    """(reference interpolate.py:260)"""

    def initialize_pair(self, d_idx, d_u, s_u, d_v, s_v, d_w, s_w,
                        D_PIDX):
        d_u[d_idx] = -1.0 * s_u[D_PIDX]
        d_v[d_idx] = s_v[D_PIDX]
        d_w[d_idx] = s_w[D_PIDX]


class EvaluateP(Equation):
    """(reference interpolate.py:271)"""

    def __init__(self, dest, sources, dim=1):
        self.dim = dim
        super(EvaluateP, self).__init__(dest, sources)

    def initialize(self, d_idx, d_po, d_Bp):
        for i in range(4):
            d_po[4 * d_idx + i] = 0.0
            d_Bp[4 * d_idx + i] = 0.0

    def loop(self, d_idx, s_rho, s_m, s_idx, XIJ, DWIJ, WIJ, s_p,
             d_Bp):
        Vj = s_m[s_idx] / s_rho[s_idx]
        pj = s_p[s_idx]
        d_Bp[4 * d_idx + 0] += pj * WIJ * Vj
        d_Bp[4 * d_idx + 1] += pj * DWIJ[0] * Vj
        d_Bp[4 * d_idx + 2] += pj * DWIJ[1] * Vj
        d_Bp[4 * d_idx + 3] += pj * DWIJ[2] * Vj

    def post_loop(self, d_idx, d_A, d_po, d_Bp):
        n = self.dim + 1
        rhs = [[d_Bp[4 * d_idx + i] for i in range(4)]]
        (po,) = _solve4(d_A, d_idx, rhs, n)
        for i in range(4):
            d_po[4 * d_idx + i] = po[i]


class ExtrapolateP(Equation):
    """(reference interpolate.py:313)"""

    def initialize(self, d_idx, d_p):
        d_p[d_idx] = 0.0

    def post_loop(self, d_idx, d_p, d_po, d_disp, d_xn, d_yn, d_zn):
        delx = 2 * d_disp[d_idx] * d_xn[d_idx]
        dely = 2 * d_disp[d_idx] * d_yn[d_idx]
        delz = 2 * d_disp[d_idx] * d_zn[d_idx]
        d_p[d_idx] = (d_po[4 * d_idx + 0] -
                      delx * d_po[4 * d_idx + 1] -
                      dely * d_po[4 * d_idx + 2] -
                      delz * d_po[4 * d_idx + 3])


class CopyPFromGhost(Equation):
    """(reference interpolate.py:327)"""

    def initialize_pair(self, d_idx, d_p, s_p, D_PIDX):
        d_p[d_idx] = s_p[D_PIDX]
