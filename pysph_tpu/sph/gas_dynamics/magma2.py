"""MAGMA2 (Rosswog 2020) gas-dynamics scheme (parity with
/root/reference/pysph/sph/gas_dynamics/magma2.py).

Vectorization notes:

- ``UpdateSmoothingLength`` needs the distance of the ndes-th nearest
  neighbor (the reference quicksorts a per-particle distance array);
  here it is a ``lax.top_k`` over the masked pair block.
- All per-particle dim x dim Gauss-Jordan solves (auxiliary gradient,
  correction matrix) are batched ``jnp.linalg`` calls.
- Per-pair branches become ``jnp.where`` masks; the 0/0 slope ratio of
  the reconstruction limiter at the self-pair is guarded explicitly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pysph_tpu.sph.equation import MAX, Equation
from pysph_tpu.sph.integrator import Integrator
from pysph_tpu.sph.integrator_step import IntegratorStep
from pysph_tpu.sph.scheme import Scheme, add_bool_argument


def _stack_sq(view, d_idx, dim, stride):
    """(N, dim, dim) from a strided square-matrix property."""
    rows = []
    for r in range(dim):
        cols = [view[stride * d_idx + r * dim + c] for c in range(dim)]
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def _write_sq(view, d_idx, dim, stride, mat):
    for r in range(dim):
        for c in range(dim):
            view[stride * d_idx + r * dim + c] = mat[..., r, c]


def _inv_guarded(A):
    det = jnp.linalg.det(A)
    good = jnp.abs(det) > 1e-12
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1]), A.shape)
    return jnp.linalg.inv(jnp.where(good[..., None, None], A, eye))


class IncreaseSmoothingLength(Equation):
    """(reference magma2.py:444)"""

    def initialize(self, d_idx, d_h):
        d_h[d_idx] = d_h[d_idx] * 1.10


class UpdateSmoothingLength(Equation):
    """h from the ndes-th nearest neighbor distance
    (reference magma2.py:453; quicksort -> masked top_k)."""

    def __init__(self, dest, sources, ndes):
        self.ndes = int(ndes)
        super(UpdateSmoothingLength, self).__init__(dest, sources)

    def loop(self, d_idx, d_h, RIJ, PAIR_MASK, N_NBRS, SPH_KERNEL):
        big = 1e30
        rij = jnp.where(PAIR_MASK, RIJ, big)
        k = min(self.ndes + 1, rij.shape[-1])
        # k smallest distances = top_k of the negated values
        neg_top, _ = jax.lax.top_k(-rij, k)
        kth = -neg_top[..., k - 1:k]
        # the reference uses rij[min(ndes, N_NBRS-1)] after sorting
        idx = jnp.minimum(self.ndes, jnp.maximum(N_NBRS - 1, 0))
        idx = jnp.clip(idx, 0, k - 1)
        sel = -jnp.take_along_axis(neg_top, idx, axis=-1)
        hnew = sel / SPH_KERNEL.radius_scale
        d_h[d_idx] = jnp.where((N_NBRS > 1) & (hnew < big / 2),
                               hnew, d_h[d_idx])



class SummationDensityMPMStyle(Equation):
    """(reference magma2.py:491)"""

    def __init__(self, dest, sources, dim, density_iterations=False,
                 iterate_only_once=False, hfact=1.2, htol=1e-6):
        self.density_iterations = density_iterations
        self.iterate_only_once = iterate_only_once
        self.dim = dim
        self.hfact = hfact
        self.htol = htol
        super(SummationDensityMPMStyle, self).__init__(dest, sources)

    def initialize(self, d_idx, d_rho, d_arho, d_n, d_dndh, d_prevn,
                   d_prevdndh, d_an):
        d_rho[d_idx] = 0.0
        d_arho[d_idx] = 0.0
        d_prevn[d_idx] = d_n[d_idx]
        d_prevdndh[d_idx] = d_dndh[d_idx]
        d_n[d_idx] = 0.0
        d_an[d_idx] = 0.0
        d_dndh[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_rho, d_arho, s_m, VIJ, WI, DWI,
             GHI, d_n, d_dndh, d_an):
        mj = s_m[s_idx]
        vijdotdwij = (VIJ[0] * DWI[0] + VIJ[1] * DWI[1] +
                      VIJ[2] * DWI[2])
        d_rho[d_idx] += mj * WI
        d_arho[d_idx] += mj * vijdotdwij
        d_an[d_idx] += vijdotdwij
        d_n[d_idx] += WI
        d_dndh[d_idx] += GHI

    def post_loop(self, d_idx, d_h0, d_h, d_ah, d_converged, d_n,
                  d_dndh, d_an):
        if not self.density_iterations:
            return
        active = d_converged[d_idx] != 1
        hi = d_h[d_idx]
        hi0 = d_h0[d_idx]
        ni = (self.hfact / hi) ** self.dim
        dndhi = -self.dim * d_n[d_idx] / hi
        func = d_n[d_idx] - ni
        dfdh = d_dndh[d_idx] - dndhi
        dfdh = jnp.where(dfdh != 0.0, dfdh, 1.0)
        hnew = jnp.clip(hi - func / dfdh, 0.8 * hi, 1.2 * hi)
        diff = jnp.abs(hnew - hi) / hi0
        done = (diff < self.htol) | bool(self.iterate_only_once)
        d_h[d_idx] = jnp.where(active & ~done, hnew, d_h[d_idx])
        d_ah[d_idx] = jnp.where(active & done,
                                d_an[d_idx] / dndhi, d_ah[d_idx])
        d_converged[d_idx] = jnp.where(
            active & done, 1.0,
            jnp.where(active, 0.0, d_converged[d_idx]))

    def converged(self, dst):
        if not self.density_iterations:
            return 1.0
        all_done = jnp.all(jnp.where(dst.active,
                                     dst.converged[:] == 1, True))
        return jnp.where(all_done, 1.0, -1.0)


class IdealGasEOS(Equation):
    """(reference magma2.py:591)"""

    def __init__(self, dest, sources, gamma):
        self.gamma = gamma
        self.gamma1 = gamma - 1.0
        super(IdealGasEOS, self).__init__(dest, sources)

    def post_loop(self, d_idx, d_p, d_rho, d_e, d_cs):
        d_p[d_idx] = self.gamma1 * d_rho[d_idx] * d_e[d_idx]
        d_cs[d_idx] = jnp.sqrt(self.gamma * d_p[d_idx] /
                               d_rho[d_idx])


class AuxiliaryGradient(Equation):
    """Uncorrected auxiliary gradients of v and e, then solved with
    the mass-weighted moment matrix (reference magma2.py:610)."""

    def __init__(self, dest, sources, dim):
        self.dim = dim
        self.dimsq = dim * dim
        super(AuxiliaryGradient, self).__init__(dest, sources)

    def initialize(self, d_dvaux, d_idx, d_invdm, d_deaux):
        dim, dimsq = self.dim, self.dimsq
        for i in range(dim):
            d_deaux[dim * d_idx + i] = 0.0
        for i in range(dimsq):
            d_dvaux[dimsq * d_idx + i] = 0.0
            d_invdm[dimsq * d_idx + i] = 0.0

    def loop(self, d_idx, VIJ, XIJ, d_invdm, DWI, d_dvaux, s_m, s_idx,
             d_deaux, d_e, s_e):
        dim, dimsq = self.dim, self.dimsq
        eij = d_e[d_idx] - s_e[s_idx]
        for row in range(dim):
            d_deaux[dim * d_idx + row] += s_m[s_idx] * eij * DWI[row]
            for col in range(dim):
                k = dimsq * d_idx + row * dim + col
                d_dvaux[k] += s_m[s_idx] * VIJ[row] * DWI[col]
                d_invdm[k] += s_m[s_idx] * XIJ[row] * DWI[col]

    def post_loop(self, d_idx, d_invdm, d_dvaux, d_deaux):
        dim, dimsq = self.dim, self.dimsq
        invdm = _stack_sq(d_invdm, d_idx, dim, dimsq)
        dvaux = _stack_sq(d_dvaux, d_idx, dim, dimsq)
        deaux = jnp.stack([d_deaux[dim * d_idx + r]
                           for r in range(dim)], axis=-1)
        dm = _inv_guarded(invdm)
        dv = jnp.einsum('...ij,...jk->...ik', dm, dvaux)
        de = jnp.einsum('...ij,...j->...i', dm, deaux)
        _write_sq(d_dvaux, d_idx, dim, dimsq, dv)
        for r in range(dim):
            d_deaux[dim * d_idx + r] = de[..., r]


class CorrectionMatrix(Equation):
    """Inverse volume-weighted moment matrix
    (reference magma2.py:678)."""

    def __init__(self, dest, sources, dim):
        self.dim = dim
        self.dimsq = dim * dim
        super(CorrectionMatrix, self).__init__(dest, sources)

    def initialize(self, d_cm, d_idx):
        for i in range(self.dimsq):
            d_cm[self.dimsq * d_idx + i] = 0.0

    def loop(self, d_idx, s_m, s_idx, XIJ, s_rho, d_cm, WI):
        dim, dimsq = self.dim, self.dimsq
        mbbyrhob = s_m[s_idx] / s_rho[s_idx]
        for row in range(dim):
            for col in range(dim):
                d_cm[dimsq * d_idx + row * dim + col] += \
                    mbbyrhob * XIJ[row] * XIJ[col] * WI

    def post_loop(self, d_idx, d_cm):
        dim, dimsq = self.dim, self.dimsq
        cm = _stack_sq(d_cm, d_idx, dim, dimsq)
        _write_sq(d_cm, d_idx, dim, dimsq, _inv_guarded(cm))


class FirstGradient(Equation):
    """Moment-matrix-corrected first gradients of v and e
    (reference magma2.py:736)."""

    def __init__(self, dest, sources, dim):
        self.dim = dim
        self.dimsq = dim * dim
        super(FirstGradient, self).__init__(dest, sources)

    def initialize(self, d_dv, d_idx, d_divv, d_de):
        dim, dimsq = self.dim, self.dimsq
        for i in range(dim):
            d_de[dim * d_idx + i] = 0.0
        for i in range(dimsq):
            d_dv[dimsq * d_idx + i] = 0.0
        d_divv[d_idx] = 0.0

    def loop(self, d_idx, VIJ, XIJ, d_dv, WI, s_m, s_rho, s_idx, d_e,
             s_e, d_de):
        dim, dimsq = self.dim, self.dimsq
        mbbyrhob = s_m[s_idx] / s_rho[s_idx]
        eij = d_e[d_idx] - s_e[s_idx]
        for row in range(dim):
            d_de[dim * d_idx + row] += mbbyrhob * eij * XIJ[row] * WI
            for col in range(dim):
                d_dv[dimsq * d_idx + row * dim + col] += \
                    mbbyrhob * VIJ[row] * XIJ[col] * WI

    def post_loop(self, d_idx, d_dv, d_divv, d_cm, d_de):
        dim, dimsq = self.dim, self.dimsq
        cm = _stack_sq(d_cm, d_idx, dim, dimsq)
        dvpre = _stack_sq(d_dv, d_idx, dim, dimsq)
        depre = jnp.stack([d_de[dim * d_idx + r]
                           for r in range(dim)], axis=-1)
        dv = jnp.einsum('...ij,...jk->...ik', cm, dvpre)
        de = jnp.einsum('...ij,...j->...i', cm, depre)
        div = 0.0
        for r in range(dim):
            div = div + dv[..., r, r]
        d_divv[d_idx] = div
        _write_sq(d_dv, d_idx, dim, dimsq, dv)
        for r in range(dim):
            d_de[dim * d_idx + r] = de[..., r]


class SecondGradient(Equation):
    """Second gradients from the auxiliary first gradients
    (reference magma2.py:801)."""

    def __init__(self, dest, sources, dim):
        self.dim = dim
        self.dimsq = dim * dim
        self.dimcu = self.dimsq * dim
        super(SecondGradient, self).__init__(dest, sources)

    def initialize(self, d_ddv, d_idx, d_dde):
        for i in range(self.dimcu):
            d_ddv[self.dimcu * d_idx + i] = 0.0
        for i in range(self.dimsq):
            d_dde[self.dimsq * d_idx + i] = 0.0

    def loop(self, d_idx, XIJ, d_dvaux, s_dvaux, WI, d_ddv, s_m,
             s_rho, s_idx, s_deaux, d_deaux, d_dde):
        dim, dimsq, dimcu = self.dim, self.dimsq, self.dimcu
        mbbyrhob = s_m[s_idx] / s_rho[s_idx]
        for row in range(dim):
            deij = d_deaux[dim * d_idx + row] - \
                s_deaux[dim * s_idx + row]
            for col in range(dim):
                d_dde[dimsq * d_idx + row * dim + col] += \
                    mbbyrhob * deij * XIJ[col] * WI
        for blk in range(dim):
            for row in range(dim):
                dvij = (d_dvaux[dimsq * d_idx + blk * dim + row] -
                        s_dvaux[dimsq * s_idx + blk * dim + row])
                for col in range(dim):
                    d_ddv[dimcu * d_idx + blk * dimsq + row * dim +
                          col] += mbbyrhob * dvij * XIJ[col] * WI

    def post_loop(self, d_idx, d_cm, d_ddv, d_dde):
        dim, dimsq, dimcu = self.dim, self.dimsq, self.dimcu
        cm = _stack_sq(d_cm, d_idx, dim, dimsq)
        ddepre = _stack_sq(d_dde, d_idx, dim, dimsq)
        dde = jnp.einsum('...ij,...jk->...ik', cm, ddepre)
        _write_sq(d_dde, d_idx, dim, dimsq, dde)
        for blk in range(dim):
            rows = []
            for r in range(dim):
                cols = [d_ddv[dimcu * d_idx + blk * dimsq + r * dim +
                              c] for c in range(dim)]
                rows.append(jnp.stack(cols, axis=-1))
            ddvb = jnp.stack(rows, axis=-2)
            out = jnp.einsum('...ij,...jk->...ik', cm, ddvb)
            for r in range(dim):
                for c in range(dim):
                    d_ddv[dimcu * d_idx + blk * dimsq + r * dim +
                          c] = out[..., r, c]


class EntropyBasedDissipationTrigger(Equation):
    """Smooth entropy-violation trigger for alpha
    (reference magma2.py:894)."""

    def __init__(self, dest, sources, alphamax, alphamin, fkern, l0,
                 l1, gamma):
        self.alphamax = alphamax
        self.fkern = fkern
        self.l0 = l0
        self.l1 = l1
        self.gamma = gamma
        self.alphamin = alphamin
        super(EntropyBasedDissipationTrigger, self).__init__(dest,
                                                             sources)

    def post_loop(self, d_h, d_idx, d_cs, d_alpha, d_s, d_p, d_rho,
                  dt, d_aalpha):
        snew = d_p[d_idx] / d_rho[d_idx] ** self.gamma
        tau = self.fkern * d_h[d_idx] / d_cs[d_idx]
        epsdot = jnp.abs(d_s[d_idx] - snew) * tau / \
            (d_s[d_idx] * dt)
        d_s[d_idx] = snew
        ll = jnp.log(jnp.maximum(epsdot, 1e-300))
        x = jnp.clip((ll - self.l0) / (self.l1 - self.l0), 0.0, 1.0)
        sx = ((6.0 * x - 15.0) * x + 10.0) * x * x * x
        alphades = self.alphamax * sx
        decay = d_alpha[d_idx] > alphades
        d_aalpha[d_idx] = jnp.where(
            decay, -(d_alpha[d_idx] - self.alphamin) / (30.0 * tau),
            0.0)
        d_alpha[d_idx] = jnp.where(decay, d_alpha[d_idx], alphades)


class WallBoundary(Equation):
    """Shepard wall extrapolation incl. gradient blocks
    (reference magma2.py:926)."""

    def __init__(self, dest, sources, dim):
        self.dim = dim
        self.dimsq = dim * dim
        self.dimcu = self.dimsq * dim
        super(WallBoundary, self).__init__(dest, sources)

    def initialize(self, d_idx, d_p, d_rho, d_e, d_m, d_cs, d_h,
                   d_htmp, d_h0, d_u, d_v, d_w, d_wij, d_n, d_dndh,
                   d_divv, d_alpha, d_ddv, d_dv, d_de, d_cm, d_dde,
                   d_rho0):
        dim, dimsq, dimcu = self.dim, self.dimsq, self.dimcu
        d_p[d_idx] = 0.0
        d_u[d_idx] = 0.0
        d_v[d_idx] = 0.0
        d_w[d_idx] = 0.0
        d_rho0[d_idx] = d_rho[d_idx]
        d_m[d_idx] = 0.0
        d_rho[d_idx] = 0.0
        d_e[d_idx] = 0.0
        d_cs[d_idx] = 0.0
        d_divv[d_idx] = 0.0
        d_wij[d_idx] = 0.0
        d_h[d_idx] = d_h0[d_idx]
        d_htmp[d_idx] = 0.0
        d_n[d_idx] = 0.0
        d_dndh[d_idx] = 0.0
        d_alpha[d_idx] = 0.0
        for i in range(dim):
            d_de[dim * d_idx + i] = 0.0
        for i in range(dimsq):
            d_dv[dimsq * d_idx + i] = 0.0
            d_cm[dimsq * d_idx + i] = 0.0
            d_dde[dimsq * d_idx + i] = 0.0
        for i in range(dimcu):
            d_ddv[dimcu * d_idx + i] = 0.0

    def loop(self, d_idx, s_idx, d_p, d_rho, d_e, d_m, d_cs, d_divv,
             d_u, d_v, d_w, d_wij, d_htmp, s_p, s_rho, s_e, s_m, s_cs,
             s_h, s_divv, s_u, s_v, s_w, WI, s_n, d_n, s_dndh, d_dndh,
             d_alpha, s_alpha, d_de, s_de, d_dv, d_cm, d_dde, s_dv,
             s_cm, s_dde, s_ddv, d_ddv):
        dim, dimsq, dimcu = self.dim, self.dimsq, self.dimcu
        d_wij[d_idx] += WI
        d_p[d_idx] += s_p[s_idx] * WI
        d_u[d_idx] -= s_u[s_idx] * WI
        d_v[d_idx] -= s_v[s_idx] * WI
        d_w[d_idx] -= s_w[s_idx] * WI
        d_m[d_idx] += s_m[s_idx] * WI
        d_rho[d_idx] += s_rho[s_idx] * WI
        d_e[d_idx] += s_e[s_idx] * WI
        d_cs[d_idx] += s_cs[s_idx] * WI
        d_divv[d_idx] += s_divv[s_idx] * WI
        d_htmp[d_idx] += s_h[s_idx] * WI
        d_n[d_idx] += s_n[s_idx] * WI
        d_dndh[d_idx] += s_dndh[s_idx] * WI
        d_alpha[d_idx] += s_alpha[s_idx] * WI
        for i in range(dim):
            d_de[dim * d_idx + i] -= s_de[dim * s_idx + i] * WI
        for i in range(dimsq):
            d_dv[dimsq * d_idx + i] -= s_dv[dimsq * s_idx + i] * WI
            d_cm[dimsq * d_idx + i] += s_cm[dimsq * s_idx + i] * WI
            d_dde[dimsq * d_idx + i] += s_dde[dimsq * s_idx + i] * WI
        for i in range(dimcu):
            d_ddv[dimcu * d_idx + i] += s_ddv[dimcu * s_idx + i] * WI

    def post_loop(self, d_idx, d_p, d_rho, d_e, d_m, d_cs, d_divv,
                  d_h, d_u, d_v, d_w, d_wij, d_htmp, d_n, d_dndh,
                  d_de, d_dv, d_cm, d_dde, d_ddv, d_rho0):
        dim, dimsq, dimcu = self.dim, self.dimsq, self.dimcu
        ok = d_wij[d_idx] > 1e-30
        w = jnp.where(ok, d_wij[d_idx], 1.0)
        for view in (d_p, d_u, d_v, d_w, d_m, d_rho, d_e, d_cs,
                     d_divv, d_n, d_dndh):
            view[d_idx] = jnp.where(ok, view[d_idx] / w, view[d_idx])
        d_h[d_idx] = jnp.where(ok, d_htmp[d_idx] / w, d_h[d_idx])
        for i in range(dim):
            k = dim * d_idx + i
            d_de[k] = jnp.where(ok, d_de[k] / w, d_de[k])
        for i in range(dimsq):
            for view in (d_dv, d_cm, d_dde):
                k = dimsq * d_idx + i
                view[k] = jnp.where(ok, view[k] / w, view[k])
        for i in range(dimcu):
            k = dimcu * d_idx + i
            d_ddv[k] = jnp.where(ok, d_ddv[k] / w, d_ddv[k])
        d_rho[d_idx] = jnp.where(jnp.abs(d_rho[d_idx]) < 1e-10,
                                 d_rho0[d_idx], d_rho[d_idx])


class UpdateGhostProps(Equation):
    """Ghost copy (reference magma2.py:1058) — no-op; no mirrored
    ghosts in the grid engine."""

    def __init__(self, dest, dim=2, sources=None):
        super(UpdateGhostProps, self).__init__(dest, sources)
        self.dim = dim

    def initialize(self, d_idx):
        pass


def _reconstruct(self, d_idx, s_idx, XIJ, VIJ, d_h, s_h, d_dv, s_dv,
                 d_ddv, s_ddv, d_de, s_de, d_dde, s_dde, d_e, s_e):
    """Shared second-order reconstruction of vij/eij at the midpoint
    with the Frontiere-style slope limiter (reference
    magma2.py:1131-1240).  Returns (vij, eij, etai, etaj, etaisq,
    etajsq)."""
    dim, dimsq = self.dim, self.dimsq
    hi = self.fkern * d_h[d_idx]
    hj = self.fkern * s_h[s_idx]
    etai = [XIJ[r] / hi for r in range(dim)]
    etaj = [XIJ[r] / hj for r in range(dim)]
    etaisq = sum(e * e for e in etai)
    etajsq = sum(e * e for e in etaj)
    etaij = jnp.sqrt(jnp.minimum(etaisq, etajsq))

    aanum = 0.0
    aaden = 0.0
    mpinc = [0.5 * XIJ[r] for r in range(dim)]
    for row in range(dim):
        for col in range(dim):
            aanum = aanum + d_dv[dimsq * d_idx + row * dim + col] * \
                XIJ[row] * XIJ[col]
            aaden = aaden + s_dv[dimsq * s_idx + row * dim + col] * \
                XIJ[row] * XIJ[col]
    # 0/0 at the self pair: the reference divides unguarded
    den_safe = jnp.where(jnp.abs(aaden) > 1e-30, aaden, 1.0)
    aaij = jnp.where(jnp.abs(aaden) > 1e-30, aanum / den_safe, 1.0)
    phiij = jnp.maximum(0.0, jnp.minimum(
        1.0, 4.0 * aaij / ((1.0 + aaij) * (1.0 + aaij))))
    powin = (etaij - self.eta_crit) / self.eta_fold
    phiij = jnp.where(etaij < self.eta_crit,
                      phiij * jnp.exp(-powin * powin), phiij)

    dedel = 0.0
    ddedel = 0.0
    dvdel = [0.0] * dim
    ddvdeldel = [0.0] * dim
    for row in range(dim):
        dedel = dedel - (d_de[dim * d_idx + row] +
                         s_de[dim * s_idx + row]) * mpinc[row]
        for col in range(dim):
            rc = row * dim + col
            dvdel[row] = dvdel[row] - (
                d_dv[dimsq * d_idx + rc] +
                s_dv[dimsq * s_idx + rc]) * mpinc[col]
            ddedel = ddedel + (
                d_dde[dimsq * d_idx + rc] -
                s_dde[dimsq * s_idx + rc]) * mpinc[row] * mpinc[col]
            for blk in range(dim):
                brc = dimsq * blk + rc
                ddvdeldel[row] = ddvdeldel[row] + (
                    d_ddv[dim * dimsq * d_idx + brc] -
                    s_ddv[dim * dimsq * s_idx + brc]) * \
                    mpinc[col] * mpinc[blk]

    vij = [VIJ[r] + phiij * (dvdel[r] + 0.5 * ddvdeldel[r])
           for r in range(dim)]
    eij = d_e[d_idx] - s_e[s_idx] + phiij * (dedel + 0.5 * ddedel)
    return vij, eij, etai, etaj, etaisq, etajsq


class MomentumAndEnergy(Equation):
    """Base (reference magma2.py:1108)."""

    def __init__(self, dest, sources, dim, fkern, eta_crit=0.3,
                 eta_fold=0.2, beta=2.0, alphac=0.05, eps=0.01):
        self.beta = beta
        self.dim = dim
        self.fkern = fkern
        self.dimsq = dim * dim
        self.eta_crit = eta_crit
        self.eta_fold = eta_fold
        self.alphac = alphac
        self.epssq = eps * eps
        super(MomentumAndEnergy, self).__init__(dest, sources)

    def initialize(self, d_idx, d_au, d_av, d_aw, d_ae):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0
        d_ae[d_idx] = 0.0

    def _av_pq(self, d_idx, s_idx, d_rho, s_rho, d_cs, s_cs, d_alpha,
               s_alpha, d_p, s_p, vij, etai, etaj, etaisq, etajsq):
        dim = self.dim
        vdotei = sum(vij[r] * etai[r] for r in range(dim))
        vdotej = sum(vij[r] * etaj[r] for r in range(dim))
        mui = jnp.minimum(0.0, vdotei / (etaisq + self.epssq))
        muj = jnp.minimum(0.0, vdotej / (etajsq + self.epssq))
        qi = d_rho[d_idx] * mui * (-d_alpha[d_idx] * d_cs[d_idx] +
                                   self.beta * mui)
        qj = s_rho[s_idx] * muj * (-s_alpha[s_idx] * s_cs[s_idx] +
                                   self.beta * muj)
        return d_p[d_idx] + qi, s_p[s_idx] + qj


class MomentumAndEnergyStdGrad(MomentumAndEnergy):
    """Standard kernel-gradient formulation
    (reference magma2.py:1131)."""

    def loop(self, d_idx, s_idx, s_m, d_p, s_p, d_cs, s_cs, d_rho,
             s_rho, d_au, d_av, d_aw, d_ae, XIJ, VIJ, d_alpha,
             s_alpha, d_ddv, s_ddv, RHOIJ1, d_h, s_h, DWI, DWJ, d_dv,
             s_dv, d_de, s_de, d_dde, s_dde, d_e, s_e):
        dim = self.dim
        vij, eij, etai, etaj, etaisq, etajsq = _reconstruct(
            self, d_idx, s_idx, XIJ, VIJ, d_h, s_h, d_dv, s_dv,
            d_ddv, s_ddv, d_de, s_de, d_dde, s_dde, d_e, s_e)
        pi, pj = self._av_pq(d_idx, s_idx, d_rho, s_rho, d_cs, s_cs,
                             d_alpha, s_alpha, d_p, s_p, vij, etai,
                             etaj, etaisq, etajsq)

        sm = sum((DWI[r] + DWJ[r]) ** 2 for r in range(dim))
        normdwij = 0.5 * jnp.sqrt(sm)
        vsigng = jnp.sqrt(jnp.abs(d_p[d_idx] - s_p[s_idx]) * RHOIJ1)

        mjpibyrhoisq = s_m[s_idx] * pi / (d_rho[d_idx] * d_rho[d_idx])
        mjpjbyrhojsq = s_m[s_idx] * pj / (s_rho[s_idx] * s_rho[s_idx])
        d_au[d_idx] -= mjpibyrhoisq * DWI[0] + mjpjbyrhojsq * DWJ[0]
        d_av[d_idx] -= mjpibyrhoisq * DWI[1] + mjpjbyrhojsq * DWJ[1]
        d_aw[d_idx] -= mjpibyrhoisq * DWI[2] + mjpjbyrhojsq * DWJ[2]
        vijdotdwi = sum(VIJ[r] * DWI[r] for r in range(dim))
        d_ae[d_idx] += mjpibyrhoisq * vijdotdwi
        d_ae[d_idx] -= (self.alphac * s_m[s_idx] * vsigng * eij *
                        normdwij * RHOIJ1)


class MomentumAndEnergyMI1(MomentumAndEnergy):
    """Matrix-inversion formulation 1 (reference magma2.py:1244)."""

    def loop(self, d_idx, s_idx, s_m, d_p, s_p, d_cs, s_cs, d_rho,
             s_rho, d_au, d_av, d_aw, d_ae, XIJ, VIJ, d_alpha,
             s_alpha, d_ddv, s_ddv, RHOIJ1, d_h, s_h, d_cm, s_cm, WI,
             WJ, d_dv, s_dv, d_de, s_de, d_dde, s_dde, d_e, s_e):
        dim, dimsq = self.dim, self.dimsq
        vij, eij, etai, etaj, etaisq, etajsq = _reconstruct(
            self, d_idx, s_idx, XIJ, VIJ, d_h, s_h, d_dv, s_dv,
            d_ddv, s_ddv, d_de, s_de, d_dde, s_dde, d_e, s_e)
        pi, pj = self._av_pq(d_idx, s_idx, d_rho, s_rho, d_cs, s_cs,
                             d_alpha, s_alpha, d_p, s_p, vij, etai,
                             etaj, etaisq, etajsq)

        gmi = [0.0, 0.0, 0.0]
        gmj = [0.0, 0.0, 0.0]
        sm = 0.0
        for row in range(dim):
            for col in range(dim):
                rc = row * dim + col
                gmi[row] = gmi[row] - d_cm[dimsq * d_idx + rc] * \
                    XIJ[col] * WI
                gmj[row] = gmj[row] - s_cm[dimsq * s_idx + rc] * \
                    XIJ[col] * WJ
            gmij = 0.5 * (gmi[row] + gmj[row])
            sm = sm + gmij * gmij
        normgmij = 0.5 * jnp.sqrt(sm)
        vsigng = jnp.sqrt(jnp.abs(d_p[d_idx] - s_p[s_idx]) * RHOIJ1)

        mjpibyrhoisq = s_m[s_idx] * pi / (d_rho[d_idx] * d_rho[d_idx])
        mjpjbyrhojsq = s_m[s_idx] * pj / (s_rho[s_idx] * s_rho[s_idx])
        d_au[d_idx] -= mjpibyrhoisq * gmi[0] + mjpjbyrhojsq * gmj[0]
        d_av[d_idx] -= mjpibyrhoisq * gmi[1] + mjpjbyrhojsq * gmj[1]
        d_aw[d_idx] -= mjpibyrhoisq * gmi[2] + mjpjbyrhojsq * gmj[2]
        vijdotgmi = sum(VIJ[r] * gmi[r] for r in range(dim))
        d_ae[d_idx] += mjpibyrhoisq * vijdotgmi
        d_ae[d_idx] -= (self.alphac * s_m[s_idx] * vsigng * eij *
                        normgmij * RHOIJ1)


class MomentumAndEnergyMI2(MomentumAndEnergy):
    """Matrix-inversion formulation 2 (reference magma2.py:1367)."""

    def loop(self, d_idx, s_idx, s_m, d_p, s_p, d_cs, s_cs, d_rho,
             s_rho, d_au, d_av, d_aw, d_ae, XIJ, VIJ, d_alpha,
             s_alpha, d_ddv, s_ddv, RHOIJ1, d_h, s_h, d_cm, s_cm, WI,
             WJ, d_dv, s_dv, d_de, s_de, d_dde, s_dde, d_e, s_e):
        dim, dimsq = self.dim, self.dimsq
        vij, eij, etai, etaj, etaisq, etajsq = _reconstruct(
            self, d_idx, s_idx, XIJ, VIJ, d_h, s_h, d_dv, s_dv,
            d_ddv, s_ddv, d_de, s_de, d_dde, s_dde, d_e, s_e)
        pi, pj = self._av_pq(d_idx, s_idx, d_rho, s_rho, d_cs, s_cs,
                             d_alpha, s_alpha, d_p, s_p, vij, etai,
                             etaj, etaisq, etajsq)

        gmij = [0.0, 0.0, 0.0]
        sm = 0.0
        for row in range(dim):
            gmi = 0.0
            gmj = 0.0
            for col in range(dim):
                rc = row * dim + col
                gmi = gmi - d_cm[dimsq * d_idx + rc] * XIJ[col] * WI
                gmj = gmj - s_cm[dimsq * s_idx + rc] * XIJ[col] * WJ
            gmij[row] = 0.5 * (gmi + gmj)
            sm = sm + gmij[row] * gmij[row]
        normgmij = jnp.sqrt(sm)
        vsigng = jnp.sqrt(jnp.abs(d_p[d_idx] - s_p[s_idx]) * RHOIJ1)

        invrhosq = 1.0 / (d_rho[d_idx] * s_rho[s_idx])
        comn = s_m[s_idx] * (pi + pj) * invrhosq
        d_au[d_idx] -= comn * gmij[0]
        d_av[d_idx] -= comn * gmij[1]
        d_aw[d_idx] -= comn * gmij[2]
        vijdotgmij = sum(VIJ[r] * gmij[r] for r in range(dim))
        d_ae[d_idx] -= (self.alphac * s_m[s_idx] * vsigng * eij *
                        normgmij * RHOIJ1)
        d_ae[d_idx] += s_m[s_idx] * pi * invrhosq * vijdotgmij


class EvaluateTildeMu(Equation):
    """Max viscous mu for the adaptive dt (reference
    magma2.py:1489)."""

    def __init__(self, dest, sources, dim):
        self.dim = dim
        super(EvaluateTildeMu, self).__init__(dest, sources)

    def initialize(self, d_idx, d_tilmu):
        d_tilmu[d_idx] = -1e30

    def loop(self, d_tilmu, d_idx, d_h, VIJ, XIJ, R2IJ):
        dots = sum(VIJ[r] * XIJ[r] for r in range(self.dim))
        cand = d_h[d_idx] * dots / (R2IJ + 0.01)
        d_tilmu[d_idx] = MAX(cand, d_tilmu[d_idx])


class SettleByArtificialPressure(Equation):
    """Particle settling against a desired density
    (reference magma2.py:1510)."""

    def __init__(self, dest, sources, xi=0.5, fkern=1.0):
        self.fkern = fkern
        self.xi = xi
        super(SettleByArtificialPressure, self).__init__(dest,
                                                         sources)

    def initialize(self, d_deltax, d_deltay, d_deltaz, d_idx, d_n,
                   d_pouerr):
        d_deltax[d_idx] = 0.0
        d_deltay[d_idx] = 0.0
        d_deltaz[d_idx] = 0.0
        d_n[d_idx] = 0.0
        d_pouerr[d_idx] = 0.0

    def loop(self, d_rho, d_idx, d_rhodes, s_rho, s_rhodes, s_idx,
             d_deltax, d_deltay, d_deltaz, DWI, d_n, WI, s_m,
             d_pouerr):
        cpia = jnp.maximum(
            1 + (d_rho[d_idx] - d_rhodes[d_idx]) / d_rhodes[d_idx],
            0.1)
        cpib = jnp.maximum(
            1 + (s_rho[s_idx] - s_rhodes[s_idx]) / s_rhodes[s_idx],
            0.1)
        common = (cpia + cpib) / s_rho[s_idx]
        d_deltax[d_idx] += common * DWI[0]
        d_deltay[d_idx] += common * DWI[1]
        d_deltaz[d_idx] += common * DWI[2]
        d_n[d_idx] += WI
        d_pouerr[d_idx] += s_m[d_idx] * WI / s_rho[s_idx]

    def post_loop(self, d_deltax, d_deltay, d_deltaz, d_idx, d_h, d_m,
                  d_pouerr, d_rhodes, d_n, d_x, d_y, d_z):
        hi = self.fkern * d_h[d_idx]
        common = -self.xi * hi * hi * d_m[d_idx]
        d_deltax[d_idx] *= common
        d_deltay[d_idx] *= common
        d_deltaz[d_idx] *= common
        d_x[d_idx] += d_deltax[d_idx]
        d_y[d_idx] += d_deltay[d_idx]
        d_z[d_idx] += d_deltaz[d_idx]
        d_pouerr[d_idx] = 1 - d_pouerr[d_idx]
        d_m[d_idx] = d_rhodes[d_idx] / d_n[d_idx]


class TVDRK2Step(IntegratorStep):
    """(reference magma2.py:1563)"""

    def initialize(self, d_idx, d_u0, d_v0, d_w0, d_u, d_v, d_w,
                   d_converged, d_au0, d_av0, d_aw0, d_ae0, d_ah0,
                   d_arho0, d_an0, d_aalpha0, d_au, d_av, d_aw, d_ae,
                   d_ah, d_arho, d_an, d_aalpha):
        d_u0[d_idx] = d_u[d_idx]
        d_v0[d_idx] = d_v[d_idx]
        d_w0[d_idx] = d_w[d_idx]
        d_au0[d_idx] = d_au[d_idx]
        d_av0[d_idx] = d_av[d_idx]
        d_aw0[d_idx] = d_aw[d_idx]
        d_ae0[d_idx] = d_ae[d_idx]
        d_ah0[d_idx] = d_ah[d_idx]
        d_arho0[d_idx] = d_arho[d_idx]
        d_an0[d_idx] = d_an[d_idx]
        d_aalpha0[d_idx] = d_aalpha[d_idx]
        d_converged[d_idx] = 0.0

    def stage1(self, d_idx, d_x, d_y, d_z, d_u, d_v, d_w, d_e, d_au,
               d_av, d_aw, d_ae, d_rho, d_arho, d_h, d_ah, dt, d_n,
               d_an, d_alpha, d_aalpha, d_h0, d_converged):
        d_x[d_idx] += dt * d_u[d_idx]
        d_y[d_idx] += dt * d_v[d_idx]
        d_z[d_idx] += dt * d_w[d_idx]
        d_u[d_idx] += dt * d_au[d_idx]
        d_v[d_idx] += dt * d_av[d_idx]
        d_w[d_idx] += dt * d_aw[d_idx]
        d_e[d_idx] += dt * d_ae[d_idx]
        d_h0[d_idx] = d_h[d_idx]
        d_h[d_idx] += dt * d_ah[d_idx]
        d_rho[d_idx] += dt * d_arho[d_idx]
        d_n[d_idx] += dt * d_an[d_idx]
        d_alpha[d_idx] += dt * d_aalpha[d_idx]
        d_converged[d_idx] = 0.0

    def stage2(self, d_idx, d_x, d_y, d_z, d_u0, d_v0, d_w0, d_u, d_v,
               d_w, d_e, d_au, d_av, d_aw, d_ae, dt, d_alpha,
               d_aalpha, d_h, d_tilmu, d_cs, d_dt_adapt, d_au0,
               d_av0, d_aw0, d_aalpha0, d_ae0, d_h0, d_ah0, d_ah,
               d_arho, d_arho0, d_an, d_an0, d_rho, d_n):
        dtb2 = 0.5 * dt
        d_x[d_idx] += dtb2 * (d_u[d_idx] - d_u0[d_idx])
        d_y[d_idx] += dtb2 * (d_v[d_idx] - d_v0[d_idx])
        d_z[d_idx] += dtb2 * (d_w[d_idx] - d_w0[d_idx])
        d_u[d_idx] += dtb2 * (d_au[d_idx] - d_au0[d_idx])
        d_v[d_idx] += dtb2 * (d_av[d_idx] - d_av0[d_idx])
        d_w[d_idx] += dtb2 * (d_aw[d_idx] - d_aw0[d_idx])
        d_e[d_idx] += dtb2 * (d_ae[d_idx] - d_ae0[d_idx])
        d_alpha[d_idx] += dtb2 * (d_aalpha[d_idx] - d_aalpha0[d_idx])
        d_h0[d_idx] = d_h[d_idx]
        d_h[d_idx] += dtb2 * (d_ah[d_idx] - d_ah0[d_idx])
        d_rho[d_idx] += dtb2 * (d_arho[d_idx] - d_arho0[d_idx])
        d_n[d_idx] += dtb2 * (d_an[d_idx] - d_an0[d_idx])
        d_alpha[d_idx] += dtb2 * (d_aalpha[d_idx] - d_aalpha0[d_idx])

        fmag = jnp.sqrt(d_au[d_idx] ** 2 + d_av[d_idx] ** 2 +
                        d_aw[d_idx] ** 2)
        fmag = jnp.maximum(fmag, 1e-30)
        dt_force = jnp.sqrt(d_h[d_idx] / fmag)
        dt_courant_visc = d_h[d_idx] / (
            d_cs[d_idx] + 0.6 * d_alpha[d_idx] *
            (d_cs[d_idx] + 2.0 * d_tilmu[d_idx]))
        d_dt_adapt[d_idx] = 0.2 * jnp.minimum(dt_force,
                                              dt_courant_visc)


class TVDRK2Integrator(Integrator):
    """(reference magma2.py:1650)"""

    def one_timestep(self, t, dt):
        self.initialize()
        self.compute_accelerations()
        self.stage1()
        self.update_domain()
        self.do_post_stage(0.5 * dt, 1)
        self.compute_accelerations()
        self.stage2()
        self.update_domain()
        self.do_post_stage(dt, 2)


class TVDRK2IntegratorWithRecycling(Integrator):
    """Reuse the correction-step accelerations for the next predictor
    (reference magma2.py:1694)."""

    def one_timestep(self, t, dt):
        self.initialize()
        self.stage1()
        self.update_domain()
        self.do_post_stage(0.5 * dt, 1)
        self.compute_accelerations()
        self.stage2()
        self.update_domain()
        self.do_post_stage(dt, 2)


class MAGMA2Scheme(Scheme):
    """(reference magma2.py:37)"""

    def __init__(self, fluids, solids, dim, gamma, hfact=None,
                 fkern=1.0, adaptive_h_scheme='magma2',
                 max_density_iterations=250,
                 density_iteration_tolerance=1e-3, alphamax=1.0,
                 alphamin=0.1, alphac=0.05, beta=2.0, eps=0.01,
                 eta_crit=0.3, eta_fold=0.2, ndes=None,
                 reconstruction_order=2, formulation='mi1',
                 recycle_accelerations=True, has_ghosts=False,
                 l0=np.log(1e-4), l1=np.log(5e-2)):
        self.h_scheme_choices = {'magma2', 'mpm'}
        self.formulation_choices = {'mi1', 'mi2', 'stdgrad'}
        self.reconstruction_order_choices = {0, 1, 2}
        self.fluids = fluids
        self.solids = solids
        self.dim = dim
        self.solver = None
        self.gamma = gamma
        self.beta = beta
        self.density_iteration_tolerance = density_iteration_tolerance
        self.max_density_iterations = max_density_iterations
        self.has_ghosts = has_ghosts
        self.fkern = fkern
        self.alphamax = alphamax
        self.alphamin = alphamin
        self.alphac = alphac
        self.eta_crit = eta_crit
        self.eta_fold = eta_fold
        self.eps = eps
        self.recycle_accelerations = recycle_accelerations
        self.ndes = ndes
        self.adaptive_h_scheme = adaptive_h_scheme
        self.formulation = formulation
        self.reconstruction_order = reconstruction_order
        self.hfact = hfact
        self.l0 = l0
        self.l1 = l1

    def add_user_options(self, group):
        group.add_argument('--adaptive-h', action='store',
                           dest='adaptive_h_scheme', default=None,
                           choices=list(self.h_scheme_choices),
                           help='Adaptive smoothing length scheme.')
        group.add_argument('--h-fact', action='store', type=float,
                           dest='hfact', default=None,
                           help='h_fact for h adaptivity.')
        group.add_argument('--formulation', action='store',
                           dest='formulation', default=None,
                           choices=list(self.formulation_choices),
                           help='Momentum/energy formulation.')
        group.add_argument('--reconstruction-order', action='store',
                           dest='reconstruction_order', type=int,
                           default=None, choices=[0, 1, 2],
                           help='Reconstruction order for v and e.')
        group.add_argument('--alpha-max', action='store', type=float,
                           dest='alphamax', default=None,
                           help='alpha_max for the AV switch.')
        group.add_argument('--alpha-min', action='store', type=float,
                           dest='alphamin', default=None,
                           help='alpha_0 for the AV switch.')
        group.add_argument('--l0', action='store', type=float,
                           dest='l0', default=None,
                           help='Low entropy trigger threshold.')
        group.add_argument('--l1', action='store', type=float,
                           dest='l1', default=None,
                           help='High entropy trigger threshold.')
        group.add_argument('--beta', action='store', type=float,
                           dest='beta', default=None,
                           help='beta for the artificial viscosity.')
        group.add_argument('--gamma', action='store', type=float,
                           dest='gamma', default=None,
                           help='gamma for the state equation.')
        group.add_argument('--n-des', action='store', type=float,
                           dest='ndes', default=None,
                           help='Desired number of neighbors.')
        add_bool_argument(
            group, 'recycle-accelerations',
            dest='recycle_accelerations', default=None,
            help='Reuse correction accelerations in the predictor.')

    def consume_user_options(self, options):
        data = dict((var, self._smart_getattr(options, var)) for var in
                    ('gamma', 'alphamax', 'beta', 'adaptive_h_scheme',
                     'ndes', 'recycle_accelerations', 'formulation',
                     'hfact', 'reconstruction_order', 'alphamin',
                     'l0', 'l1'))
        self.configure(**data)

    def configure_solver(self, kernel=None, integrator_cls=None,
                         extra_steppers=None, **kw):
        from pysph_tpu.base.kernels import (WendlandQuinticC6,
                                            WendlandQuinticC6_1D)
        from pysph_tpu.solver.solver import Solver
        if kernel is None:
            kernel = (WendlandQuinticC6_1D(dim=1) if self.dim == 1
                      else WendlandQuinticC6(dim=self.dim))
        self.fkern = getattr(kernel, 'fkern', 1.0)
        steppers = {}
        if extra_steppers is not None:
            steppers.update(extra_steppers)
        if integrator_cls is not None:
            int_cls = integrator_cls
        elif self.recycle_accelerations:
            int_cls = TVDRK2IntegratorWithRecycling
        else:
            int_cls = TVDRK2Integrator
        for name in self.fluids:
            if name not in steppers:
                steppers[name] = TVDRK2Step()
        integrator = int_cls(**steppers)
        self.solver = Solver(dim=self.dim, integrator=integrator,
                             kernel=kernel, **kw)

    def get_equations(self):
        from pysph_tpu.sph.basic_equations import SummationDensity
        from pysph_tpu.sph.equation import Group

        all_pa = self.fluids + self.solids
        if self.reconstruction_order not in \
                self.reconstruction_order_choices:
            raise ValueError('reconstruction_order must be one of '
                             '%r.' % self.reconstruction_order_choices)
        equations = []
        if self.adaptive_h_scheme == 'magma2':
            if self.ndes is None:
                raise ValueError('ndes should be specified for the '
                                 'MAGMA2 h-adaptivity.')
            equations.append(Group(equations=[
                IncreaseSmoothingLength(dest=f, sources=None)
                for f in self.fluids]))
            equations.append(Group(equations=[
                UpdateSmoothingLength(dest=f, sources=all_pa,
                                      ndes=self.ndes)
                for f in self.fluids], update_nnps=True))
            g2 = []
            for f in self.fluids:
                g2.append(SummationDensity(dest=f, sources=all_pa))
                g2.append(IdealGasEOS(dest=f, sources=None,
                                      gamma=self.gamma))
                if self.reconstruction_order > 1:
                    g2.append(AuxiliaryGradient(dest=f,
                                                sources=all_pa,
                                                dim=self.dim))
            equations.append(Group(equations=g2))
        elif self.adaptive_h_scheme == 'mpm':
            if self.hfact is None:
                raise ValueError('hfact should be specified for the '
                                 'MPM h-adaptivity.')
            equations.append(Group(equations=[
                SummationDensityMPMStyle(
                    dest=f, sources=all_pa, hfact=self.hfact,
                    density_iterations=True, dim=self.dim,
                    htol=self.density_iteration_tolerance)
                for f in self.fluids], update_nnps=True, iterate=True,
                max_iterations=self.max_density_iterations))
            g2 = []
            for f in self.fluids:
                g2.append(IdealGasEOS(dest=f, sources=None,
                                      gamma=self.gamma))
                if self.reconstruction_order > 1:
                    g2.append(AuxiliaryGradient(dest=f,
                                                sources=all_pa,
                                                dim=self.dim))
            equations.append(Group(equations=g2))
        else:
            raise ValueError('adaptive_h_scheme must be one of %r.' %
                             self.h_scheme_choices)

        equations.append(Group(equations=[
            CorrectionMatrix(dest=f, sources=all_pa, dim=self.dim)
            for f in self.fluids]))

        g3p2 = []
        for f in self.fluids:
            if self.reconstruction_order > 0:
                g3p2.append(FirstGradient(dest=f, sources=all_pa,
                                          dim=self.dim))
            if self.reconstruction_order > 1:
                g3p2.append(SecondGradient(dest=f, sources=all_pa,
                                           dim=self.dim))
            g3p2.append(EntropyBasedDissipationTrigger(
                dest=f, sources=None, alphamax=self.alphamax,
                alphamin=self.alphamin, fkern=self.fkern, l0=self.l0,
                l1=self.l1, gamma=self.gamma))
        equations.append(Group(equations=g3p2))

        if self.solids:
            equations.append(Group(equations=[
                WallBoundary(s, sources=self.fluids, dim=self.dim)
                for s in self.solids]))
        if self.has_ghosts:
            equations.append(Group(equations=[
                UpdateGhostProps(dest=f, sources=None, dim=self.dim)
                for f in self.fluids], real=False))

        me_cls = {'mi1': MomentumAndEnergyMI1,
                  'mi2': MomentumAndEnergyMI2,
                  'stdgrad': MomentumAndEnergyStdGrad}[
            self.formulation]
        g5 = []
        for f in self.fluids:
            g5.append(me_cls(dest=f, sources=all_pa, dim=self.dim,
                             beta=self.beta, fkern=self.fkern,
                             eta_crit=self.eta_crit,
                             eta_fold=self.eta_fold,
                             alphac=self.alphac, eps=self.eps))
            g5.append(EvaluateTildeMu(dest=f, sources=all_pa,
                                      dim=self.dim))
        equations.append(Group(equations=g5))
        return equations

    def setup_properties(self, particles, clean=True):
        import numpy
        dim, dimsq = self.dim, self.dim * self.dim
        particle_arrays = dict((p.name, p) for p in particles)
        props = ['rho', 'm', 'x', 'y', 'z', 'u', 'v', 'w', 'h', 'cs',
                 'p', 'e', 'au', 'av', 'aw', 'ae', 'pid', 'gid',
                 'tag', 'dwdh', 'converged', 'ah', 'arho', 'dt_cfl',
                 'u0', 'v0', 'w0', 'n', 'dndh', 'prevn', 'prevdndh',
                 'divv', 'an', 'h0', 'aalpha', 'tilmu', 'dt_adapt',
                 'aalpha0', 'ae0', 'ah0', 'an0', 'arho0', 'au0',
                 'av0', 'aw0']
        output_props = 'm rho p u v w x y z e n divv h alpha'.split()
        for fluid in self.fluids:
            pa = particle_arrays[fluid]
            self._ensure_properties(pa, props, clean)
            if self.adaptive_h_scheme == 'magma2':
                pa.h = 2.0 * numpy.asarray(pa.h)
            pa.add_property('orig_idx', type='int')
            pa.add_property('n', data=numpy.asarray(pa.rho) /
                            numpy.asarray(pa.m))
            pa.add_property('s', data=numpy.asarray(pa.p) /
                            numpy.asarray(pa.rho) ** self.gamma)
            pa.add_property('alpha', data=self.alphamin)
            pa.add_property('dv', stride=dimsq)
            pa.add_property('dvaux', stride=dimsq)
            pa.add_property('invdm', stride=dimsq)
            pa.add_property('cm', stride=dimsq)
            pa.add_property('ddv', stride=dimsq * dim)
            pa.add_property('de', stride=dim)
            pa.add_property('dde', stride=dimsq)
            pa.add_property('deaux', stride=dim)
            pa.orig_idx = numpy.arange(pa.get_number_of_particles())
            pa.set_output_arrays(output_props)
        solid_props = set(props) | set('wij htmp alpha rho0'.split())
        for solid in self.solids:
            pa = particle_arrays[solid]
            self._ensure_properties(pa, solid_props, clean)
            pa.set_output_arrays(output_props)
            for prop, st in (('cm', dimsq), ('ddv', dimsq * dim),
                             ('de', dim), ('dde', dimsq),
                             ('dv', dimsq), ('dvaux', dimsq),
                             ('deaux', dim)):
                pa.add_property(prop, stride=st)
