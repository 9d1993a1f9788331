"""Conservative Reproducing Kernel SPH (parity with
/root/reference/pysph/sph/wc/crksph.py, [CRKSPH2017]).

The reference's per-particle ``loop_all`` (neighbor scan + small
Gauss-Jordan solves) splits into our two phases: a pair-phase moment
accumulation into strided temporaries and a per-particle ``post_loop``
that solves the (dim x dim) systems for every particle at once with
batched linear algebra (XLA maps the batched solve onto the MXU).

Div-by-zero hazards the reference leaves to IEEE semantics (the
self-pair makes ``tmprj == 0`` in the momentum/energy limiter) are
explicitly guarded here with ``jnp.where``.
"""

import jax.numpy as jnp

from pysph_tpu.sph.equation import Equation


def _stack_vec(view, stride, d_idx, n):
    """(N, n) from a strided per-particle property view."""
    cols = [view[stride * d_idx + i] for i in range(n)]
    cols = [c[..., 0] if c.ndim == 2 else c for c in cols]
    return jnp.stack(cols, axis=-1)


def _stack_mat(view, stride, d_idx, n):
    """(N, n, n) from a strided per-particle property view."""
    rows = []
    for i in range(n):
        cols = [view[stride * d_idx + n * i + j] for j in range(n)]
        cols = [c[..., 0] if c.ndim == 2 else c for c in cols]
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


class CRKSPHPreStep(Equation):
    """Accumulate the CRK moments and solve for A_i, B_i and their
    gradients (reference crksph.py:31)."""

    def __init__(self, dest, sources, dim=2):
        self.dim = dim
        super(CRKSPHPreStep, self).__init__(dest, sources)

    def initialize(self, d_idx, d_crk_m0, d_crk_m1, d_crk_m2, d_crk_gm0,
                   d_crk_gm1, d_crk_gm2, d_crk_nnbr):
        d_crk_m0[d_idx] = 0.0
        d_crk_nnbr[d_idx] = 0.0
        for i in range(3):
            d_crk_m1[3 * d_idx + i] = 0.0
            d_crk_gm0[3 * d_idx + i] = 0.0
        for i in range(9):
            d_crk_m2[9 * d_idx + i] = 0.0
            d_crk_gm1[9 * d_idx + i] = 0.0
        for i in range(27):
            d_crk_gm2[27 * d_idx + i] = 0.0

    def loop(self, d_idx, s_idx, s_V, d_crk_m0, d_crk_m1, d_crk_m2,
             d_crk_gm0, d_crk_gm1, d_crk_gm2, d_crk_nnbr, XIJ, WIJ,
             DWIJ):
        d = self.dim
        V = 1.0 / s_V[s_idx]
        # pair-shaped increment: one count per neighbor (see
        # ComputeAveragePressure in wc/edac.py)
        d_crk_nnbr[d_idx] += 1.0 + 0.0 * WIJ
        d_crk_m0[d_idx] += V * WIJ
        for alp in range(d):
            d_crk_m1[3 * d_idx + alp] += V * WIJ * XIJ[alp]
            for bet in range(d):
                d_crk_m2[9 * d_idx + d * alp + bet] += \
                    V * WIJ * XIJ[alp] * XIJ[bet]
        for gam in range(d):
            d_crk_gm0[3 * d_idx + gam] += V * DWIJ[gam]
            for alp in range(d):
                fac = 1.0 if alp == gam else 0.0
                d_crk_gm1[9 * d_idx + d * gam + alp] += \
                    V * (XIJ[alp] * DWIJ[gam] + fac * WIJ)
                for bet in range(d):
                    fac2 = 1.0 if bet == gam else 0.0
                    tmp = XIJ[alp] * fac2 + XIJ[bet] * fac
                    d_crk_gm2[27 * d_idx + d * d * gam + d * alp +
                              bet] += \
                        V * (XIJ[alp] * XIJ[bet] * DWIJ[gam] +
                             tmp * WIJ)

    def post_loop(self, d_idx, d_crk_m0, d_crk_m1, d_crk_m2, d_crk_gm0,
                  d_crk_gm1, d_crk_gm2, d_crk_nnbr, d_ai, d_gradai,
                  d_bi, d_gradbi):
        d = self.dim
        m0 = d_crk_m0[d_idx]
        m1 = _stack_vec(d_crk_m1, 3, d_idx, d)
        m2 = _stack_mat(d_crk_m2, 9, d_idx, d)
        gm0 = _stack_vec(d_crk_gm0, 3, d_idx, d)
        # gm1[n, gam, alp], gm2[n, gam, alp, bet]
        gm1 = _stack_mat(d_crk_gm1, 9, d_idx, d)
        g2rows = []
        for gam in range(d):
            rows = []
            for alp in range(d):
                cols = [d_crk_gm2[27 * d_idx + d * d * gam + d * alp +
                                  bet] for bet in range(d)]
                cols = [c[..., 0] if c.ndim == 2 else c for c in cols]
                rows.append(jnp.stack(cols, axis=-1))
            g2rows.append(jnp.stack(rows, axis=-2))
        gm2 = jnp.stack(g2rows, axis=-3)

        det = jnp.linalg.det(m2)
        singular = jnp.abs(det) < 1e-14
        eye = jnp.broadcast_to(jnp.eye(d), m2.shape)
        m2inv = jnp.linalg.inv(jnp.where(singular[:, None, None],
                                         eye, m2))
        # c = m2inv @ m1
        c = jnp.einsum('nab,nb->na', m2inv, m1)
        ai = 1.0 / (m0 - jnp.einsum('na,na->n', c, m1))
        bi = -c
        # grad ai (reference crksph.py:124-141)
        t1 = (gm0 -
              jnp.einsum('nab,nb,nga->ng', m2inv, m1, gm1) -
              jnp.einsum('nab,na,ngb->ng', m2inv, m1, gm1) +
              jnp.einsum('ngfs,nf,ns->ng', gm2, c, c))
        gradai = -ai[:, None] * ai[:, None] * t1
        gradbi = (-jnp.einsum('nab,ngb->nga', m2inv, gm1) +
                  jnp.einsum('naf,ngfs,ns->nga', m2inv, gm2, c))

        bad = singular | (d_crk_nnbr[d_idx] < 2)
        d_ai[d_idx] = jnp.where(bad, 1.0, ai)
        for i in range(d):
            d_gradai[3 * d_idx + i] = jnp.where(bad, 0.0,
                                                gradai[:, i])
            d_bi[3 * d_idx + i] = jnp.where(bad, 0.0, bi[:, i])
            for j in range(d):
                d_gradbi[9 * d_idx + 3 * i + j] = jnp.where(
                    bad, 0.0, gradbi[:, i, j])


class CRKSPH(Equation):
    """Apply the CRK correction to DWIJ (reference crksph.py:170)."""

    def __init__(self, dest, sources, dim=2, tol=0.5):
        self.dim = dim
        self.tol = tol
        super(CRKSPH, self).__init__(dest, sources)

    def loop(self, d_idx, s_idx, d_ai, d_gradai, d_cwij, d_bi,
             d_gradbi, WIJ, DWIJ, XIJ, HIJ):
        d = self.dim
        ai = d_ai[d_idx]
        eps = 1.0e-4 * HIJ
        bxij = 0.0
        for alp in range(d):
            bxij = bxij + d_bi[3 * d_idx + alp] * XIJ[alp]
        dbxij = []
        for gam in range(d):
            temp = 0.0
            for alp in range(d):
                temp = temp + \
                    d_gradbi[9 * d_idx + 3 * gam + alp] * XIJ[alp]
            dbxij.append(temp)

        # the reference writes the per-pair value A_i(1+B_i.x_ij) into
        # cwij as a channel read by the NEXT equation within the same
        # pair iteration; equations here run whole-block, so consumers
        # (SummationDensityCRKSPH) recompute the pair factor locally
        # and the stored prop keeps the self-pair value A_i.
        d_cwij[d_idx] = ai

        res = []
        for gam in range(d):
            r = (ai * DWIJ[gam] +
                 d_gradai[3 * d_idx + gam] * WIJ) * (1 + bxij)
            r = r + ai * (dbxij[gam] + d_bi[3 * d_idx + gam]) * WIJ
            res.append(r)

        res_mag = sum(jnp.abs(res[i]) for i in range(d))
        dwij_mag = sum(jnp.abs(DWIJ[i]) for i in range(d))
        change = jnp.abs(res_mag - dwij_mag) / (dwij_mag + eps)
        ok = change < self.tol
        for i in range(d):
            DWIJ[i] = jnp.where(ok, res[i], DWIJ[i])


class CRKSPHSymmetric(Equation):
    """Symmetrized CRK-corrected kernel/gradient; overwrites DWIJ, DWI
    and DWJ for the later equations of the group (reference
    crksph.py:280)."""

    def __init__(self, dest, sources, dim=2, tol=0.5):
        self.dim = dim
        self.tol = tol
        super(CRKSPHSymmetric, self).__init__(dest, sources)

    def loop(self, d_idx, s_idx, d_ai, d_gradai, d_cwij, d_bi,
             d_gradbi, s_ai, s_gradai, s_bi, s_gradbi, WIJ, DWIJ, XIJ,
             HIJ, WI, WJ, DWI, DWJ):
        d = self.dim
        ai = d_ai[d_idx]
        aj = s_ai[s_idx]
        wij = WI
        wji = WJ
        bxij = 0.0
        bxji = 0.0
        for alp in range(d):
            bxij = bxij + d_bi[3 * d_idx + alp] * XIJ[alp]
            bxji = bxji - s_bi[3 * s_idx + alp] * XIJ[alp]
        dbxij = []
        dbxji = []
        for gam in range(d):
            temp = 0.0
            temp1 = 0.0
            for alp in range(d):
                temp = temp + \
                    d_gradbi[9 * d_idx + 3 * gam + alp] * XIJ[alp]
                temp1 = temp1 - \
                    s_gradbi[9 * s_idx + 3 * gam + alp] * XIJ[alp]
            dbxij.append(temp)
            dbxji.append(temp1)

        d_cwij[d_idx] = ai   # see CRKSPH.loop on the cwij channel

        for gam in range(d):
            temp = (ai * DWI[gam] +
                    d_gradai[3 * d_idx + gam] * wij) * (1 + bxij)
            temp = temp + ai * (dbxij[gam] +
                                d_bi[3 * d_idx + gam]) * wij
            # the reference's dwji = SPH_KERNEL.gradient(XIJ, ., hj)
            # is the gradient wrt x_i evaluated at hj — exactly DWJ
            temp1 = (-aj * DWJ[gam] +
                     s_gradai[3 * s_idx + gam] * wji) * (1 + bxji)
            temp1 = temp1 + aj * (dbxji[gam] +
                                  s_bi[3 * s_idx + gam]) * wji
            DWIJ[gam] = 0.5 * (temp - temp1)
            DWI[gam] = temp
            DWJ[gam] = temp1


class NumberDensity(Equation):
    """V_i^{-1} = sum_j W_i (reference crksph.py:391)."""

    def initialize(self, d_idx, d_V):
        d_V[d_idx] = 0.0

    def loop(self, d_idx, d_V, WI):
        d_V[d_idx] += WI


class SummationDensityCRKSPH(Equation):
    """CRK summation density, eq. (76) (reference crksph.py:409)."""

    def initialize(self, d_idx, d_rho, d_rhofac):
        d_rho[d_idx] = 0.0
        d_rhofac[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_m, d_rho, d_rhofac, s_V, WIJ,
             d_ai, d_bi, XIJ):
        # per-pair corrected kernel factor A_i(1 + B_i . x_ij): the
        # reference reads this from the cwij channel written by
        # CRKSPH(Symmetric) in the same pair iteration.
        d = 3
        bxij = 0.0
        for alp in range(d):
            bxij = bxij + d_bi[3 * d_idx + alp] * XIJ[alp]
        cwij = d_ai[d_idx] * (1 + bxij)
        Vj = 1.0 / s_V[s_idx]
        fac = Vj * cwij * WIJ
        d_rho[d_idx] += d_m[d_idx] * fac
        d_rhofac[d_idx] += Vj * fac

    def post_loop(self, d_idx, d_rho, d_rhofac):
        denom = jnp.where(d_rhofac[d_idx] != 0.0, d_rhofac[d_idx], 1.0)
        d_rho[d_idx] = jnp.where(d_rhofac[d_idx] != 0.0,
                                 d_rho[d_idx] / denom, d_rho[d_idx])


class VelocityGradient(Equation):
    """CRK velocity gradient, eq. (74) (reference crksph.py:444)."""

    def __init__(self, dest, sources, dim):
        self.dim = dim
        super(VelocityGradient, self).__init__(dest, sources)

    def initialize(self, d_idx, d_gradv):
        for i in range(9):
            d_gradv[9 * d_idx + i] = 0.0

    def loop(self, d_idx, s_idx, s_V, d_gradv, XIJ, DWIJ, VIJ, DWI):
        d = self.dim
        Vj = 1.0 / s_V[s_idx]
        for alp in range(d):
            for bet in range(d):
                d_gradv[9 * d_idx + d * alp + bet] += \
                    -Vj * VIJ[alp] * DWI[bet]


def _limiter(dim, d_gradv, s_gradv, d_idx, s_idx, XIJ, d_h, s_h,
             eta_crit, eta_fold, EPS, VIJU):
    """Common CRKSPH artificial-viscosity limiter used by the momentum
    and energy equations (reference crksph.py:558/685).  Returns
    (mui, muj).  The reference divides ``tmpri/tmprj`` unguarded (the
    self pair yields 0/0); we pin rij=1 there so phi stays finite."""
    d = dim
    tmpri = 0.0
    tmprj = 0.0
    for alp in range(d):
        for bet in range(d):
            tmpri = tmpri + d_gradv[9 * d_idx + d * alp + bet] * \
                XIJ[alp] * XIJ[bet]
            tmprj = tmprj + s_gradv[9 * s_idx + d * alp + bet] * \
                XIJ[alp] * XIJ[bet]
    safe = jnp.abs(tmprj) > 1e-30
    rij = jnp.where(safe, tmpri / jnp.where(safe, tmprj, 1.0), 1.0)

    tmprij = jnp.minimum(1.0, 4 * rij / ((1 + rij) * (1 + rij)))
    phiij = jnp.maximum(0.0, tmprij)

    hi = d_h[d_idx]
    hj = s_h[s_idx]
    tmpxij = XIJ[0] ** 2 + XIJ[1] ** 2 + XIJ[2] ** 2
    tmpxij2 = jnp.sqrt(tmpxij)
    etaij = jnp.minimum(tmpxij2 / hi, tmpxij2 / hj)
    tmpphi = (etaij - eta_crit) / eta_fold
    phiij = jnp.where(etaij < eta_crit,
                      phiij * jnp.exp(-tmpphi * tmpphi), phiij)

    uijhat = []
    for alp in range(d):
        s = 0.0
        for bet in range(d):
            s = s + (d_gradv[9 * d_idx + d * alp + bet] +
                     s_gradv[9 * s_idx + d * alp + bet]) * XIJ[bet]
        uijhat.append(VIJU[alp] - 0.5 * phiij * s)
    for alp in range(d, 3):
        uijhat.append(VIJU[alp])

    udotx = sum(uijhat[i] * XIJ[i] for i in range(d))
    mui = jnp.minimum(0.0, udotx / (tmpxij / hi + EPS * hi))
    muj = jnp.minimum(0.0, udotx / (tmpxij / hi + EPS * hj))
    return mui, muj


class MomentumEquation(Equation):
    """CRKSPH momentum equation with the limited monaghan Q
    (reference crksph.py:480)."""

    def __init__(self, dest, sources, dim, gx=0.0, gy=0.0, gz=0.0,
                 cl=2, cq=1, eta_crit=0.3, eta_fold=0.2, tol=0.5):
        self.dim = dim
        self.gx = gx
        self.gy = gy
        self.gz = gz
        self.cl = cl
        self.cq = cq
        self.eta_crit = eta_crit
        self.eta_fold = eta_fold
        self.tol = tol
        super(MomentumEquation, self).__init__(dest, sources)

    def initialize(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] = self.gx
        d_av[d_idx] = self.gy
        d_aw[d_idx] = self.gz

    def loop(self, d_idx, s_idx, d_m, d_rho, s_rho, d_p, s_p, d_cs,
             s_cs, d_u, d_v, d_w, s_u, s_v, s_w, d_gradv, s_gradv, d_h,
             s_h, d_au, d_av, d_aw, d_V, s_V, XIJ, DWIJ, EPS):
        viju = (d_u[d_idx] - s_u[s_idx], d_v[d_idx] - s_v[s_idx],
                d_w[d_idx] - s_w[s_idx])
        mui, muj = _limiter(self.dim, d_gradv, s_gradv, d_idx, s_idx,
                            XIJ, d_h, s_h, self.eta_crit,
                            self.eta_fold, EPS, viju)
        ci = d_cs[d_idx]
        cj = s_cs[s_idx]
        Qi = d_rho[d_idx] * (-self.cl * ci * mui + self.cq * mui * mui)
        Qj = s_rho[s_idx] * (-self.cl * cj * muj + self.cq * muj * muj)

        Vi = 1.0 / d_V[d_idx]
        Vj = 1.0 / s_V[s_idx]
        fac = -(1.0 / d_m[d_idx]) * Vi * Vj * \
            (d_p[d_idx] + s_p[s_idx] + Qi + Qj)
        d_au[d_idx] += fac * DWIJ[0]
        d_av[d_idx] += fac * DWIJ[1]
        d_aw[d_idx] += fac * DWIJ[2]


class EnergyEquation(Equation):
    """CRKSPH compatible-energy update (reference crksph.py:635)."""

    def __init__(self, dest, sources, dim, gamma, gx=0.0, gy=0.0,
                 gz=0.0, cl=2, cq=1, eta_crit=0.5, eta_fold=0.2,
                 tol=0.5):
        self.dim = dim
        self.gamma = gamma
        self.gx = gx
        self.gy = gy
        self.gz = gz
        self.cl = cl
        self.cq = cq
        self.eta_crit = eta_crit
        self.eta_fold = eta_fold
        self.tol = tol
        super(EnergyEquation, self).__init__(dest, sources)

    def initialize(self, d_idx, d_ae):
        d_ae[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_ae, d_u0, d_v0, d_w0, s_u0, s_v0,
             s_w0, d_u, d_v, d_w, s_u, s_v, s_w, d_p, d_rho, s_p,
             s_rho, d_m, d_V, s_V, d_cs, s_cs, d_h, s_h, XIJ, d_gradv,
             s_gradv, EPS, DWIJ):
        d = self.dim
        viju = (d_u0[d_idx] - s_u0[s_idx], d_v0[d_idx] - s_v0[s_idx],
                d_w0[d_idx] - s_w0[s_idx])
        mui, muj = _limiter(d, d_gradv, s_gradv, d_idx, s_idx, XIJ,
                            d_h, s_h, self.eta_crit, self.eta_fold,
                            EPS, viju)
        ci = d_cs[d_idx]
        cj = s_cs[s_idx]
        Qi = d_rho[d_idx] * (-self.cl * ci * mui + self.cq * mui * mui)
        Qj = s_rho[s_idx] * (-self.cl * cj * muj + self.cq * muj * muj)

        Vi = 1.0 / d_V[d_idx]
        Vj = 1.0 / s_V[s_idx]
        fac = -(1.0 / d_m[d_idx]) * Vi * Vj * \
            (d_p[d_idx] + s_p[s_idx] + Qi + Qj)

        auij = [fac * DWIJ[i] for i in range(3)]
        delu = [s_u0[s_idx] + s_u[s_idx] - d_u0[d_idx] - d_u[d_idx],
                s_v0[s_idx] + s_v[s_idx] - d_v0[d_idx] - d_v[d_idx],
                s_w0[s_idx] + s_w[s_idx] - d_w0[d_idx] - d_w[d_idx]]
        aeij = sum(delu[i] * auij[i] for i in range(d))

        gamma = self.gamma
        si = d_p[d_idx] / (d_rho[d_idx] ** gamma)
        sj = s_p[s_idx] / (s_rho[s_idx] ** gamma)
        smin = jnp.minimum(jnp.abs(si), jnp.abs(sj))
        smax = jnp.maximum(jnp.abs(si), jnp.abs(sj))
        ssum = jnp.where(smin + smax > 0.0, smin + smax, 1.0)
        sdiff = si - sj
        fij = jnp.where(sdiff * aeij > 0, smin / ssum,
                        jnp.where(sdiff * aeij < 0, smax / ssum, 0.5))
        d_ae[d_idx] += 0.5 * fij * aeij


class StateEquation(Equation):
    """p = (gamma - 1) rho e (reference crksph.py:786)."""

    def __init__(self, dest, sources, gamma):
        self.gamma = gamma
        super(StateEquation, self).__init__(dest, sources)

    def initialize(self, d_idx, d_p, d_rho, d_e):
        d_p[d_idx] = (self.gamma - 1) * d_rho[d_idx] * d_e[d_idx]


class SpeedOfSound(Equation):
    """cs = sqrt(gamma p / rho) (reference crksph.py:804)."""

    def __init__(self, dest, sources=None, gamma=7.0):
        super(SpeedOfSound, self).__init__(dest, sources)
        self.gamma = gamma

    def initialize(self, d_cs, d_idx, d_p, d_rho):
        d_cs[d_idx] = (self.gamma * d_p[d_idx] /
                       d_rho[d_idx]) ** 0.5


class CRKSPHUpdateGhostProps(Equation):
    """Ghost copy (reference crksph.py:813); no mirrored ghosts in the
    grid engine, kept as a no-op for parity."""

    def __init__(self, dest, sources=None, dim=2):
        super(CRKSPHUpdateGhostProps, self).__init__(dest, sources)
        self.dim = dim

    def initialize(self, d_idx):
        pass


def get_particle_array_crksph(constants=None, **props):
    """CRKSPH particle array factory (reference crksph.py:847)."""
    from pysph_tpu.base.utils import get_particle_array
    crksph_props = [
        'e', 'au', 'av', 'aw', 'ae', 'u0', 'v0', 'w0', 'cs', 'V',
        'rhofac', 'x0', 'y0', 'z0', 'rho0', 'ax', 'ay', 'az', 'arho',
    ]
    pa = get_particle_array(additional_props=crksph_props,
                            constants=constants, **props)
    pa.add_property('cwij')
    pa.add_property('ai')
    pa.add_property('bi', stride=3)
    pa.add_property('gradai', stride=3)
    pa.add_property('gradbi', stride=9)
    pa.add_property('gradv', stride=9)
    for name, stride in _CRK_TEMPS:
        pa.add_property(name, stride=stride)
    pa.add_output_arrays(['p', 'V'])
    return pa


_CRK_TEMPS = (('crk_m0', 1), ('crk_m1', 3), ('crk_m2', 9),
              ('crk_gm0', 3), ('crk_gm1', 9), ('crk_gm2', 27),
              ('crk_nnbr', 1))


from pysph_tpu.sph.integrator import Integrator  # noqa: E402
from pysph_tpu.sph.integrator_step import IntegratorStep  # noqa: E402


class CRKSPHIntegrator(Integrator):
    """Two-evaluator CRKSPH timestep (reference crksph.py:866)."""

    def one_timestep(self, t, dt):
        self.stage1()
        self.do_post_stage(dt, 1)
        self.compute_accelerations(0)
        self.stage2()
        self.do_post_stage(dt, 2)
        self.compute_accelerations(1)
        self.stage3()
        self.do_post_stage(dt, 3)
        self.update_domain()


class CRKSPHStep(IntegratorStep):
    """CRKSPH stepper (reference crksph.py:884)."""

    def stage1(self, d_idx, d_u, d_v, d_w, d_u0, d_v0, d_w0):
        d_u0[d_idx] = d_u[d_idx]
        d_v0[d_idx] = d_v[d_idx]
        d_w0[d_idx] = d_w[d_idx]

    def stage2(self, d_idx, d_u, d_v, d_w, d_au, d_av, d_aw, dt):
        d_u[d_idx] += d_au[d_idx] * dt
        d_v[d_idx] += d_av[d_idx] * dt
        d_w[d_idx] += d_aw[d_idx] * dt

    def stage3(self, d_idx, d_e, d_ae, d_u, d_v, d_w, d_u0, d_v0,
               d_w0, d_x, d_y, d_z, dt):
        d_e[d_idx] += d_ae[d_idx] * dt
        d_x[d_idx] += 0.5 * dt * (d_u[d_idx] + d_u0[d_idx])
        d_y[d_idx] += 0.5 * dt * (d_v[d_idx] + d_v0[d_idx])
        d_z[d_idx] += 0.5 * dt * (d_w[d_idx] + d_w0[d_idx])


from pysph_tpu.sph.scheme import Scheme  # noqa: E402


class CRKSPHScheme(Scheme):
    """CRKSPH scheme (reference crksph.py:903)."""

    def __init__(self, fluids, dim, rho0, c0, nu, h0, p0, gx=0.0,
                 gy=0.0, gz=0.0, cl=2, cq=1, gamma=7.0, eta_crit=0.3,
                 eta_fold=0.2, tol=0.5, has_ghosts=False):
        self.fluids = fluids
        self.solver = None
        self.dim = dim
        self.rho0 = rho0
        self.c0 = c0
        self.h0 = h0
        self.p0 = p0
        self.nu = nu
        self.gx = gx
        self.gy = gy
        self.gz = gz
        self.cl = cl
        self.cq = cq
        self.gamma = gamma
        self.eta_crit = eta_crit
        self.eta_fold = eta_fold
        self.tol = tol
        self.has_ghosts = has_ghosts

    def add_user_options(self, group):
        pass

    def consume_user_options(self, options):
        pass

    def configure_solver(self, kernel=None, integrator_cls=None,
                         extra_steppers=None, **kw):
        from pysph_tpu.base.kernels import QuinticSpline
        from pysph_tpu.solver.solver import Solver
        if kernel is None:
            kernel = QuinticSpline(dim=self.dim)
        steppers = {}
        if extra_steppers is not None:
            steppers.update(extra_steppers)
        for fluid in self.fluids:
            if fluid not in steppers:
                steppers[fluid] = CRKSPHStep()
        cls = integrator_cls if integrator_cls is not None else \
            CRKSPHIntegrator
        integrator = cls(**steppers)
        self.solver = Solver(dim=self.dim, integrator=integrator,
                             kernel=kernel, **kw)

    def get_equations(self):
        from pysph_tpu.sph.equation import Group, MultiStageEquations
        from pysph_tpu.sph.wc.viscosity import LaminarViscosity
        all = self.fluids

        stage1 = []
        stage1.append(Group(equations=[
            eq for fluid in self.fluids for eq in
            (StateEquation(dest=fluid, sources=None, gamma=self.gamma),
             SpeedOfSound(dest=fluid, sources=None, gamma=self.gamma))
        ]))
        stage1.append(Group(equations=[
            NumberDensity(dest=fluid, sources=all)
            for fluid in self.fluids], real=False))
        stage1.append(Group(equations=[
            CRKSPHPreStep(dest=fluid, sources=all, dim=self.dim)
            for fluid in self.fluids], real=False))
        stage1.append(Group(equations=[
            eq for fluid in self.fluids for eq in
            (CRKSPHSymmetric(dest=fluid, sources=all, dim=self.dim,
                             tol=self.tol),
             SummationDensityCRKSPH(dest=fluid, sources=all))
        ], real=False))
        stage1.append(Group(equations=[
            eq for fluid in self.fluids for eq in
            (StateEquation(dest=fluid, sources=None, gamma=self.gamma),
             SpeedOfSound(dest=fluid, sources=None, gamma=self.gamma))
        ]))
        stage1.append(Group(equations=[
            eq for fluid in self.fluids for eq in
            (CRKSPHSymmetric(dest=fluid, sources=all, dim=self.dim,
                             tol=self.tol),
             VelocityGradient(dest=fluid, sources=all, dim=self.dim))
        ]))
        eq5 = []
        for fluid in self.fluids:
            eq5.append(CRKSPHSymmetric(dest=fluid, sources=all,
                                       dim=self.dim, tol=self.tol))
            eq5.append(MomentumEquation(
                dest=fluid, sources=all, dim=self.dim, gx=self.gx,
                gy=self.gy, gz=self.gz, cl=self.cl, cq=self.cq,
                eta_crit=self.eta_crit, eta_fold=self.eta_fold))
            if abs(self.nu) > 1e-14:
                eq5.append(LaminarViscosity(
                    dest=fluid, sources=self.fluids, nu=self.nu))
        stage1.append(Group(equations=eq5))

        stage2 = [Group(equations=[
            eq for fluid in self.fluids for eq in
            (CRKSPHSymmetric(dest=fluid, sources=all, dim=self.dim,
                             tol=self.tol),
             EnergyEquation(dest=fluid, sources=all, dim=self.dim,
                            gamma=self.gamma))
        ])]
        return MultiStageEquations([stage1, stage2])

    def setup_properties(self, particles, clean=True):
        import numpy
        particle_arrays = dict((p.name, p) for p in particles)
        dummy = get_particle_array_crksph(name='junk')
        props = list(dummy.properties.keys())
        output_props = list(dummy.output_property_arrays)
        output_props += ['p', 'V', 'e']
        for fluid in self.fluids:
            pa = particle_arrays[fluid]
            for prop in props:
                if prop not in pa.properties:
                    pa.add_property(prop, stride=dummy.stride.get(
                        prop, 1))
            pa.add_property('orig_idx', type='int')
            pa.orig_idx = numpy.arange(pa.get_number_of_particles())
            pa.set_output_arrays(output_props)
