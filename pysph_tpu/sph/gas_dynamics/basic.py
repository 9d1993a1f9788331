"""Basic equations for compressible gas dynamics (parity with
/root/reference/pysph/sph/gas_dynamics/basic.py).

The iterative smoothing-length solution (Newton-Raphson per particle)
runs vectorized: every particle updates until its own ``converged`` flag
is set; the group's ``converged()`` reduces the flags so the engine's
``lax.while_loop`` iterates exactly like the reference's iterated group.
"""

import jax.numpy as jnp

from pysph_tpu.sph.equation import MAX, Equation


class ScaleSmoothingLength(Equation):
    def __init__(self, dest, sources, factor=2.0):
        super(ScaleSmoothingLength, self).__init__(dest, sources)
        self.factor = factor

    def loop(self, d_idx, d_h):
        d_h[d_idx] = d_h[d_idx] * self.factor


class UpdateSmoothingLengthFromVolume(Equation):
    def __init__(self, dest, sources, dim, k=1.2):
        super(UpdateSmoothingLengthFromVolume, self).__init__(dest,
                                                              sources)
        self.k = k
        self.dim1 = 1.0 / dim

    def loop(self, d_idx, d_m, d_rho, d_h):
        d_h[d_idx] = self.k * (d_m[d_idx] / d_rho[d_idx]) ** self.dim1


class SummationDensityADKE(Equation):
    """ADKE summation density with adaptive kernel estimation
    (reference gas_dynamics/basic.py:33)."""

    def __init__(self, dest, sources, k=1.0, eps=0.0):
        self.k = k
        self.eps = eps
        super(SummationDensityADKE, self).__init__(dest, sources)

    def initialize(self, d_idx, d_arho, d_rho, d_h, d_h0):
        d_rho[d_idx] = 0.0
        d_arho[d_idx] = 0.0
        d_h[d_idx] = d_h0[d_idx]

    def loop(self, d_idx, d_rho, d_arho, s_idx, s_m, VIJ, DWI, WIJ):
        d_rho[d_idx] += s_m[s_idx] * WIJ
        vijdotdwij = (VIJ[0] * DWI[0] + VIJ[1] * DWI[1] +
                      VIJ[2] * DWI[2])
        d_arho[d_idx] += s_m[s_idx] * vijdotdwij

    def post_loop(self, d_idx, d_rho, d_arho, d_div, d_logrho):
        d_div[d_idx] = -d_arho[d_idx] / d_rho[d_idx]
        d_arho[d_idx] = 0.0
        d_logrho[d_idx] = jnp.log(d_rho[d_idx])

    def reduce(self, dst, t, dt):
        mask = dst.active
        n = jnp.sum(jnp.where(mask, 1.0, 0.0))
        sum_logrho = jnp.sum(jnp.where(mask, dst.logrho[:], 0.0))
        g = jnp.exp(sum_logrho / jnp.maximum(n, 1.0))
        lamda = self.k * (g / jnp.where(mask, dst.rho[:], 1.0)) ** \
            self.eps
        dst.h[:] = jnp.where(mask, lamda * dst.h0[:], dst.h[:])


class SummationDensity(Equation):
    """Summation density with optional Newton-Raphson iteration of h
    (grad-h SPH, reference gas_dynamics/basic.py:76)."""

    def __init__(self, dest, sources, dim, density_iterations=False,
                 iterate_only_once=False, k=1.2, htol=1e-6):
        self.density_iterations = density_iterations
        self.iterate_only_once = iterate_only_once
        self.dim = dim
        self.k = k
        self.htol = htol
        super(SummationDensity, self).__init__(dest, sources)

    def initialize(self, d_idx, d_rho, d_div, d_grhox, d_grhoy,
                   d_grhoz, d_arho, d_dwdh):
        d_rho[d_idx] = 0.0
        d_div[d_idx] = 0.0
        d_grhox[d_idx] = 0.0
        d_grhoy[d_idx] = 0.0
        d_grhoz[d_idx] = 0.0
        d_arho[d_idx] = 0.0
        d_dwdh[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_rho, d_grhox, d_grhoy, d_grhoz,
             d_arho, d_dwdh, s_m, VIJ, WI, DWI, GHI):
        mj = s_m[s_idx]
        vijdotdwij = (VIJ[0] * DWI[0] + VIJ[1] * DWI[1] +
                      VIJ[2] * DWI[2])
        d_rho[d_idx] += mj * WI
        d_arho[d_idx] += mj * vijdotdwij
        d_grhox[d_idx] += mj * DWI[0]
        d_grhoy[d_idx] += mj * DWI[1]
        d_grhoz[d_idx] += mj * DWI[2]
        d_dwdh[d_idx] += mj * GHI

    def post_loop(self, d_idx, d_arho, d_rho, d_div, d_omega, d_dwdh,
                  d_h0, d_h, d_m, d_ah, d_converged):
        if self.density_iterations:
            active = d_converged[d_idx] != 1
            mi = d_m[d_idx]
            hi = d_h[d_idx]
            hi0 = d_h0[d_idx]
            rhoi = mi / (hi / self.k) ** self.dim
            dhdrhoi = -hi / (self.dim * d_rho[d_idx])
            omegai = 1.0 - dhdrhoi * d_dwdh[d_idx]
            omegai = jnp.where(omegai < 0, 1.0, omegai)
            gradhi = 1.0 / omegai
            func = rhoi - d_rho[d_idx]
            dfdh = omegai / dhdrhoi
            hnew = hi - func / dfdh
            hnew = jnp.clip(hnew, 0.8 * hi, 1.2 * hi)
            hnew = jnp.where((hnew <= 1e-6) | (gradhi < 1e-6),
                             self.k * (mi / d_rho[d_idx]) **
                             (1.0 / self.dim), hnew)
            diff = jnp.abs(hnew - hi) / hi0
            done = ((diff < self.htol) & (omegai > 0)) | \
                bool(self.iterate_only_once)
            # update each particle until its own flag converges
            d_omega[d_idx] = jnp.where(active, gradhi, d_omega[d_idx])
            d_h[d_idx] = jnp.where(active & ~done, hnew, d_h[d_idx])
            d_arho[d_idx] = jnp.where(
                active & done, d_arho[d_idx] * gradhi, d_arho[d_idx])
            d_ah[d_idx] = jnp.where(
                active & done, d_arho[d_idx] * dhdrhoi, d_ah[d_idx])
            d_converged[d_idx] = jnp.where(
                active & done, 1.0,
                jnp.where(active, 0.0, d_converged[d_idx]))
        d_div[d_idx] = -d_arho[d_idx] / d_rho[d_idx]

    def converged(self, dst):
        if not self.density_iterations:
            return 1.0
        all_done = jnp.all(jnp.where(dst.active,
                                     dst.converged[:] == 1, True))
        return jnp.where(all_done, 1.0, -1.0)


class IdealGasEOS(Equation):
    """p = (gamma - 1) rho e (reference gas_dynamics/basic.py:222)."""

    def __init__(self, dest, sources, gamma):
        self.gamma = gamma
        self.gamma1 = gamma - 1.0
        super(IdealGasEOS, self).__init__(dest, sources)

    def loop(self, d_idx, d_p, d_rho, d_e, d_cs):
        d_p[d_idx] = self.gamma1 * d_rho[d_idx] * d_e[d_idx]
        d_cs[d_idx] = jnp.sqrt(self.gamma *
                               jnp.maximum(d_p[d_idx], 0.0) /
                               d_rho[d_idx])


class Monaghan92Accelerations(Equation):
    """Classic Monaghan 1992 gas-dynamics accelerations
    (reference gas_dynamics/basic.py:233)."""

    def __init__(self, dest, sources, alpha=1.0, beta=2.0):
        self.alpha = alpha
        self.beta = beta
        super(Monaghan92Accelerations, self).__init__(dest, sources)

    def initialize(self, d_idx, d_au, d_av, d_aw, d_ae):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0
        d_ae[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_rho, s_rho, d_p, s_p, d_cs, s_cs,
             d_au, d_av, d_aw, d_ae, s_m,
             VIJ, DWIJ, XIJ, EPS, HIJ, R2IJ, RHOIJ1):
        tmpi = d_p[d_idx] / (d_rho[d_idx] * d_rho[d_idx])
        tmpj = s_p[s_idx] / (s_rho[s_idx] * s_rho[s_idx])
        vijdotxij = (VIJ[0] * XIJ[0] + VIJ[1] * XIJ[1] +
                     VIJ[2] * XIJ[2])
        muij = HIJ * vijdotxij / (R2IJ + EPS)
        cij = 0.5 * (d_cs[d_idx] + s_cs[s_idx])
        piij = (-self.alpha * cij * muij +
                self.beta * muij * muij) * RHOIJ1
        piij = jnp.where(vijdotxij < 0, piij, 0.0)
        fac = s_m[s_idx] * (tmpi + tmpj + piij)
        d_au[d_idx] += -fac * DWIJ[0]
        d_av[d_idx] += -fac * DWIJ[1]
        d_aw[d_idx] += -fac * DWIJ[2]
        vijdotdwij = (VIJ[0] * DWIJ[0] + VIJ[1] * DWIJ[1] +
                      VIJ[2] * DWIJ[2])
        d_ae[d_idx] += 0.5 * fac * vijdotdwij


class ADKEAccelerations(Equation):
    """ADKE accelerations with artificial viscosity + conduction
    (reference gas_dynamics/basic.py:505... :333)."""

    def __init__(self, dest, sources, alpha, beta, g1, g2, k, eps):
        self.alpha = alpha
        self.beta = beta
        self.g1 = g1
        self.g2 = g1
        self.k = k
        self.eps = eps
        super(ADKEAccelerations, self).__init__(dest, sources)

    def initialize(self, d_idx, d_au, d_av, d_aw, d_ae):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0
        d_ae[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_au, d_av, d_aw, d_ae, d_p, s_p,
             d_rho, s_rho, d_m, s_m, d_cs, s_cs, s_e, d_e, s_h, d_h,
             s_div, d_div, DWIJ, HIJ, XIJ, VIJ, R2IJ, EPS, RHOIJ,
             RHOIJ1):
        pibrhoi2 = d_p[d_idx] / (d_rho[d_idx] * d_rho[d_idx])
        pjbrhoj2 = s_p[s_idx] / (s_rho[s_idx] * s_rho[s_idx])
        cij = 0.5 * (d_cs[d_idx] + s_cs[s_idx])
        mj = s_m[s_idx]
        hi = d_h[d_idx]
        hj = s_h[s_idx]
        divi = d_div[d_idx]
        divj = s_div[s_idx]
        eij = d_e[d_idx] - s_e[s_idx]
        Hi = self.g1 * hi * d_cs[d_idx] + \
            self.g2 * hi * hi * (jnp.abs(divi) - divi)
        Hj = self.g1 * hj * s_cs[s_idx] + \
            self.g2 * hj * hj * (jnp.abs(divj) - divj)
        Hij = (Hi + Hj) * eij / (RHOIJ * (R2IJ + EPS))
        xijdotvij = (XIJ[0] * VIJ[0] + XIJ[1] * VIJ[1] +
                     XIJ[2] * VIJ[2])
        muij = HIJ * xijdotvij / (R2IJ + EPS)
        piij = muij * (self.beta * muij - self.alpha * cij) * RHOIJ1
        piij = jnp.where(xijdotvij < 0, piij, 0.0)
        tmpv = pibrhoi2 + pjbrhoj2 + piij
        d_au[d_idx] += -mj * tmpv * DWIJ[0]
        d_av[d_idx] += -mj * tmpv * DWIJ[1]
        d_aw[d_idx] += -mj * tmpv * DWIJ[2]
        vijdotdwij = (VIJ[0] * DWIJ[0] + VIJ[1] * DWIJ[1] +
                      VIJ[2] * DWIJ[2])
        xijdotdwij = (XIJ[0] * DWIJ[0] + XIJ[1] * DWIJ[1] +
                      XIJ[2] * DWIJ[2])
        d_ae[d_idx] += 0.5 * mj * (tmpv * vijdotdwij +
                                   2 * xijdotdwij * Hij)


class MPMAccelerations(Equation):
    """Monaghan-Price-Morris style accelerations with grad-h terms and
    signal-velocity viscosity/conduction (reference
    gas_dynamics/basic.py:355)."""

    def __init__(self, dest, sources, beta=2.0, update_alpha1=False,
                 update_alpha2=False, alpha1_min=0.1, alpha2_min=0.1,
                 sigma=0.1):
        self.beta = beta
        self.sigma = sigma
        self.update_alpha1 = update_alpha1
        self.update_alpha2 = update_alpha2
        self.alpha1_min = alpha1_min
        self.alpha2_min = alpha2_min
        super(MPMAccelerations, self).__init__(dest, sources)

    def initialize(self, d_idx, d_au, d_av, d_aw, d_ae, d_am,
                   d_aalpha1, d_aalpha2, d_del2e, d_dt_cfl):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0
        d_ae[d_idx] = 0.0
        d_aalpha1[d_idx] = 0.0
        d_aalpha2[d_idx] = 0.0
        d_del2e[d_idx] = 0.0
        d_dt_cfl[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_m, s_m, d_p, s_p, d_cs, s_cs,
             d_e, s_e, d_rho, s_rho, d_au, d_av, d_aw, d_ae,
             d_omega, s_omega, XIJ, VIJ, DWI, DWJ, DWIJ, HIJ,
             d_del2e, d_alpha1, s_alpha1, d_alpha2, s_alpha2,
             EPS, RIJ, R2IJ, RHOIJ, d_dt_cfl):
        p_i = d_p[d_idx]
        pj = s_p[s_idx]
        pibrhoi2 = p_i / (d_rho[d_idx] * d_rho[d_idx])
        pjbrhoj2 = pj / (s_rho[s_idx] * s_rho[s_idx])
        cij = 0.5 * (d_cs[d_idx] + s_cs[s_idx])
        mj = s_m[s_idx]

        # normalized interaction vector (mutates XIJ like the reference)
        safe_r = jnp.where(RIJ < 1e-8, 1.0, RIJ)
        for i in range(3):
            XIJ[i] = jnp.where(RIJ < 1e-8, 0.0, XIJ[i] / safe_r)

        dot = VIJ[0] * XIJ[0] + VIJ[1] * XIJ[1] + VIJ[2] * XIJ[2]
        Fij = XIJ[0] * DWIJ[0] + XIJ[1] * DWIJ[1] + XIJ[2] * DWIJ[2]
        pdiff = jnp.abs(p_i - pj)
        vsig1 = 0.5 * jnp.maximum(2 * cij - self.beta * dot, 0.0)
        vsig2 = jnp.sqrt(pdiff / RHOIJ)

        d_dt_cfl[d_idx] = MAX(cij + self.beta * dot, d_dt_cfl[d_idx])

        alpha1 = 0.5 * (d_alpha1[d_idx] + s_alpha1[s_idx])
        visc = jnp.where(dot <= 0.0, mj / RHOIJ * alpha1 * vsig1 * dot,
                         0.0)
        d_au[d_idx] += visc * DWIJ[0]
        d_av[d_idx] += visc * DWIJ[1]
        d_aw[d_idx] += visc * DWIJ[2]
        d_ae[d_idx] += jnp.where(
            dot <= 0.0,
            -0.5 * mj / RHOIJ * alpha1 * vsig1 * dot * dot * Fij, 0.0)

        omegai = d_omega[d_idx]
        omegaj = s_omega[s_idx]
        d_au[d_idx] += -mj * (pibrhoi2 * omegai * DWI[0] +
                              pjbrhoj2 * omegaj * DWJ[0])
        d_av[d_idx] += -mj * (pibrhoi2 * omegai * DWI[1] +
                              pjbrhoj2 * omegaj * DWJ[1])
        d_aw[d_idx] += -mj * (pibrhoi2 * omegai * DWI[2] +
                              pjbrhoj2 * omegaj * DWJ[2])
        vijdotdwi = (VIJ[0] * DWI[0] + VIJ[1] * DWI[1] +
                     VIJ[2] * DWI[2])
        d_ae[d_idx] += mj * pibrhoi2 * omegai * vijdotdwi

        alpha2 = 0.5 * (d_alpha2[d_idx] + s_alpha2[s_idx])
        eij = d_e[d_idx] - s_e[s_idx]
        d_ae[d_idx] += mj / RHOIJ * alpha2 * vsig2 * eij * Fij
        d_del2e[d_idx] += mj / s_rho[s_idx] * eij / (RIJ + EPS) * Fij

    def post_loop(self, d_idx, d_h, d_cs, d_alpha1, d_aalpha1, d_div,
                  d_del2e, d_e, d_alpha2, d_aalpha2):
        hi = d_h[d_idx]
        tau = hi / (self.sigma * d_cs[d_idx])
        if self.update_alpha1:
            S1 = jnp.maximum(-d_div[d_idx], 0.0)
            d_aalpha1[d_idx] = (self.alpha1_min - d_alpha1[d_idx]) / \
                tau + S1
        if self.update_alpha2:
            S2 = 0.01 * hi * jnp.abs(d_del2e[d_idx]) / \
                jnp.sqrt(jnp.maximum(d_e[d_idx], 1e-30))
            d_aalpha2[d_idx] = (self.alpha2_min - d_alpha2[d_idx]) / \
                tau + S2


class MPMUpdateGhostProps(Equation):
    """Ghost-property sync; a no-op here: the TPU rebuild uses
    minimum-image periodicity so there are no ghost particle copies to
    refresh (reference gas_dynamics/basic.py:489)."""

    def __init__(self, dest, sources=None, dim=2):
        super(MPMUpdateGhostProps, self).__init__(dest, sources)
        self.dim = dim

    def initialize(self, d_idx):
        pass


class ADKEUpdateGhostProps(Equation):
    """Ghost-property sync; a no-op (see MPMUpdateGhostProps)."""

    def __init__(self, dest, sources=None, dim=2):
        super(ADKEUpdateGhostProps, self).__init__(dest, sources)
        self.dim = dim

    def initialize(self, d_idx):
        pass
