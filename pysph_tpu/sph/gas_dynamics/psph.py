"""PSPH — Hopkins' pressure-entropy SPH (parity with
/root/reference/pysph/sph/gas_dynamics/psph.py).

Vectorized as the TSPH module: per-particle convergence flags for the
h iteration, batched 3x3 solves for the Kinsfolk C1 gradients, and
the signal-velocity neighbor max as a MAX pair reduction.
"""

import jax.numpy as jnp

from pysph_tpu.sph.equation import MAX, Equation
from pysph_tpu.sph.integrator_step import IntegratorStep
from pysph_tpu.sph.scheme import Scheme


class PSPHSummationDensityAndPressure(Equation):
    """(reference psph.py:278)"""

    def __init__(self, dest, sources, dim, gamma,
                 density_iterations=False, iterate_only_once=False,
                 hfact=1.2, htol=1e-6):
        self.density_iterations = density_iterations
        self.iterate_only_once = iterate_only_once
        self.dim = dim
        self.hfact = hfact
        self.htol = htol
        self.gamma = gamma
        self.gammam1 = gamma - 1.0
        super(PSPHSummationDensityAndPressure, self).__init__(dest,
                                                              sources)

    def initialize(self, d_idx, d_rho, d_arho, d_n, d_dndh, d_prevn,
                   d_prevdndh, d_p, d_dpsumdh, d_dprevpsumdh, d_an):
        d_rho[d_idx] = 0.0
        d_arho[d_idx] = 0.0
        d_prevn[d_idx] = d_n[d_idx]
        d_prevdndh[d_idx] = d_dndh[d_idx]
        d_n[d_idx] = 0.0
        d_dndh[d_idx] = 0.0
        d_an[d_idx] = 0.0
        d_p[d_idx] = 0.0
        d_dprevpsumdh[d_idx] = d_dpsumdh[d_idx]
        d_dpsumdh[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_rho, d_arho, s_m, VIJ, WI, DWI,
             GHI, d_n, d_dndh, d_h, d_prevn, d_prevdndh, s_e, d_p,
             d_dpsumdh, d_e, d_an):
        mj = s_m[s_idx]
        vijdotdwij = (VIJ[0] * DWI[0] + VIJ[1] * DWI[1] +
                      VIJ[2] * DWI[2])
        mj_wi = mj * WI
        d_rho[d_idx] += mj_wi
        d_p[d_idx] += self.gammam1 * s_e[s_idx] * mj_wi

        hibynidim = d_h[d_idx] / (d_prevn[d_idx] * self.dim)
        inbrkti = 1 + d_prevdndh[d_idx] * hibynidim
        inprthsi = d_dpsumdh[d_idx] * hibynidim / (
            self.gammam1 * s_m[s_idx] * d_e[d_idx])
        fij = 1 - inprthsi / inbrkti
        vijdotdwij_fij = vijdotdwij * fij
        d_an[d_idx] += vijdotdwij_fij
        d_arho[d_idx] += mj * vijdotdwij_fij
        d_dpsumdh[d_idx] += mj * self.gammam1 * d_e[d_idx] * GHI
        d_n[d_idx] += WI
        d_dndh[d_idx] += GHI

    def post_loop(self, d_idx, d_rho, d_h0, d_h, d_ah, d_converged,
                  d_cs, d_p, d_n, d_dndh, d_an):
        d_cs[d_idx] = jnp.sqrt(self.gamma * d_p[d_idx] /
                               d_rho[d_idx])
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


class GradientKinsfolkC1(Equation):
    """C1-corrected velocity AND acceleration gradients + shear
    invariants (reference psph.py:410); batched 3x3 solves."""

    def __init__(self, dest, sources, dim):
        self.dim = dim
        super(GradientKinsfolkC1, self).__init__(dest, sources)

    def initialize(self, d_gradv, d_idx, d_invtt, d_divv, d_grada,
                   d_adivv, d_trssdsst):
        for i in range(9):
            d_gradv[9 * d_idx + i] = 0.0
            d_invtt[9 * d_idx + i] = 0.0
            d_grada[9 * d_idx + i] = 0.0
        d_divv[d_idx] = 0.0
        d_adivv[d_idx] = 0.0
        d_trssdsst[d_idx] = 0.0

    def loop(self, d_idx, d_invtt, s_m, s_idx, VIJ, DWI, XIJ, d_gradv,
             d_grada, d_au, s_au, d_av, s_av, d_aw, s_aw):
        aij = [d_au[d_idx] - s_au[s_idx], d_av[d_idx] - s_av[s_idx],
               d_aw[d_idx] - s_aw[s_idx]]
        for row in range(self.dim):
            for col in range(self.dim):
                k = 9 * d_idx + row * 3 + col
                d_invtt[k] += -s_m[s_idx] * XIJ[row] * DWI[col]
                d_gradv[k] += -s_m[s_idx] * VIJ[row] * DWI[col]
                d_grada[k] += -s_m[s_idx] * aij[row] * DWI[col]

    def post_loop(self, d_idx, d_gradv, d_invtt, d_divv, d_grada,
                  d_adivv, d_ss, d_trssdsst):
        dim = self.dim

        def mat(view):
            rows = []
            for r in range(3):
                cols = [view[9 * d_idx + 3 * r + c] for c in range(3)]
                rows.append(jnp.stack(cols, axis=-1))
            return jnp.stack(rows, axis=-2)

        tt = mat(d_invtt)
        gradv = mat(d_gradv)
        grada = mat(d_grada)
        eye = jnp.broadcast_to(jnp.eye(3), tt.shape)
        keep = jnp.zeros((3, 3), bool).at[:dim, :dim].set(True)
        tt = jnp.where(keep, tt, eye)
        det = jnp.linalg.det(tt)
        good = jnp.abs(det) > 1e-12
        tt = jnp.where(good[..., None, None], tt, eye)
        invtt = jnp.linalg.inv(tt)
        gradvls = jnp.einsum('...ij,...jk->...ik', gradv, invtt)
        gradals = jnp.einsum('...ij,...jk->...ik', grada, invtt)

        divv = 0.0
        adivv = 0.0
        for r in range(dim):
            divv = divv + gradvls[..., r, r]
            adivv = adivv + gradals[..., r, r]
            for c in range(dim):
                adivv = adivv - gradals[..., r, c] * gradals[..., c, r]
        d_divv[d_idx] = divv
        d_adivv[d_idx] = adivv
        for r in range(dim):
            for c in range(dim):
                d_gradv[9 * d_idx + 3 * r + c] = gradvls[..., r, c]
                d_grada[9 * d_idx + 3 * r + c] = gradals[..., r, c]

        # traceless symmetric shear tensor (lower-triangular storage)
        divvbydim = divv / dim
        trss = 0.0
        for r in range(dim):
            k = 6 * d_idx + (r * (r + 1)) // 2 + r
            val = gradvls[..., r, r] - divvbydim
            d_ss[k] = val
            trss = trss + val * val
        for r in range(1, dim):
            for c in range(r):
                k = 6 * d_idx + (r * (r + 1)) // 2 + c
                val = 0.5 * (gradvls[..., r, c] + gradvls[..., c, r])
                d_ss[k] = val
                trss = trss + val * val
        d_trssdsst[d_idx] = trss


class SignalVelocity(Equation):
    """Neighbor-max signal velocity as a MAX pair reduction
    (reference psph.py:533 uses loop_all)."""

    def initialize(self, d_idx, d_vsig):
        d_vsig[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_cs, s_cs, d_vsig, XIJ, VIJ):
        vijdotxij = (VIJ[0] * XIJ[0] + VIJ[1] * XIJ[1] +
                     VIJ[2] * XIJ[2])
        cij = 0.5 * (d_cs[d_idx] + s_cs[s_idx])
        cand = cij - jnp.minimum(0.0, vijdotxij)
        d_vsig[d_idx] = MAX(cand, d_vsig[d_idx])


class LimiterAndAlphas(Equation):
    """Cullen-Dehnen-style AV limiter (reference psph.py:566)."""

    def __init__(self, dest, sources, alphamin=0.02, alphamax=2.0,
                 betac=0.7, betad=0.05, betaxi=1.0, fkern=1.0):
        self.alphamin = alphamin
        self.alphamax = alphamax
        self.betac = betac
        self.betad = betad
        self.betaxi = betaxi
        self.fkern = fkern
        super(LimiterAndAlphas, self).__init__(dest, sources)

    def initialize(self, d_idx, d_xi):
        d_xi[d_idx] = 0.0

    def loop(self, d_idx, s_idx, s_m, d_xi, s_divv, WI):
        sign = jnp.where(s_divv[s_idx] < 0, -1.0, 1.0)
        d_xi[d_idx] += sign * s_m[s_idx] * WI

    def post_loop(self, d_idx, d_xi, d_rho, d_h, d_adivv, d_cs,
                  d_alpha0, d_vsig, dt, d_divv, d_trssdsst, d_alpha):
        d_xi[d_idx] = 1.0 - d_xi[d_idx] / d_rho[d_idx]
        fhi = self.fkern * d_h[d_idx]

        absadivv = jnp.abs(d_adivv[d_idx])
        csbyfhi = d_cs[d_idx] / fhi
        alphatmp = jnp.where(
            (d_adivv[d_idx] >= 0) | (d_divv[d_idx] >= 0), 0.0,
            self.alphamax * absadivv /
            (absadivv + self.betac * csbyfhi * csbyfhi))

        epow = jnp.exp(-self.betad * dt * jnp.abs(d_vsig[d_idx]) *
                       0.5 / fhi)
        decayed = alphatmp + (d_alpha0[d_idx] - alphatmp) * epow
        d_alpha0[d_idx] = jnp.where(alphatmp >= d_alpha0[d_idx],
                                    alphatmp, decayed)

        xip4 = d_xi[d_idx] ** 4
        alnumtt = self.betaxi * xip4 * d_divv[d_idx]
        alnumt = alnumtt * alnumtt
        alnum = alnumt * d_alpha0[d_idx]
        alden = alnumt + d_trssdsst[d_idx]
        d_alpha[d_idx] = jnp.where(
            alden < 1e-8, self.alphamin,
            jnp.maximum(alnum / jnp.where(alden < 1e-8, 1.0, alden),
                        self.alphamin))


class MomentumAndEnergy(Equation):
    """Pressure-entropy momentum/energy + artificial conductivity
    (reference psph.py:625)."""

    def __init__(self, dest, sources, dim, fkern, gamma, betab=2.0,
                 alphac=0.25):
        self.betab = betab
        self.dim = dim
        self.fkern = fkern
        self.alphac = alphac
        self.gammam1 = gamma - 1.0
        super(MomentumAndEnergy, self).__init__(dest, sources)

    def initialize(self, d_idx, d_au, d_av, d_aw, d_ae):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0
        d_ae[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_m, s_m, d_p, s_p, d_cs, s_cs, d_au,
             d_av, d_aw, d_ae, XIJ, VIJ, DWI, DWJ, d_alpha, s_alpha,
             RIJ, d_h, d_dndh, d_n, s_h, s_dndh, s_n, d_e, s_e,
             d_dpsumdh, s_dpsumdh, RHOIJ1):
        dim = self.dim
        gammam1 = self.gammam1
        cij = 0.5 * (d_cs[d_idx] + s_cs[s_idx])
        mj = s_m[s_idx]
        vijdotxij = (VIJ[0] * XIJ[0] + VIJ[1] * XIJ[1] +
                     VIJ[2] * XIJ[2])

        near = RIJ < 1e-8
        rinv = 1.0 / jnp.where(near, 1.0, RIJ)
        vs = jnp.where(near, 2 * cij,
                       2 * cij - 3 * vijdotxij * rinv)
        muij = jnp.where(near, 0.0, vijdotxij * rinv)
        Fij = jnp.where(near, 0.0, 0.5 * (
            XIJ[0] * (DWI[0] + DWJ[0]) +
            XIJ[1] * (DWI[1] + DWJ[1]) +
            XIJ[2] * (DWI[2] + DWJ[2])) * rinv)

        appr = vijdotxij <= 0.0
        alphaij = 0.5 * (d_alpha[d_idx] + s_alpha[s_idx])
        oby2rhoij = RHOIJ1 / 2.0
        common = jnp.where(
            appr, alphaij * muij * (cij - self.betab * muij) * mj *
            oby2rhoij, 0.0)
        avi = [common * (DWI[i] + DWJ[i]) for i in range(3)]
        d_au[d_idx] += avi[0]
        d_av[d_idx] += avi[1]
        d_aw[d_idx] += avi[2]
        d_ae[d_idx] -= 0.5 * (VIJ[0] * avi[0] + VIJ[1] * avi[1] +
                              VIJ[2] * avi[2])
        # artificial conductivity
        eij = d_e[d_idx] - s_e[s_idx]
        Lij = jnp.abs(d_p[d_idx] - s_p[s_idx]) / \
            (d_p[d_idx] + s_p[s_idx])
        d_ae[d_idx] += jnp.where(
            appr, self.alphac * mj * alphaij * vs * eij * Lij * Fij *
            oby2rhoij, 0.0)

        hibynidim = d_h[d_idx] / (d_n[d_idx] * dim)
        inbrkti = 1 + d_dndh[d_idx] * hibynidim
        inprthsi = d_dpsumdh[d_idx] * hibynidim / (
            gammam1 * s_m[s_idx] * d_e[d_idx])
        fij = 1 - inprthsi / inbrkti

        hjbynjdim = s_h[s_idx] / (s_n[s_idx] * dim)
        inbrktj = 1 + s_dndh[s_idx] * hjbynjdim
        inprthsj = s_dpsumdh[s_idx] * hjbynjdim / (
            gammam1 * d_m[d_idx] * s_e[s_idx])
        fji = 1 - inprthsj / inbrktj

        gammam1sq = gammam1 * gammam1
        comm = gammam1sq * mj * d_e[d_idx] * s_e[s_idx]
        commi = comm * fij / d_p[d_idx]
        commj = comm * fji / s_p[s_idx]
        d_au[d_idx] -= commi * DWI[0] + commj * DWJ[0]
        d_av[d_idx] -= commi * DWI[1] + commj * DWJ[1]
        d_aw[d_idx] -= commi * DWI[2] + commj * DWJ[2]
        vijdotdwi = (VIJ[0] * DWI[0] + VIJ[1] * DWI[1] +
                     VIJ[2] * DWI[2])
        d_ae[d_idx] += commi * vijdotdwi


class WallBoundary(Equation):
    """(reference psph.py:785)"""

    def initialize(self, d_idx, d_p, d_rho, d_e, d_m, d_cs, d_h,
                   d_htmp, d_h0, d_u, d_v, d_w, d_wij, d_n, d_dndh,
                   d_dpsumdh, d_m0):
        d_p[d_idx] = 0.0
        d_u[d_idx] = 0.0
        d_v[d_idx] = 0.0
        d_w[d_idx] = 0.0
        d_m0[d_idx] = d_m[d_idx]
        d_m[d_idx] = 0.0
        d_rho[d_idx] = 0.0
        d_e[d_idx] = 0.0
        d_cs[d_idx] = 0.0
        d_wij[d_idx] = 0.0
        d_h[d_idx] = d_h0[d_idx]
        d_htmp[d_idx] = 0.0
        d_n[d_idx] = 0.0
        d_dndh[d_idx] = 0.0
        d_dpsumdh[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_p, d_rho, d_e, d_m, d_cs, d_u, d_v,
             d_w, d_wij, d_htmp, s_p, s_rho, s_e, s_m, s_cs, s_h, s_u,
             s_v, s_w, WI, s_n, d_n, d_dndh, s_dndh, d_dpsumdh,
             s_dpsumdh):
        d_wij[d_idx] += WI
        d_p[d_idx] += s_p[s_idx] * WI
        d_u[d_idx] -= s_u[s_idx] * WI
        d_v[d_idx] -= s_v[s_idx] * WI
        d_w[d_idx] -= s_w[s_idx] * WI
        d_m[d_idx] += s_m[s_idx] * WI
        d_rho[d_idx] += s_rho[s_idx] * WI
        d_e[d_idx] += s_e[s_idx] * WI
        d_cs[d_idx] += s_cs[s_idx] * WI
        d_htmp[d_idx] += s_h[s_idx] * WI
        d_n[d_idx] += s_n[s_idx] * WI
        d_dndh[d_idx] += s_dndh[s_idx] * WI
        d_dpsumdh[d_idx] += s_dpsumdh[s_idx] * WI

    def post_loop(self, d_idx, d_p, d_rho, d_e, d_m, d_cs, d_h, d_u,
                  d_v, d_w, d_wij, d_htmp, d_dndh, d_dpsumdh, d_n,
                  d_m0):
        ok = d_wij[d_idx] > 1e-30
        w = jnp.where(ok, d_wij[d_idx], 1.0)
        for view in (d_p, d_u, d_v, d_w, d_m, d_rho, d_e, d_cs, d_n,
                     d_dndh, d_dpsumdh):
            view[d_idx] = jnp.where(ok, view[d_idx] / w, view[d_idx])
        d_h[d_idx] = jnp.where(ok, d_htmp[d_idx] / w, d_h[d_idx])
        d_m[d_idx] = jnp.where(d_m[d_idx] < 1e-10, d_m0[d_idx],
                               d_m[d_idx])


class UpdateGhostProps(Equation):
    """Ghost copy (reference psph.py:849) — no-op; no mirrored ghosts
    in the grid engine."""

    def __init__(self, dest, sources=None, dim=2):
        super(UpdateGhostProps, self).__init__(dest, sources)
        self.dim = dim

    def initialize(self, d_idx):
        pass


class PECStep(IntegratorStep):
    """(reference psph.py:873) — same shape as the TSPH step."""

    def initialize(self, d_idx, d_x0, d_y0, d_z0, d_x, d_y, d_z, d_h,
                   d_u0, d_v0, d_w0, d_u, d_v, d_w, d_e, d_e0, d_h0,
                   d_converged, d_rho, d_rho0, d_n, d_n0):
        d_x0[d_idx] = d_x[d_idx]
        d_y0[d_idx] = d_y[d_idx]
        d_z0[d_idx] = d_z[d_idx]
        d_u0[d_idx] = d_u[d_idx]
        d_v0[d_idx] = d_v[d_idx]
        d_w0[d_idx] = d_w[d_idx]
        d_e0[d_idx] = d_e[d_idx]
        d_h0[d_idx] = d_h[d_idx]
        d_rho0[d_idx] = d_rho[d_idx]
        d_n0[d_idx] = d_n[d_idx]
        d_converged[d_idx] = 0.0

    def stage1(self, d_idx, d_x0, d_y0, d_z0, d_x, d_y, d_z, d_u0,
               d_v0, d_w0, d_u, d_v, d_w, d_e0, d_e, d_au, d_av, d_aw,
               d_ae, d_rho, d_rho0, d_arho, d_h, d_h0, d_ah, dt, d_n,
               d_n0, d_an):
        dtb2 = 0.5 * dt
        d_u[d_idx] = d_u0[d_idx] + dtb2 * d_au[d_idx]
        d_v[d_idx] = d_v0[d_idx] + dtb2 * d_av[d_idx]
        d_w[d_idx] = d_w0[d_idx] + dtb2 * d_aw[d_idx]
        d_x[d_idx] = d_x0[d_idx] + dtb2 * d_u[d_idx]
        d_y[d_idx] = d_y0[d_idx] + dtb2 * d_v[d_idx]
        d_z[d_idx] = d_z0[d_idx] + dtb2 * d_w[d_idx]
        d_e[d_idx] = d_e0[d_idx] + dtb2 * d_ae[d_idx]
        d_h[d_idx] = d_h0[d_idx] + dtb2 * d_ah[d_idx]
        d_rho[d_idx] = d_rho0[d_idx] + dtb2 * d_arho[d_idx]
        d_n[d_idx] = d_n0[d_idx] + dtb2 * d_an[d_idx]

    def stage2(self, d_idx, d_x0, d_y0, d_z0, d_x, d_y, d_z, d_u0,
               d_v0, d_w0, d_u, d_v, d_w, d_e0, d_e, d_au, d_av, d_aw,
               d_ae, dt):
        d_u[d_idx] = d_u0[d_idx] + dt * d_au[d_idx]
        d_v[d_idx] = d_v0[d_idx] + dt * d_av[d_idx]
        d_w[d_idx] = d_w0[d_idx] + dt * d_aw[d_idx]
        d_x[d_idx] = d_x0[d_idx] + dt * d_u[d_idx]
        d_y[d_idx] = d_y0[d_idx] + dt * d_v[d_idx]
        d_z[d_idx] = d_z0[d_idx] + dt * d_w[d_idx]
        d_e[d_idx] = d_e0[d_idx] + dt * d_ae[d_idx]


class PSPHScheme(Scheme):
    """(reference psph.py:28)"""

    def __init__(self, fluids, solids, dim, gamma, hfact, betab=2.0,
                 fkern=1.0, max_density_iterations=250, alphac=0.25,
                 density_iteration_tolerance=1e-3, has_ghosts=False,
                 alphamin=0.02, alphamax=2.0, betac=0.7, betad=0.05,
                 betaxi=1.0):
        self.fluids = fluids
        self.solids = solids
        self.dim = dim
        self.solver = None
        self.gamma = gamma
        self.betab = betab
        self.hfact = hfact
        self.density_iteration_tolerance = density_iteration_tolerance
        self.max_density_iterations = max_density_iterations
        self.has_ghosts = has_ghosts
        self.fkern = fkern
        self.alphac = alphac
        self.alphamin = alphamin
        self.alphamax = alphamax
        self.betac = betac
        self.betad = betad
        self.betaxi = betaxi

    def add_user_options(self, group):
        group.add_argument('--alpha-max', action='store', type=float,
                           dest='alphamax', default=None,
                           help='alpha_max for the AV switch.')
        group.add_argument('--alpha-min', action='store', type=float,
                           dest='alphamin', default=None,
                           help='alpha_min for the AV switch.')
        group.add_argument('--beta-b', action='store', type=float,
                           dest='betab', default=None,
                           help='beta for the artificial viscosity.')
        group.add_argument('--beta-xi', action='store', type=float,
                           dest='betaxi', default=None,
                           help='beta_xi for the AV switch.')
        group.add_argument('--beta-d', action='store', type=float,
                           dest='betad', default=None,
                           help='beta_d for the AV switch.')
        group.add_argument('--beta-c', action='store', type=float,
                           dest='betac', default=None,
                           help='beta_c for the AV switch.')
        group.add_argument('--alpha-c', action='store', type=float,
                           dest='alphac', default=None,
                           help='alpha_c artificial conductivity.')
        group.add_argument('--gamma', action='store', type=float,
                           dest='gamma', default=None,
                           help='gamma for the state equation.')

    def consume_user_options(self, options):
        data = dict((var, self._smart_getattr(options, var)) for var in
                    ('gamma', 'alphamax', 'alphamin', 'alphac',
                     'betab', 'betaxi', 'betad', 'betac'))
        self.configure(**data)

    def configure_solver(self, kernel=None, integrator_cls=None,
                         extra_steppers=None, **kw):
        from pysph_tpu.base.kernels import Gaussian
        from pysph_tpu.sph.integrator import PECIntegrator
        from pysph_tpu.solver.solver import Solver
        if kernel is None:
            kernel = Gaussian(dim=self.dim)
        self.fkern = getattr(kernel, 'fkern', 1.0)
        steppers = {}
        if extra_steppers is not None:
            steppers.update(extra_steppers)
        cls = integrator_cls if integrator_cls is not None else \
            PECIntegrator
        for name in self.fluids:
            if name not in steppers:
                steppers[name] = PECStep()
        integrator = cls(**steppers)
        self.solver = Solver(dim=self.dim, integrator=integrator,
                             kernel=kernel, **kw)

    def get_equations(self):
        from pysph_tpu.sph.equation import Group
        all_pa = self.fluids + self.solids
        equations = []
        equations.append(Group(equations=[
            PSPHSummationDensityAndPressure(
                dest=f, sources=all_pa, hfact=self.hfact,
                density_iterations=True, dim=self.dim,
                htol=self.density_iteration_tolerance,
                gamma=self.gamma)
            for f in self.fluids], update_nnps=True, iterate=True,
            max_iterations=self.max_density_iterations))
        g2 = []
        for f in self.fluids:
            g2.append(GradientKinsfolkC1(dest=f, sources=all_pa,
                                         dim=self.dim))
            g2.append(SignalVelocity(dest=f, sources=all_pa))
        equations.append(Group(equations=g2))
        equations.append(Group(equations=[
            LimiterAndAlphas(dest=f, sources=all_pa,
                             alphamin=self.alphamin,
                             alphamax=self.alphamax, betac=self.betac,
                             betad=self.betad, betaxi=self.betaxi,
                             fkern=self.fkern)
            for f in self.fluids]))
        if self.solids:
            equations.append(Group(equations=[
                WallBoundary(s, sources=self.fluids)
                for s in self.solids]))
        if self.has_ghosts:
            equations.append(Group(equations=[
                UpdateGhostProps(dest=f, sources=None)
                for f in self.fluids], real=False))
        equations.append(Group(equations=[
            MomentumAndEnergy(dest=f, sources=all_pa, dim=self.dim,
                              betab=self.betab, fkern=self.fkern,
                              alphac=self.alphac, gamma=self.gamma)
            for f in self.fluids]))
        return equations

    def setup_properties(self, particles, clean=True):
        import numpy
        particle_arrays = dict((p.name, p) for p in particles)
        props = ['rho', 'm', 'x', 'y', 'z', 'u', 'v', 'w', 'h', 'cs',
                 'p', 'e', 'au', 'av', 'aw', 'ae', 'pid', 'gid',
                 'tag', 'dwdh', 'h0', 'converged', 'ah', 'arho', 'e0',
                 'rho0', 'u0', 'v0', 'w0', 'x0', 'y0', 'z0', 'alpha',
                 'alpha0', 'n', 'dndh', 'prevn', 'prevdndh',
                 'dpsumdh', 'dprevpsumdh', 'divv', 'adivv', 'vsig',
                 'xi', 'trssdsst', 'an', 'n0', 'dt_cfl']
        output_props = 'rho p u v w x y z e n divv h alpha'.split()
        for fluid in self.fluids:
            pa = particle_arrays[fluid]
            self._ensure_properties(pa, props, clean)
            pa.add_property('orig_idx', type='int')
            pa.add_property('n', data=numpy.asarray(pa.rho) /
                            numpy.asarray(pa.m))
            pa.add_property('gradv', stride=9)
            pa.add_property('invtt', stride=9)
            pa.add_property('grada', stride=9)
            pa.add_property('ss', stride=6)
            pa.orig_idx = numpy.arange(pa.get_number_of_particles())
            pa.set_output_arrays(output_props)
        solid_props = set(props) | set('m0 wij htmp'.split())
        for solid in self.solids:
            pa = particle_arrays[solid]
            self._ensure_properties(pa, solid_props, clean)
            pa.set_output_arrays(output_props)
