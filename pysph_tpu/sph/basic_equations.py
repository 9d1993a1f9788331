"""Basic SPH equations (parity with
/root/reference/pysph/sph/basic_equations.py).

Each equation keeps the reference's method contract and math but is written
against batched pair arrays: scalars become ``(N, K)`` arrays, branches
become ``jnp.where``.
"""

import jax.numpy as jnp

from pysph_tpu.sph.equation import Equation


class SummationDensity(Equation):
    r"""rho_a = sum_b m_b W_ab  (reference basic_equations.py:19)."""

    def initialize(self, d_idx, d_rho):
        d_rho[d_idx] = 0.0

    def loop(self, d_idx, d_rho, s_idx, s_m, WIJ):
        d_rho[d_idx] += s_m[s_idx] * WIJ


class BodyForce(Equation):
    """Constant body force per unit mass (reference basic_equations.py:32)."""

    def __init__(self, dest, sources, fx=0.0, fy=0.0, fz=0.0):
        self.fx = fx
        self.fy = fy
        self.fz = fz
        super(BodyForce, self).__init__(dest, sources)

    def initialize(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0

    def loop(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] += self.fx
        d_av[d_idx] += self.fy
        d_aw[d_idx] += self.fz


class VelocityGradient2D(Equation):
    """SPH velocity gradient tensor in 2D (reference basic_equations.py:67).

    d_v01 is dv0/dx1 stored in properties v00, v01, v10, v11."""

    def initialize(self, d_idx, d_v00, d_v01, d_v10, d_v11):
        d_v00[d_idx] = 0.0
        d_v01[d_idx] = 0.0
        d_v10[d_idx] = 0.0
        d_v11[d_idx] = 0.0

    def loop(self, d_idx, s_idx, s_m, s_rho,
             d_v00, d_v01, d_v10, d_v11, DWIJ, VIJ):
        tmp = s_m[s_idx] / s_rho[s_idx]
        d_v00[d_idx] += tmp * -VIJ[0] * DWIJ[0]
        d_v01[d_idx] += tmp * -VIJ[0] * DWIJ[1]
        d_v10[d_idx] += tmp * -VIJ[1] * DWIJ[0]
        d_v11[d_idx] += tmp * -VIJ[1] * DWIJ[1]


class VelocityGradient3D(Equation):
    """SPH velocity gradient tensor in 3D (reference basic_equations.py:101).
    """

    def initialize(self, d_idx, d_v00, d_v01, d_v02, d_v10, d_v11, d_v12,
                   d_v20, d_v21, d_v22):
        d_v00[d_idx] = 0.0
        d_v01[d_idx] = 0.0
        d_v02[d_idx] = 0.0
        d_v10[d_idx] = 0.0
        d_v11[d_idx] = 0.0
        d_v12[d_idx] = 0.0
        d_v20[d_idx] = 0.0
        d_v21[d_idx] = 0.0
        d_v22[d_idx] = 0.0

    def loop(self, d_idx, s_idx, s_m, s_rho,
             d_v00, d_v01, d_v02, d_v10, d_v11, d_v12,
             d_v20, d_v21, d_v22, DWIJ, VIJ):
        tmp = s_m[s_idx] / s_rho[s_idx]
        d_v00[d_idx] += tmp * -VIJ[0] * DWIJ[0]
        d_v01[d_idx] += tmp * -VIJ[0] * DWIJ[1]
        d_v02[d_idx] += tmp * -VIJ[0] * DWIJ[2]
        d_v10[d_idx] += tmp * -VIJ[1] * DWIJ[0]
        d_v11[d_idx] += tmp * -VIJ[1] * DWIJ[1]
        d_v12[d_idx] += tmp * -VIJ[1] * DWIJ[2]
        d_v20[d_idx] += tmp * -VIJ[2] * DWIJ[0]
        d_v21[d_idx] += tmp * -VIJ[2] * DWIJ[1]
        d_v22[d_idx] += tmp * -VIJ[2] * DWIJ[2]


class IsothermalEOS(Equation):
    """p = p0 + c0^2 (rho - rho0)  (reference basic_equations.py:151)."""

    def __init__(self, dest, sources, rho0, c0, p0):
        self.rho0 = rho0
        self.c0 = c0
        self.c02 = c0 * c0
        self.p0 = p0
        super(IsothermalEOS, self).__init__(dest, sources)

    def loop(self, d_idx, d_rho, d_p):
        d_p[d_idx] = self.p0 + self.c02 * (d_rho[d_idx] - self.rho0)


class ContinuityEquation(Equation):
    """drho_a/dt = sum_b m_b v_ab . grad W_ab
    (reference basic_equations.py:180)."""

    def initialize(self, d_idx, d_arho):
        d_arho[d_idx] = 0.0

    def loop(self, d_idx, d_arho, s_idx, s_m, DWIJ, VIJ):
        vijdotdwij = (DWIJ[0] * VIJ[0] + DWIJ[1] * VIJ[1] +
                      DWIJ[2] * VIJ[2])
        d_arho[d_idx] += s_m[s_idx] * vijdotdwij


class MonaghanArtificialViscosity(Equation):
    """Monaghan artificial viscosity (reference basic_equations.py:195)."""

    def __init__(self, dest, sources, alpha=1.0, beta=1.0):
        self.alpha = alpha
        self.beta = beta
        super(MonaghanArtificialViscosity, self).__init__(dest, sources)

    def initialize(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_rho, d_cs, d_au, d_av, d_aw, s_m,
             s_rho, s_cs, VIJ, XIJ, HIJ, R2IJ, RHOIJ1, EPS, DWIJ):
        vijdotxij = (VIJ[0] * XIJ[0] + VIJ[1] * XIJ[1] + VIJ[2] * XIJ[2])
        cij = 0.5 * (d_cs[d_idx] + s_cs[s_idx])
        muij = (HIJ * vijdotxij) / (R2IJ + EPS)
        piij = (-self.alpha * cij * muij + self.beta * muij * muij) * RHOIJ1
        piij = jnp.where(vijdotxij < 0, piij, 0.0)
        d_au[d_idx] += -s_m[s_idx] * piij * DWIJ[0]
        d_av[d_idx] += -s_m[s_idx] * piij * DWIJ[1]
        d_aw[d_idx] += -s_m[s_idx] * piij * DWIJ[2]


class XSPHCorrection(Equation):
    """XSPH position stepping (reference basic_equations.py:260): writes
    the corrected advection velocity into ax, ay, az."""

    def __init__(self, dest, sources, eps=0.5):
        self.eps = eps
        super(XSPHCorrection, self).__init__(dest, sources)

    def initialize(self, d_idx, d_ax, d_ay, d_az):
        d_ax[d_idx] = 0.0
        d_ay[d_idx] = 0.0
        d_az[d_idx] = 0.0

    def loop(self, s_idx, d_idx, s_m, d_ax, d_ay, d_az, WIJ, RHOIJ1, VIJ):
        tmp = -self.eps * s_m[s_idx] * WIJ * RHOIJ1
        d_ax[d_idx] += tmp * VIJ[0]
        d_ay[d_idx] += tmp * VIJ[1]
        d_az[d_idx] += tmp * VIJ[2]

    def post_loop(self, d_idx, d_ax, d_ay, d_az, d_u, d_v, d_w):
        d_ax[d_idx] += d_u[d_idx]
        d_ay[d_idx] += d_v[d_idx]
        d_az[d_idx] += d_w[d_idx]


class XSPHCorrectionForLeapFrog(Equation):
    """XSPH correction only (reference basic_equations.py:303)."""

    def __init__(self, dest, sources, eps=0.5):
        self.eps = eps
        super(XSPHCorrectionForLeapFrog, self).__init__(dest, sources)

    def initialize(self, d_idx, d_ax, d_ay, d_az):
        d_ax[d_idx] = 0.0
        d_ay[d_idx] = 0.0
        d_az[d_idx] = 0.0

    def loop(self, s_idx, d_idx, s_m, d_ax, d_ay, d_az, WIJ, RHOIJ1, VIJ):
        tmp = -self.eps * s_m[s_idx] * WIJ * RHOIJ1
        d_ax[d_idx] += tmp * VIJ[0]
        d_ay[d_idx] += tmp * VIJ[1]
        d_az[d_idx] += tmp * VIJ[2]
