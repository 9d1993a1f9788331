"""Surface tension equations (parity with
/root/reference/pysph/sph/surface_tension.py): CSF, Adami (stress and
curvature forms), Shadloo-Yildiz and Morris formulations, plus
``get_surface_tension_equations`` assembling them."""

import jax.numpy as jnp

from pysph_tpu.sph.equation import Equation, Group
from pysph_tpu.sph.gas_dynamics.basic import ScaleSmoothingLength  # noqa
from pysph_tpu.sph.wc.basic import TaitEOS  # noqa: F401 (assembly)
from pysph_tpu.sph.wc.transport_velocity import (  # noqa: F401
    MomentumEquationArtificialStress, MomentumEquationPressureGradient,
    MomentumEquationViscosity, SolidWallNoSlipBC, StateEquation,
    SummationDensity)


class SurfaceForceAdami(Equation):
    """Divergence of the surface stress tensor
    (reference surface_tension.py:41)."""

    def initialize(self, d_au, d_av, d_idx):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0

    def loop(self, d_au, d_av, d_aw, d_idx, d_m, DWIJ, d_pi00, d_pi01,
             d_pi02, d_pi10, d_pi11, d_pi12, d_pi20, d_pi21, d_pi22,
             s_pi00, s_pi01, s_pi02, s_pi10, s_pi11, s_pi12, s_pi20,
             s_pi21, s_pi22, d_V, s_V, s_idx):
        d2 = d_V[d_idx] * d_V[d_idx]
        s2 = s_V[s_idx] * s_V[s_idx]
        f = {}
        pairs = {'00': (d_pi00, s_pi00), '01': (d_pi01, s_pi01),
                 '02': (d_pi02, s_pi02), '10': (d_pi10, s_pi10),
                 '11': (d_pi11, s_pi11), '12': (d_pi12, s_pi12),
                 '20': (d_pi20, s_pi20), '21': (d_pi21, s_pi21),
                 '22': (d_pi22, s_pi22)}
        for k, (dv, sv) in pairs.items():
            f[k] = dv[d_idx] / d2 + sv[s_idx] / s2
        mi1 = 1.0 / d_m[d_idx]
        d_au[d_idx] += (DWIJ[0] * f['00'] + DWIJ[1] * f['10'] +
                        DWIJ[2] * f['20']) * mi1
        d_av[d_idx] += (DWIJ[0] * f['01'] + DWIJ[1] * f['11'] +
                        DWIJ[2] * f['21']) * mi1
        d_aw[d_idx] += (DWIJ[0] * f['02'] + DWIJ[1] * f['12'] +
                        DWIJ[2] * f['22']) * mi1


class ConstructStressMatrix(Equation):
    """Surface stress tensor from the color gradient
    (reference surface_tension.py:65)."""

    def __init__(self, dest, sources, sigma, d=2):
        self.sigma = sigma
        self.d = d
        super(ConstructStressMatrix, self).__init__(dest, sources)

    def initialize(self, d_pi00, d_pi01, d_pi02, d_pi10, d_pi11,
                   d_pi12, d_pi20, d_pi21, d_pi22, d_cx, d_cy, d_cz,
                   d_idx, d_N):
        cx, cy, cz = d_cx[d_idx], d_cy[d_idx], d_cz[d_idx]
        mod2 = cx * cx + cy * cy + cz * cz
        mod = jnp.sqrt(mod2)
        ok = mod > 1e-14
        factor = jnp.where(ok, self.sigma / jnp.where(ok, mod, 1.0),
                           0.0)
        d_N[d_idx] = jnp.where(ok, 1.0, 0.0)
        d_pi00[d_idx] = (-cx * cx + mod2 / self.d) * factor
        d_pi01[d_idx] = -factor * cx * cy
        d_pi02[d_idx] = -factor * cx * cz
        d_pi10[d_idx] = -factor * cx * cy
        d_pi11[d_idx] = (-cy * cy + mod2 / self.d) * factor
        d_pi12[d_idx] = -factor * cy * cz
        d_pi20[d_idx] = -factor * cx * cz
        d_pi21[d_idx] = -factor * cy * cz
        d_pi22[d_idx] = (-cz * cz + mod2 / self.d) * factor


class ColorGradientAdami(Equation):
    """Color gradient via number densities
    (reference surface_tension.py:105)."""

    def initialize(self, d_idx, d_cx, d_cy, d_cz):
        d_cx[d_idx] = 0.0
        d_cy[d_idx] = 0.0
        d_cz[d_idx] = 0.0

    def loop(self, d_idx, d_cx, d_cy, d_cz, d_V, s_V, d_color,
             s_color, DWIJ, s_idx):
        c_i = d_color[d_idx] / (d_V[d_idx] * d_V[d_idx])
        c_j = s_color[s_idx] / (s_V[s_idx] * s_V[s_idx])
        factor = d_V[d_idx] * (c_i + c_j)
        d_cx[d_idx] += factor * DWIJ[0]
        d_cy[d_idx] += factor * DWIJ[1]
        d_cz[d_idx] += factor * DWIJ[2]


class MomentumEquationViscosityAdami(Equation):
    """Viscous force with harmonic-mean viscosity
    (reference surface_tension.py:122)."""

    def initialize(self, d_au, d_av, d_aw, d_idx):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0

    def loop(self, d_idx, d_V, d_au, d_av, d_aw, s_V, DWIJ, s_idx,
             d_m, R2IJ, XIJ, EPS, VIJ, d_nu, s_nu):
        factor = 2.0 * d_nu[d_idx] * s_nu[s_idx] / \
            (d_nu[d_idx] + s_nu[s_idx])
        V_i = 1 / (d_V[d_idx] * d_V[d_idx])
        V_j = 1 / (s_V[s_idx] * s_V[s_idx])
        dwijdotrij = (DWIJ[0] * XIJ[0] + DWIJ[1] * XIJ[1] +
                      DWIJ[2] * XIJ[2]) / (R2IJ + EPS)
        factor = factor * (V_i + V_j) * dwijdotrij / d_m[d_idx]
        d_au[d_idx] += factor * VIJ[0]
        d_av[d_idx] += factor * VIJ[1]
        d_aw[d_idx] += factor * VIJ[2]


class MomentumEquationPressureGradientHuAdams(Equation):
    """Hu-Adams pressure gradient (reference surface_tension.py:142)."""

    def __init__(self, dest, sources, gx=0.0, gy=0.0, gz=0.0):
        self.gx = gx
        self.gy = gy
        self.gz = gz
        super(MomentumEquationPressureGradientHuAdams, self).__init__(
            dest, sources)

    def initialize(self, d_au, d_av, d_aw, d_idx):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0

    def loop(self, d_idx, d_V, d_au, d_av, d_aw, s_V, d_p, s_p, DWIJ,
             s_idx, d_m):
        p_i = d_p[d_idx] / (d_V[d_idx] * d_V[d_idx])
        p_j = s_p[s_idx] / (s_V[s_idx] * s_V[s_idx])
        mi1 = 1.0 / d_m[d_idx]
        d_au[d_idx] += -(p_i + p_j) * DWIJ[0] * mi1
        d_av[d_idx] += -(p_i + p_j) * DWIJ[1] * mi1
        d_aw[d_idx] += -(p_i + p_j) * DWIJ[2] * mi1

    def post_loop(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] += self.gx
        d_av[d_idx] += self.gy
        d_aw[d_idx] += self.gz


class MomentumEquationPressureGradientAdami(Equation):
    """Adami density-weighted pressure gradient
    (reference surface_tension.py:170)."""

    def __init__(self, dest, sources, gx=0.0, gy=0.0, gz=0.0):
        self.gx = gx
        self.gy = gy
        self.gz = gz
        super(MomentumEquationPressureGradientAdami, self).__init__(
            dest, sources)

    def initialize(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_m, d_rho, s_rho, d_au, d_av, d_aw,
             d_p, s_p, d_V, s_V, DWIJ):
        rhoi = d_rho[d_idx]
        rhoj = s_rho[s_idx]
        pij = (rhoj * d_p[d_idx] + rhoi * s_p[s_idx]) / (rhoj + rhoi)
        Vi = 1.0 / d_V[d_idx]
        Vj = 1.0 / s_V[s_idx]
        tmp = -pij / d_m[d_idx] * (Vi * Vi + Vj * Vj)
        d_au[d_idx] += tmp * DWIJ[0]
        d_av[d_idx] += tmp * DWIJ[1]
        d_aw[d_idx] += tmp * DWIJ[2]

    def post_loop(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] += self.gx
        d_av[d_idx] += self.gy
        d_aw[d_idx] += self.gz


class MomentumEquationViscosityMorris(Equation):
    """Morris viscosity (reference surface_tension.py:218)."""

    def __init__(self, dest, sources, eta=0.01):
        self.eta = eta * eta
        super(MomentumEquationViscosityMorris, self).__init__(dest,
                                                              sources)

    def loop(self, d_idx, s_idx, d_au, d_av, d_aw, s_m, d_nu, s_nu,
             d_rho, s_rho, DWIJ, R2IJ, VIJ, HIJ, XIJ):
        r2 = R2IJ + self.eta * HIJ * HIJ
        dw = (DWIJ[0] * XIJ[0] + DWIJ[1] * XIJ[1] +
              DWIJ[2] * XIJ[2]) / r2
        mult = s_m[s_idx] * (d_nu[d_idx] + s_nu[s_idx]) / \
            (d_rho[d_idx] * s_rho[s_idx])
        d_au[d_idx] += dw * mult * VIJ[0]
        d_av[d_idx] += dw * mult * VIJ[1]
        d_aw[d_idx] += dw * mult * VIJ[2]


class MomentumEquationPressureGradientMorris(Equation):
    """Morris pressure gradient (reference surface_tension.py:235)."""

    def initialize(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_au, d_av, d_aw, s_m, d_p, s_p,
             DWIJ, d_rho, s_rho):
        factor = -s_m[s_idx] * (d_p[d_idx] + s_p[s_idx]) / \
            (d_rho[d_idx] * s_rho[s_idx])
        d_au[d_idx] += factor * DWIJ[0]
        d_av[d_idx] += factor * DWIJ[1]
        d_aw[d_idx] += factor * DWIJ[2]


class InterfaceCurvatureFromDensity(Equation):
    """Curvature from the divergence of normals weighted by density
    (reference surface_tension.py:251)."""

    def __init__(self, dest, sources, with_morris_correction=True):
        self.with_morris_correction = with_morris_correction
        super(InterfaceCurvatureFromDensity, self).__init__(dest,
                                                            sources)

    def initialize(self, d_idx, d_kappa, d_wij_sum):
        d_kappa[d_idx] = 0.0
        d_wij_sum[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_kappa, d_nx, d_ny, d_nz, s_nx,
             s_ny, s_nz, d_N, s_N, d_wij_sum, s_rho, s_m, WIJ, DWIJ):
        nijdotdwij = ((d_nx[d_idx] - s_nx[s_idx]) * DWIJ[0] +
                      (d_ny[d_idx] - s_ny[s_idx]) * DWIJ[1] +
                      (d_nz[d_idx] - s_nz[s_idx]) * DWIJ[2])
        tmp = 1.0
        if self.with_morris_correction:
            tmp = jnp.minimum(d_N[d_idx], s_N[s_idx])
        d_wij_sum[d_idx] += tmp * s_m[s_idx] / s_rho[s_idx] * WIJ
        d_kappa[d_idx] += tmp * nijdotdwij * s_m[s_idx] / s_rho[s_idx]

    def post_loop(self, d_idx, d_wij_sum, d_nx, d_kappa):
        if self.with_morris_correction:
            has = d_wij_sum[d_idx] > 1e-12
            d_kappa[d_idx] = jnp.where(
                has, d_kappa[d_idx] / jnp.where(has, d_wij_sum[d_idx],
                                                1.0), d_kappa[d_idx])


class SolidWallPressureBCnoDensity(Equation):
    """Wall pressure extrapolation without density update
    (reference surface_tension.py:284)."""

    def initialize(self, d_idx, d_p, d_wij):
        d_p[d_idx] = 0.0
        d_wij[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_p, s_p, d_wij, WIJ):
        d_p[d_idx] += s_p[s_idx] * WIJ
        d_wij[d_idx] += WIJ

    def post_loop(self, d_idx, d_wij, d_p, d_rho):
        has = d_wij[d_idx] > 1e-14
        d_p[d_idx] = jnp.where(
            has, d_p[d_idx] / jnp.where(has, d_wij[d_idx], 1.0),
            d_p[d_idx])


class SummationDensitySourceMass(Equation):
    """Summation density using the dest mass
    (reference surface_tension.py:302)."""

    def initialize(self, d_idx, d_V, d_rho):
        d_rho[d_idx] = 0.0

    def loop(self, d_idx, d_rho, d_m, WIJ, s_idx):
        d_rho[d_idx] += d_m[d_idx] * WIJ

    def post_loop(self, d_idx, d_V, d_rho, d_m):
        d_V[d_idx] = d_rho[d_idx] / d_m[d_idx]


class SmoothedColor(Equation):
    """Smoothed color, eq. (17) in [JM00]
    (reference surface_tension.py:314)."""

    def initialize(self, d_idx, d_scolor):
        d_scolor[d_idx] = 0.0

    def loop(self, d_idx, s_idx, s_rho, s_m, s_color, d_scolor, WIJ):
        d_scolor[d_idx] += s_m[s_idx] / s_rho[s_idx] * \
            s_color[s_idx] * WIJ


def _normals_from_gradc(d_idx, d_cx, d_cy, d_cz, d_nx, d_ny, d_nz,
                        d_N, d_ddelta, epsilon2):
    mod2 = (d_cx[d_idx] ** 2 + d_cy[d_idx] ** 2 + d_cz[d_idx] ** 2)
    ok = mod2 > epsilon2
    inv = 1.0 / jnp.sqrt(jnp.where(ok, mod2, 1.0))
    d_N[d_idx] = jnp.where(ok, 1.0, 0.0)
    d_nx[d_idx] = jnp.where(ok, d_cx[d_idx] * inv, 0.0)
    d_ny[d_idx] = jnp.where(ok, d_cy[d_idx] * inv, 0.0)
    d_nz[d_idx] = jnp.where(ok, d_cz[d_idx] * inv, 0.0)
    d_ddelta[d_idx] = jnp.where(ok, 1.0 / inv, 0.0)


class ColorGradientUsingNumberDensity(Equation):
    """Color gradient via number density, eq. (13) in [SY11]
    (reference surface_tension.py:336)."""

    def __init__(self, dest, sources, epsilon=1e-6):
        self.epsilon2 = epsilon * epsilon
        super(ColorGradientUsingNumberDensity, self).__init__(dest,
                                                              sources)

    def initialize(self, d_idx, d_cx, d_cy, d_cz, d_nx, d_ny, d_nz,
                   d_ddelta, d_N):
        for v in (d_cx, d_cy, d_cz, d_nx, d_ny, d_nz, d_ddelta, d_N):
            v[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_scolor, s_scolor, d_cx, d_cy, d_cz,
             d_V, s_V, DWIJ):
        psiab1 = 2.0 / (d_V[d_idx] + s_V[s_idx])
        Cba = (s_scolor[s_idx] - d_scolor[d_idx]) * psiab1
        d_cx[d_idx] += Cba * DWIJ[0]
        d_cy[d_idx] += Cba * DWIJ[1]
        d_cz[d_idx] += Cba * DWIJ[2]

    def post_loop(self, d_idx, d_cx, d_cy, d_cz, d_nx, d_ny, d_nz,
                  d_N, d_ddelta):
        _normals_from_gradc(d_idx, d_cx, d_cy, d_cz, d_nx, d_ny, d_nz,
                            d_N, d_ddelta, self.epsilon2)


class MorrisColorGradient(Equation):
    """Color gradient, eq. (17) of [JM00]
    (reference surface_tension.py:416)."""

    def __init__(self, dest, sources, epsilon=1e-6):
        self.epsilon2 = epsilon * epsilon
        super(MorrisColorGradient, self).__init__(dest, sources)

    def initialize(self, d_idx, d_cx, d_cy, d_cz, d_nx, d_ny, d_nz,
                   d_ddelta, d_N):
        for v in (d_cx, d_cy, d_cz, d_nx, d_ny, d_nz, d_ddelta, d_N):
            v[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_scolor, s_scolor, d_cx, d_cy, d_cz,
             s_m, s_rho, DWIJ):
        Cba = (s_scolor[s_idx] - d_scolor[d_idx]) * \
            s_m[s_idx] / s_rho[s_idx]
        d_cx[d_idx] += Cba * DWIJ[0]
        d_cy[d_idx] += Cba * DWIJ[1]
        d_cz[d_idx] += Cba * DWIJ[2]

    def post_loop(self, d_idx, d_cx, d_cy, d_cz, d_nx, d_ny, d_nz,
                  d_N, d_ddelta):
        _normals_from_gradc(d_idx, d_cx, d_cy, d_cz, d_nx, d_ny, d_nz,
                            d_N, d_ddelta, self.epsilon2)


class SY11ColorGradient(Equation):
    """SY11 color gradient (reference surface_tension.py:490)."""

    def __init__(self, dest, sources, epsilon=1e-6):
        self.epsilon2 = epsilon * epsilon
        super(SY11ColorGradient, self).__init__(dest, sources)

    def initialize(self, d_idx, d_cx, d_cy, d_cz, d_nx, d_ny, d_nz,
                   d_ddelta, d_N):
        for v in (d_cx, d_cy, d_cz, d_nx, d_ny, d_nz, d_ddelta, d_N):
            v[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_color, s_color, d_cx, d_cy, d_cz,
             d_V, s_V, DWIJ):
        psiab1 = 2.0 / (d_V[d_idx] + s_V[s_idx])
        Cba = (s_color[s_idx] - d_color[d_idx]) * psiab1
        d_cx[d_idx] += Cba * DWIJ[0]
        d_cy[d_idx] += Cba * DWIJ[1]
        d_cz[d_idx] += Cba * DWIJ[2]

    def post_loop(self, d_idx, d_cx, d_cy, d_cz, d_nx, d_ny, d_nz,
                  d_N, d_ddelta):
        _normals_from_gradc(d_idx, d_cx, d_cy, d_cz, d_nx, d_ny, d_nz,
                            d_N, d_ddelta, self.epsilon2)


class SY11DiracDelta(Equation):
    """SY11 discretized Dirac delta, eq. (14)
    (reference surface_tension.py:565)."""

    def __init__(self, dest, sources, epsilon=1e-6):
        self.epsilon2 = epsilon * epsilon
        super(SY11DiracDelta, self).__init__(dest, sources)

    def initialize(self, d_idx, d_cx, d_cy, d_cz, d_ddelta):
        for v in (d_cx, d_cy, d_cz, d_ddelta):
            v[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_color, s_color, d_cx, d_cy, d_cz,
             d_V, s_V, DWIJ):
        psiab1 = 2.0 / (d_V[d_idx] + s_V[s_idx])
        Cba = (s_color[s_idx] - d_color[d_idx]) * psiab1
        d_cx[d_idx] += Cba * DWIJ[0]
        d_cy[d_idx] += Cba * DWIJ[1]
        d_cz[d_idx] += Cba * DWIJ[2]

    def post_loop(self, d_idx, d_cx, d_cy, d_cz, d_ddelta):
        mod2 = (d_cx[d_idx] ** 2 + d_cy[d_idx] ** 2 +
                d_cz[d_idx] ** 2)
        ok = mod2 > self.epsilon2
        d_ddelta[d_idx] = jnp.where(
            ok, jnp.sqrt(jnp.where(ok, mod2, 1.0)), d_ddelta[d_idx])


class InterfaceCurvatureFromNumberDensity(Equation):
    """Curvature via number density, eq. (15) in [SY11]
    (reference surface_tension.py:620)."""

    def __init__(self, dest, sources, with_morris_correction=True):
        self.with_morris_correction = with_morris_correction
        super(InterfaceCurvatureFromNumberDensity, self).__init__(
            dest, sources)

    def initialize(self, d_idx, d_kappa, d_wij_sum):
        d_kappa[d_idx] = 0.0
        d_wij_sum[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_kappa, d_nx, d_ny, d_nz, s_nx,
             s_ny, s_nz, d_V, s_V, d_N, s_N, d_wij_sum, s_rho, s_m,
             WIJ, DWIJ):
        nijdotdwij = ((d_nx[d_idx] - s_nx[s_idx]) * DWIJ[0] +
                      (d_ny[d_idx] - s_ny[s_idx]) * DWIJ[1] +
                      (d_nz[d_idx] - s_nz[s_idx]) * DWIJ[2])
        psiij1 = 2.0 / (d_V[d_idx] + s_V[s_idx])
        tmp = 1.0
        if self.with_morris_correction:
            tmp = jnp.minimum(d_N[d_idx], s_N[s_idx])
        d_wij_sum[d_idx] += tmp * s_m[s_idx] / s_rho[s_idx] * WIJ
        d_kappa[d_idx] += tmp * psiij1 * nijdotdwij

    def post_loop(self, d_idx, d_wij_sum, d_nx, d_kappa):
        if self.with_morris_correction:
            has = d_wij_sum[d_idx] > 1e-12
            d_kappa[d_idx] = jnp.where(
                has, d_kappa[d_idx] / jnp.where(has, d_wij_sum[d_idx],
                                                1.0), d_kappa[d_idx])


class ShadlooYildizSurfaceTensionForce(Equation):
    """Surface tension force, eq. (7,9) in [SY11]
    (reference surface_tension.py:668)."""

    def __init__(self, dest, sources, sigma=0.1):
        self.sigma = sigma
        super(ShadlooYildizSurfaceTensionForce, self).__init__(dest,
                                                               sources)

    def initialize(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0

    def loop(self, d_idx, d_au, d_av, d_aw, d_kappa, d_nx, d_ny, d_nz,
             d_m, d_rho, d_ddelta):
        tmp = self.sigma * d_kappa[d_idx] * d_ddelta[d_idx] / \
            d_rho[d_idx]
        d_au[d_idx] += tmp * d_nx[d_idx]
        d_av[d_idx] += tmp * d_ny[d_idx]
        d_aw[d_idx] += tmp * d_nz[d_idx]


class CSFSurfaceTensionForce(Equation):
    """CSF surface tension force, eq. (25) in [JM00]
    (reference surface_tension.py:708)."""

    def __init__(self, dest, sources, sigma=0.1):
        self.sigma = sigma
        super(CSFSurfaceTensionForce, self).__init__(dest, sources)

    def initialize(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0

    def loop(self, d_idx, d_au, d_av, d_aw, d_kappa, d_cx, d_cy, d_cz,
             d_rho):
        tmp = self.sigma * d_kappa[d_idx] / d_rho[d_idx]
        d_au[d_idx] += tmp * d_cx[d_idx]
        d_av[d_idx] += tmp * d_cy[d_idx]
        d_aw[d_idx] += tmp * d_cz[d_idx]


class AdamiReproducingDivergence(Equation):
    """Reproducing divergence for curvature, eq. (20) in [A10]
    (reference surface_tension.py:746)."""

    def __init__(self, dest, sources, dim):
        self.dim = dim
        super(AdamiReproducingDivergence, self).__init__(dest, sources)

    def initialize(self, d_idx, d_kappa, d_wij_sum):
        d_kappa[d_idx] = 0.0
        d_wij_sum[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_kappa, d_wij_sum, d_nx, d_ny, d_nz,
             s_nx, s_ny, s_nz, d_V, s_V, DWIJ, XIJ, RIJ, EPS, d_N,
             s_N, d_color, s_color):
        Vj = 1.0 / s_V[s_idx]
        color_diff = jnp.abs(d_color[d_idx] - s_color[s_idx])
        phi_ij = jnp.where(color_diff == 1.0, -1.0, 1.0)
        nijdotdwij = (
            (d_nx[d_idx] - phi_ij * s_nx[s_idx]) * DWIJ[0] +
            (d_ny[d_idx] - phi_ij * s_ny[s_idx]) * DWIJ[1] +
            (d_nz[d_idx] - phi_ij * s_nz[s_idx]) * DWIJ[2])
        xijdotdwij = (XIJ[0] * DWIJ[0] + XIJ[1] * DWIJ[1] +
                      XIJ[2] * DWIJ[2])
        tmp = jnp.minimum(d_N[d_idx], s_N[s_idx])
        d_kappa[d_idx] += tmp * nijdotdwij * Vj
        d_wij_sum[d_idx] += tmp * xijdotdwij * Vj

    def post_loop(self, d_idx, d_kappa, d_wij_sum):
        has = jnp.abs(d_wij_sum[d_idx]) > 1e-12
        d_kappa[d_idx] = jnp.where(
            has, d_kappa[d_idx] / jnp.where(has, d_wij_sum[d_idx],
                                            1.0), d_kappa[d_idx])
        d_kappa[d_idx] = d_kappa[d_idx] * self.dim


class CSFSurfaceTensionForceAdami(Equation):
    """CSF force with the Adami color gradient
    (reference surface_tension.py:795)."""

    def __init__(self, dest, sources, sigma):
        self.sigma = sigma
        super(CSFSurfaceTensionForceAdami, self).__init__(dest, sources)

    def initialize(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0

    def post_loop(self, d_idx, d_au, d_av, d_aw, d_kappa, d_cx, d_cy,
                  d_cz, d_m, d_rho):
        fac = -self.sigma * d_kappa[d_idx] / d_rho[d_idx]
        d_au[d_idx] += fac * d_cx[d_idx]
        d_av[d_idx] += fac * d_cy[d_idx]
        d_aw[d_idx] += fac * d_cz[d_idx]


class ShadlooViscosity(Equation):
    """Shadloo's viscosity (reference surface_tension.py:812)."""

    def __init__(self, dest, sources, alpha):
        self.alpha = alpha
        super(ShadlooViscosity, self).__init__(dest, sources)

    def initialize(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0

    def loop(self, d_idx, d_au, d_av, d_aw, d_h, s_idx, s_h, d_cs,
             s_cs, d_rho, s_rho, VIJ, XIJ, d_V, s_V, R2IJ, EPS, DWIJ):
        mu1 = 0.125 * self.alpha * d_h[d_idx] * d_cs[d_idx] * \
            d_rho[d_idx]
        mu2 = 0.125 * self.alpha * s_h[s_idx] * s_cs[s_idx] * \
            s_rho[s_idx]
        mu12 = 2.0 * mu1 * mu2 / (mu1 + mu2)
        vijdotxij = (VIJ[0] * XIJ[0] + VIJ[1] * XIJ[1] +
                     VIJ[2] * XIJ[2])
        denominator = d_V[d_idx] * s_V[s_idx] * (R2IJ + EPS)
        piij = 8.0 * mu12 * vijdotxij / denominator
        d_au[d_idx] += -piij * DWIJ[0]
        d_av[d_idx] += -piij * DWIJ[1]
        d_aw[d_idx] += -piij * DWIJ[2]


class AdamiColorGradient(Equation):
    """Adami color gradient, eq. (14) in [A10]
    (reference surface_tension.py:840)."""

    def initialize(self, d_idx, d_cx, d_cy, d_cz, d_nx, d_ny, d_nz,
                   d_ddelta, d_N):
        for v in (d_cx, d_cy, d_cz, d_nx, d_ny, d_nz, d_N, d_ddelta):
            v[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_V, s_V, d_rho, s_rho,
             d_cx, d_cy, d_cz, d_color, s_color, DWIJ):
        Vi = 1.0 / d_V[d_idx]
        Vj = 1.0 / s_V[s_idx]
        rhoij1 = 1.0 / (d_rho[d_idx] + s_rho[s_idx])
        color_diff = jnp.abs(d_color[d_idx] - s_color[s_idx])
        cij = jnp.where(color_diff == 0.0, 0.0,
                        d_rho[d_idx] * rhoij1)
        tmp = cij * (Vi * Vi + Vj * Vj) / Vi
        d_cx[d_idx] += tmp * DWIJ[0]
        d_cy[d_idx] += tmp * DWIJ[1]
        d_cz[d_idx] += tmp * DWIJ[2]

    def post_loop(self, d_idx, d_cx, d_cy, d_cz, d_h, d_nx, d_ny,
                  d_nz, d_ddelta, d_N):
        _normals_from_gradc(d_idx, d_cx, d_cy, d_cz, d_nx, d_ny, d_nz,
                            d_N, d_ddelta, 0.0)


def get_surface_tension_equations(fluids, solids, scheme, rho0, p0, c0,
                                  b, factor1, factor2, nu, sigma, d,
                                  epsilon, gamma, real=False):
    """Assemble the equation groups for a surface-tension formulation
    ('tvf', 'adami_stress', 'adami', 'shadloo', default Morris)
    (reference surface_tension.py:895)."""
    from pysph_tpu.sph.basic_equations import IsothermalEOS
    from pysph_tpu.sph.gas_dynamics.basic import ScaleSmoothingLength

    all = fluids + solids
    result = []
    if scheme == 'tvf':
        result.append(Group([SummationDensity(dest=i, sources=all)
                             for i in all], real=real))
        eqs = []
        for i in fluids:
            eqs.append(StateEquation(dest=i, sources=None, rho0=rho0,
                                     p0=p0))
            eqs.append(SmoothedColor(dest=i, sources=all))
        for i in solids:
            eqs.append(SolidWallPressureBCnoDensity(dest=i,
                                                    sources=fluids))
            eqs.append(SmoothedColor(dest=i, sources=all))
        result.append(Group(eqs, real=real))
        result.append(Group([MorrisColorGradient(dest=i, sources=all,
                                                 epsilon=epsilon)
                             for i in fluids], real=real))
        result.append(Group([InterfaceCurvatureFromNumberDensity(
            dest=i, sources=all, with_morris_correction=True)
            for i in fluids], real=real))
        eqs = []
        for i in fluids:
            eqs.append(MomentumEquationPressureGradient(
                dest=i, sources=all, pb=p0))
            eqs.append(MomentumEquationViscosity(dest=i, sources=fluids,
                                                 nu=nu))
            eqs.append(CSFSurfaceTensionForce(dest=i, sources=None,
                                              sigma=sigma))
            eqs.append(MomentumEquationArtificialStress(
                dest=i, sources=fluids))
            if solids:
                eqs.append(SolidWallNoSlipBC(dest=i, sources=solids,
                                             nu=nu))
        result.append(Group(eqs))
    elif scheme == 'adami_stress':
        result.append(Group([SummationDensitySourceMass(
            dest=i, sources=all) for i in all], real=real))
        eqs = [TaitEOS(dest=i, sources=None, c0=c0, gamma=gamma,
                       p0=p0, rho0=rho0) for i in fluids]
        eqs += [SolidWallPressureBCnoDensity(dest=i, sources=fluids)
                for i in solids]
        result.append(Group(eqs, real=real))
        result.append(Group([ColorGradientAdami(dest=i, sources=all)
                             for i in fluids], real=real))
        result.append(Group([ConstructStressMatrix(
            dest=i, sources=None, sigma=sigma, d=d)
            for i in fluids], real=real))
        eqs = []
        for i in fluids:
            eqs.append(MomentumEquationPressureGradientHuAdams(
                dest=i, sources=all))
            eqs.append(MomentumEquationViscosityAdami(dest=i,
                                                      sources=fluids))
            eqs.append(SurfaceForceAdami(dest=i, sources=all))
            if solids:
                eqs.append(SolidWallNoSlipBC(dest=i, sources=solids,
                                             nu=nu))
        result.append(Group(eqs))
    elif scheme == 'adami':
        result.append(Group([SummationDensitySourceMass(
            dest=i, sources=all) for i in all], real=real))
        eqs = [TaitEOS(dest=i, sources=None, c0=c0, gamma=gamma,
                       p0=p0, rho0=rho0) for i in fluids]
        eqs += [SolidWallPressureBCnoDensity(dest=i, sources=fluids)
                for i in solids]
        result.append(Group(eqs, real=real))
        result.append(Group([AdamiColorGradient(dest=i, sources=all)
                             for i in fluids], real=real))
        result.append(Group([AdamiReproducingDivergence(
            dest=i, sources=all, dim=d) for i in fluids], real=real))
        eqs = []
        for i in fluids:
            eqs.append(MomentumEquationPressureGradientAdami(
                dest=i, sources=all))
            eqs.append(MomentumEquationViscosityAdami(dest=i,
                                                      sources=fluids))
            eqs.append(CSFSurfaceTensionForceAdami(
                dest=i, sources=None, sigma=sigma))
            if solids:
                eqs.append(SolidWallNoSlipBC(dest=i, sources=solids,
                                             nu=nu))
        result.append(Group(eqs))
    elif scheme == 'shadloo':
        result.append(Group([SummationDensitySourceMass(
            dest=i, sources=all) for i in all], real=real))
        eqs = []
        for i in fluids:
            eqs.append(IsothermalEOS(dest=i, sources=None, rho0=rho0,
                                     c0=c0, p0=p0))
            eqs.append(SY11ColorGradient(dest=i, sources=all))
        for i in solids:
            eqs.append(SolidWallPressureBCnoDensity(dest=i,
                                                    sources=fluids))
        result.append(Group(eqs, real=real))
        result.append(Group([ScaleSmoothingLength(
            dest=i, sources=None, factor=factor1) for i in fluids],
            real=real, update_nnps=True))
        result.append(Group([SY11DiracDelta(dest=i, sources=all)
                             for i in fluids], real=real))
        result.append(Group([InterfaceCurvatureFromNumberDensity(
            dest=i, sources=all, with_morris_correction=True)
            for i in fluids], real=real))
        result.append(Group([ScaleSmoothingLength(
            dest=i, sources=None, factor=factor2) for i in fluids],
            real=real, update_nnps=True))
        eqs = []
        for i in fluids:
            eqs.append(MomentumEquationPressureGradient(
                dest=i, sources=all, pb=0.0))
            eqs.append(MomentumEquationViscosity(dest=i, sources=fluids,
                                                 nu=nu))
            eqs.append(ShadlooYildizSurfaceTensionForce(
                dest=i, sources=None, sigma=sigma))
            if solids:
                eqs.append(SolidWallNoSlipBC(dest=i, sources=solids,
                                             nu=nu))
        result.append(Group(eqs))
    else:
        result.append(Group([SummationDensitySourceMass(
            dest=i, sources=all) for i in all], real=real))
        eqs = []
        for i in fluids:
            eqs.append(TaitEOS(dest=i, sources=None, rho0=rho0, c0=c0,
                               gamma=gamma, p0=p0))
            eqs.append(SmoothedColor(dest=i, sources=all))
        for i in solids:
            eqs.append(SolidWallPressureBCnoDensity(dest=i,
                                                    sources=fluids))
            eqs.append(SmoothedColor(dest=i, sources=all))
        result.append(Group(eqs, real=real))
        result.append(Group([MorrisColorGradient(
            dest=i, sources=all, epsilon=epsilon)
            for i in fluids], real=real))
        result.append(Group([InterfaceCurvatureFromDensity(
            dest=i, sources=all, with_morris_correction=True)
            for i in fluids], real=real))
        eqs = []
        for i in fluids:
            eqs.append(MomentumEquationPressureGradientMorris(
                dest=i, sources=all))
            eqs.append(MomentumEquationViscosityMorris(dest=i,
                                                       sources=fluids))
            eqs.append(CSFSurfaceTensionForce(dest=i, sources=None,
                                              sigma=sigma))
            if solids:
                eqs.append(SolidWallNoSlipBC(dest=i, sources=solids,
                                             nu=nu))
        result.append(Group(eqs))
    return result
