"""Elastic dynamics equations (parity with
/root/reference/pysph/sph/solid_mech/basic.py): Hookean deviatoric
stress rate, momentum with artificial stress (Gray-Monaghan tensile
instability correction via batched 3x3 eigendecomposition), energy
equation, and the ElasticSolidsScheme."""

import numpy as np
import jax.numpy as jnp

from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.sph.equation import Equation
from pysph_tpu.sph.scheme import Scheme


def get_bulk_mod(G, nu):
    """Bulk modulus from shear modulus and Poisson ratio."""
    return 2.0 * G * (1 + nu) / (3 * (1 - 2 * nu))


def get_speed_of_sound(E, nu, rho0):
    return np.sqrt(E / (3 * (1.0 - 2 * nu) * rho0))


def get_shear_modulus(E, nu):
    return E / (2.0 * (1.0 + nu))


def get_particle_array_elastic_dynamics(constants=None, **props):
    """Particle array for elastic dynamics (reference
    solid_mech/basic.py:32)."""
    solids_props = [
        'cs', 'e', 'v00', 'v01', 'v02', 'v10', 'v11', 'v12', 'v20',
        'v21', 'v22', 'r00', 'r01', 'r02', 'r11', 'r12', 'r22', 's00',
        's01', 's02', 's11', 's12', 's22', 'as00', 'as01', 'as02',
        'as11', 'as12', 'as22', 's000', 's010', 's020', 's110', 's120',
        's220', 'arho', 'au', 'av', 'aw', 'ax', 'ay', 'az', 'ae',
        'rho0', 'u0', 'v0', 'w0', 'x0', 'y0', 'z0', 'e0']
    consts = {'wdeltap': -1.0, 'n': 4, 'G': 0.0, 'E': 0.0, 'nu': 0.0,
              'rho_ref': 1000.0, 'c0_ref': 0.0}
    if constants:
        consts.update(constants)
    pa = get_particle_array(constants=consts,
                            additional_props=solids_props, **props)
    pa.constants['G'][0] = get_shear_modulus(pa.E[0], pa.nu[0])
    cs0 = get_speed_of_sound(pa.E[0], pa.nu[0], pa.rho_ref[0])
    pa.cs = np.ones_like(pa.x) * cs0
    pa.constants['c0_ref'][0] = cs0
    pa.set_output_arrays(['x', 'y', 'z', 'u', 'v', 'w', 'rho', 'm',
                          'h', 'pid', 'gid', 'tag', 'p'])
    return pa


class IsothermalEOS(Equation):
    """p = c0^2 (rho - rho_ref) (reference solid_mech/basic.py:93)."""

    def loop(self, d_idx, d_rho, d_p, d_c0_ref, d_rho_ref):
        d_p[d_idx] = d_c0_ref[0] * d_c0_ref[0] * (d_rho[d_idx] -
                                                  d_rho_ref[0])


class MonaghanArtificialStress(Equation):
    """Artificial stress to remove tensile instability [Gray2001]
    (reference solid_mech/basic.py:104).

    The per-particle principal-stress rotation is one batched symmetric
    eigendecomposition (``jnp.linalg.eigh``) instead of a per-particle
    Cython routine."""

    def __init__(self, dest, sources, eps=0.3):
        self.eps = eps
        super(MonaghanArtificialStress, self).__init__(dest, sources)

    def loop(self, d_idx, d_rho, d_p, d_s00, d_s01, d_s02, d_s11,
             d_s12, d_s22, d_r00, d_r01, d_r02, d_r11, d_r12, d_r22):
        rhoi = d_rho[d_idx]
        rhoi21 = 1.0 / (rhoi * rhoi)
        p = d_p[d_idx]
        # total stress tensor (N, 3, 3)
        row0 = jnp.stack([d_s00[d_idx] - p, d_s01[d_idx],
                          d_s02[d_idx]], axis=-1)
        row1 = jnp.stack([d_s01[d_idx], d_s11[d_idx] - p,
                          d_s12[d_idx]], axis=-1)
        row2 = jnp.stack([d_s02[d_idx], d_s12[d_idx],
                          d_s22[d_idx] - p], axis=-1)
        S = jnp.stack([row0, row1, row2], axis=-2)
        V, R = jnp.linalg.eigh(S)
        rd = jnp.where(V > 0, -self.eps * V * rhoi21[..., None], 0.0)
        Rab = R @ (jnp.eye(3) * rd[..., None, :]) @ \
            jnp.swapaxes(R, -1, -2)
        d_r00[d_idx] = Rab[..., 0, 0]
        d_r11[d_idx] = Rab[..., 1, 1]
        d_r22[d_idx] = Rab[..., 2, 2]
        d_r12[d_idx] = Rab[..., 1, 2]
        d_r02[d_idx] = Rab[..., 0, 2]
        d_r01[d_idx] = Rab[..., 0, 1]


class MomentumEquationWithStress(Equation):
    """Momentum with total stress + artificial stress correction
    (reference solid_mech/basic.py:245)."""

    def initialize(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_rho, s_rho, s_m, d_p, s_p, d_s00,
             d_s01, d_s02, d_s11, d_s12, d_s22, s_s00, s_s01, s_s02,
             s_s11, s_s12, s_s22, d_r00, d_r01, d_r02, d_r11, d_r12,
             d_r22, s_r00, s_r01, s_r02, s_r11, s_r12, s_r22, d_au,
             d_av, d_aw, d_wdeltap, d_n, WIJ, DWIJ):
        pa_ = d_p[d_idx]
        pb = s_p[s_idx]
        rhoa21 = 1.0 / (d_rho[d_idx] * d_rho[d_idx])
        rhob21 = 1.0 / (s_rho[s_idx] * s_rho[s_idx])
        mb = s_m[s_idx]

        # total stress (diagonal gets -p)
        s00a = d_s00[d_idx] - pa_
        s11a = d_s11[d_idx] - pa_
        s22a = d_s22[d_idx] - pa_
        s01a, s02a, s12a = d_s01[d_idx], d_s02[d_idx], d_s12[d_idx]
        s00b = s_s00[s_idx] - pb
        s11b = s_s11[s_idx] - pb
        s22b = s_s22[s_idx] - pb
        s01b, s02b, s12b = s_s01[s_idx], s_s02[s_idx], s_s12[s_idx]

        wdp = d_wdeltap[0]
        use_corr = wdp > 0.0
        safe_wdp = jnp.where(use_corr, wdp, 1.0)
        # float exponent: an integer scalar power trips a Mosaic
        # scalar->vector sitofp verification error inside pallas
        fab = (WIJ / safe_wdp) ** (d_n[0] * 1.0)
        fab = jnp.where(use_corr, fab, 0.0)
        art00 = fab * (d_r00[d_idx] + s_r00[s_idx])
        art01 = fab * (d_r01[d_idx] + s_r01[s_idx])
        art02 = fab * (d_r02[d_idx] + s_r02[s_idx])
        art11 = fab * (d_r11[d_idx] + s_r11[s_idx])
        art12 = fab * (d_r12[d_idx] + s_r12[s_idx])
        art22 = fab * (d_r22[d_idx] + s_r22[s_idx])

        d_au[d_idx] += (
            mb * (s00a * rhoa21 + s00b * rhob21 + art00) * DWIJ[0] +
            mb * (s01a * rhoa21 + s01b * rhob21 + art01) * DWIJ[1] +
            mb * (s02a * rhoa21 + s02b * rhob21 + art02) * DWIJ[2])
        d_av[d_idx] += (
            mb * (s01a * rhoa21 + s01b * rhob21 + art01) * DWIJ[0] +
            mb * (s11a * rhoa21 + s11b * rhob21 + art11) * DWIJ[1] +
            mb * (s12a * rhoa21 + s12b * rhob21 + art12) * DWIJ[2])
        d_aw[d_idx] += (
            mb * (s02a * rhoa21 + s02b * rhob21 + art02) * DWIJ[0] +
            mb * (s12a * rhoa21 + s12b * rhob21 + art12) * DWIJ[1] +
            mb * (s22a * rhoa21 + s22b * rhob21 + art22) * DWIJ[2])


class HookesDeviatoricStressRate(Equation):
    """Jaumann rate of the deviatoric stress
    (reference solid_mech/basic.py:390)."""

    def initialize(self, d_idx, d_as00, d_as01, d_as02, d_as11,
                   d_as12, d_as22):
        d_as00[d_idx] = 0.0
        d_as01[d_idx] = 0.0
        d_as02[d_idx] = 0.0
        d_as11[d_idx] = 0.0
        d_as12[d_idx] = 0.0
        d_as22[d_idx] = 0.0

    def loop(self, d_idx, d_s00, d_s01, d_s02, d_s11, d_s12, d_s22,
             d_v00, d_v01, d_v02, d_v10, d_v11, d_v12, d_v20, d_v21,
             d_v22, d_as00, d_as01, d_as02, d_as11, d_as12, d_as22,
             d_G):
        v00, v01, v02 = d_v00[d_idx], d_v01[d_idx], d_v02[d_idx]
        v10, v11, v12 = d_v10[d_idx], d_v11[d_idx], d_v12[d_idx]
        v20, v21, v22 = d_v20[d_idx], d_v21[d_idx], d_v22[d_idx]
        s00, s01, s02 = d_s00[d_idx], d_s01[d_idx], d_s02[d_idx]
        s10, s11, s12 = s01, d_s11[d_idx], d_s12[d_idx]
        s20, s21, s22 = s02, s12, d_s22[d_idx]

        eps01 = 0.5 * (v01 + v10)
        eps02 = 0.5 * (v02 + v20)
        eps12 = 0.5 * (v12 + v21)
        omega01 = 0.5 * (v01 - v10)
        omega02 = 0.5 * (v02 - v20)
        omega12 = 0.5 * (v12 - v21)
        omega10 = -omega01
        omega20 = -omega02
        omega21 = -omega12

        tmp = 2.0 * d_G[0]
        trace = (v00 + v11 + v22) / 3.0
        d_as00[d_idx] = tmp * (v00 - trace) + \
            (s01 * omega01 + s02 * omega02) + \
            (s10 * omega01 + s20 * omega02)
        d_as01[d_idx] = tmp * eps01 + \
            (s00 * omega10 + s02 * omega12) + \
            (s11 * omega01 + s21 * omega02)
        d_as02[d_idx] = tmp * eps02 + \
            (s00 * omega20 + s01 * omega21) + \
            (s12 * omega01 + s22 * omega02)
        d_as11[d_idx] = tmp * (v11 - trace) + \
            (s10 * omega10 + s12 * omega12) + \
            (s01 * omega10 + s21 * omega12)
        d_as12[d_idx] = tmp * eps12 + \
            (s10 * omega20 + s11 * omega21) + \
            (s02 * omega10 + s22 * omega12)
        d_as22[d_idx] = tmp * (v22 - trace) + \
            (s20 * omega20 + s21 * omega21) + \
            (s02 * omega20 + s12 * omega21)


class EnergyEquationWithStress(Equation):
    """Energy equation with stress power
    (reference solid_mech/basic.py:508)."""

    def __init__(self, dest, sources, alpha=1.0, beta=1.0, eta=0.01):
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.eta = float(eta)
        super(EnergyEquationWithStress, self).__init__(dest, sources)

    def initialize(self, d_idx, d_ae):
        d_ae[d_idx] = 0.0

    def loop(self, d_idx, s_idx, s_m, d_rho, s_rho, d_p, s_p, d_cs,
             s_cs, d_ae, XIJ, VIJ, DWIJ, HIJ, R2IJ, RHOIJ1):
        rhoa2 = 1.0 / (d_rho[d_idx] * d_rho[d_idx])
        rhob2 = 1.0 / (s_rho[s_idx] * s_rho[s_idx])
        vijdotxij = (VIJ[0] * XIJ[0] + VIJ[1] * XIJ[1] +
                     VIJ[2] * XIJ[2])
        cij = 0.5 * (d_cs[d_idx] + s_cs[s_idx])
        muij = (HIJ * vijdotxij) / (
            R2IJ + self.eta * self.eta * HIJ * HIJ)
        piij = (-self.alpha * cij * muij +
                self.beta * muij * muij) * RHOIJ1
        piij = jnp.where(vijdotxij < 0, piij, 0.0)
        vijdotdwij = (VIJ[0] * DWIJ[0] + VIJ[1] * DWIJ[1] +
                      VIJ[2] * DWIJ[2])
        d_ae[d_idx] += 0.5 * s_m[s_idx] * (
            d_p[d_idx] * rhoa2 + s_p[s_idx] * rhob2 + piij)

    def post_loop(self, d_idx, d_rho, d_s00, d_s01, d_s02, d_s11,
                  d_s12, d_s22, d_v00, d_v01, d_v02, d_v10, d_v11,
                  d_v12, d_v20, d_v21, d_v22, d_ae):
        s00, s01, s02 = d_s00[d_idx], d_s01[d_idx], d_s02[d_idx]
        s11, s12, s22 = d_s11[d_idx], d_s12[d_idx], d_s22[d_idx]
        eps00 = d_v00[d_idx]
        eps01 = 0.5 * (d_v01[d_idx] + d_v10[d_idx])
        eps02 = 0.5 * (d_v02[d_idx] + d_v20[d_idx])
        eps11 = d_v11[d_idx]
        eps12 = 0.5 * (d_v12[d_idx] + d_v21[d_idx])
        eps22 = d_v22[d_idx]
        sdoteij = (s00 * eps00 + 2 * s01 * eps01 + 2 * s02 * eps02 +
                   s11 * eps11 + 2 * s12 * eps12 + s22 * eps22)
        d_ae[d_idx] += sdoteij / d_rho[d_idx]


class ElasticSolidsScheme(Scheme):
    """Elastic dynamics scheme (reference solid_mech/basic.py:592)."""

    def __init__(self, elastic_solids, solids, dim,
                 artificial_stress_eps=0.3, xsph_eps=0.5, alpha=1.0,
                 beta=1.0):
        self.elastic_solids = elastic_solids
        self.solids = solids
        self.dim = dim
        self.solver = None
        self.alpha = alpha
        self.beta = beta
        self.xsph_eps = xsph_eps
        self.artificial_stress_eps = artificial_stress_eps

    def get_equations(self):
        from pysph_tpu.sph.basic_equations import (
            ContinuityEquation, MonaghanArtificialViscosity,
            VelocityGradient2D, XSPHCorrection)
        from pysph_tpu.sph.equation import Group

        equations = []
        all = self.solids + self.elastic_solids
        g1 = []
        for es in self.elastic_solids:
            g1.append(IsothermalEOS(es, sources=None))
            g1.append(VelocityGradient2D(dest=es, sources=all))
            g1.append(MonaghanArtificialStress(
                dest=es, sources=None,
                eps=self.artificial_stress_eps))
        equations.append(Group(equations=g1))

        g2 = []
        for es in self.elastic_solids:
            g2.append(ContinuityEquation(dest=es, sources=all))
            g2.append(MomentumEquationWithStress(dest=es, sources=all))
            g2.append(MonaghanArtificialViscosity(
                dest=es, sources=all, alpha=self.alpha,
                beta=self.beta))
            g2.append(HookesDeviatoricStressRate(dest=es, sources=None))
            g2.append(XSPHCorrection(dest=es, sources=[es],
                                     eps=self.xsph_eps))
        equations.append(Group(g2))
        return equations

    def configure_solver(self, kernel=None, integrator_cls=None,
                         extra_steppers=None, **kw):
        from pysph_tpu.base.kernels import CubicSpline
        from pysph_tpu.sph.integrator import EPECIntegrator
        from pysph_tpu.sph.integrator_step import SolidMechStep
        from pysph_tpu.solver.solver import Solver
        if kernel is None:
            kernel = CubicSpline(dim=self.dim)
        steppers = {}
        if extra_steppers is not None:
            steppers.update(extra_steppers)
        cls = integrator_cls if integrator_cls is not None else \
            EPECIntegrator
        for name in self.elastic_solids:
            if name not in steppers:
                steppers[name] = SolidMechStep()
        integrator = cls(**steppers)
        self.solver = Solver(dim=self.dim, integrator=integrator,
                             kernel=kernel, **kw)

    def setup_properties(self, particles, clean=True):
        dummy = get_particle_array_elastic_dynamics(name='junk')
        props = list(dummy.properties.keys())
        for pa in particles:
            if pa.name in self.elastic_solids:
                self._ensure_properties(pa, props, clean)
                for c, v in dummy.constants.items():
                    if c not in pa.constants:
                        pa.add_constant(c, v)
                pa.set_output_arrays(dummy.output_property_arrays)
