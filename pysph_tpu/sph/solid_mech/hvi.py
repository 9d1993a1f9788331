"""High-velocity-impact equations (parity with
/root/reference/pysph/sph/solid_mech/hvi.py): Von Mises plasticity,
stiffened-gas and Mie-Gruneisen EOS."""

import math

import jax.numpy as jnp

from pysph_tpu.sph.equation import Equation


class VonMisesPlasticity2D(Equation):
    """Radial-return plasticity limiter (reference hvi.py:9)."""

    def __init__(self, dest, sources, flow_stress):
        self.flow_stress2 = float(flow_stress * flow_stress)
        self.factor = math.sqrt(2.0 / 3.0) * flow_stress
        super(VonMisesPlasticity2D, self).__init__(dest, sources)

    def loop(self, d_idx, d_s00, d_s01, d_s02, d_s11, d_s12, d_s22):
        s00 = d_s00[d_idx]
        s01 = d_s01[d_idx]
        s11 = d_s11[d_idx]
        J = s00 * s00 + 2.0 * s01 * s01 + s11 * s11
        over = J > 2.0 / 3.0 * self.flow_stress2
        scale = jnp.where(over,
                          self.factor / jnp.sqrt(jnp.where(J > 0, J,
                                                           1.0)),
                          1.0)
        d_s00[d_idx] = scale * d_s00[d_idx]
        d_s01[d_idx] = scale * d_s01[d_idx]
        d_s02[d_idx] = scale * d_s02[d_idx]
        d_s11[d_idx] = scale * d_s11[d_idx]
        d_s12[d_idx] = scale * d_s12[d_idx]
        d_s22[d_idx] = scale * d_s22[d_idx]


class StiffenedGasEOS(Equation):
    """Stiffened-gas EOS, Howell & Ball 2002 (reference hvi.py:45)."""

    def __init__(self, dest, sources, gamma, r0, c0):
        self.gamma = float(gamma)
        self.c0 = float(c0)
        self.r0 = float(r0)
        super(StiffenedGasEOS, self).__init__(dest, sources)

    def loop(self, d_idx, d_e, d_rho, d_p, d_cs):
        d_p[d_idx] = (self.c0 * self.c0 * (d_rho[d_idx] - self.r0) +
                      (self.gamma - 1.0) * d_rho[d_idx] * d_e[d_idx])
        arg = (self.c0 * self.c0 + (self.gamma - 1.0) *
               (d_e[d_idx] + d_p[d_idx] / d_rho[d_idx]))
        d_cs[d_idx] = jnp.sqrt(jnp.maximum(arg, 0.0))


class MieGruneisenEOS(Equation):
    """Mie-Gruneisen EOS (reference hvi.py:70)."""

    def __init__(self, dest, sources, gamma, r0, c0, S):
        self.gamma = float(gamma)
        self.r0 = float(r0)
        self.S = float(S)
        self.a0 = a0 = float(r0 * c0 * c0)
        self.b0 = a0 * (1 + 2.0 * (S - 1.0))
        self.c0 = a0 * (2 * (S - 1.0) + 3 * (S - 1.0) * (S - 1.0))
        super(MieGruneisenEOS, self).__init__(dest, sources)

    def loop(self, d_idx, d_p, d_rho, d_e):
        rhoa = d_rho[d_idx]
        ratio = rhoa / self.r0 - 1.0
        ratio2 = ratio * ratio
        PH = self.a0 * ratio
        PH = jnp.where(ratio > 0,
                       PH + ratio2 * (self.b0 + self.c0 * ratio), PH)
        d_p[d_idx] = ((1.0 - 0.5 * self.gamma * ratio) * PH +
                      rhoa * d_e[d_idx] * self.gamma)
