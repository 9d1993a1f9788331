"""Kinematic advection test equations (parity with
/root/reference/pysph/sph/misc/advection.py)."""

import math

import jax.numpy as jnp

from pysph_tpu.sph.equation import Equation

M_PI = math.pi


class Advect(Equation):
    def loop(self, d_idx, d_ax, d_ay, d_u, d_v):
        d_ax[d_idx] = d_u[d_idx]
        d_ay[d_idx] = d_v[d_idx]


class MixingVelocityUpdate(Equation):
    def __init__(self, dest, sources, T):
        self.T = T
        super(MixingVelocityUpdate, self).__init__(dest, sources)

    def loop(self, d_idx, d_u, d_v, d_u0, d_v0, t):
        d_u[d_idx] = jnp.cos(M_PI * t / self.T) * d_u0[d_idx]
        d_v[d_idx] = -jnp.cos(M_PI * t / self.T) * d_v0[d_idx]
