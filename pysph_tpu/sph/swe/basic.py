"""Shallow-water equations (parity with
/root/reference/pysph/sph/swe/basic.py; Vacondio, Rogers et al.).

Engine adaptations:

- Particle split/merge/removal changes the particle count, which is
  host territory in both frameworks (the reference also does it with
  numpy between sweeps).  Flag-setting runs vectorized on device; the
  structural edits (``ParticleSplit.do_particle_split``, the
  ``remove()`` helpers on the Remove* equations, merge compaction)
  are host numpy on the ``ParticleArray`` — call them from solver
  callbacks, after which the solver re-syncs device state.
- ``FindMergeable``'s closest-neighbor search is an argmin over the
  pair block: a MIN-reduction of the distance followed by a
  MIN-reduction of the candidate index among distance-ties (reads of
  a just-written dest property see the reduced value).
- ``ParticleAcceleration``'s scatter into the source array
  (``s_dw[s_idx] = d_dw[d_idx]`` for wall particles,
  reference swe/basic.py:1104) is applied locally instead: the pair
  term uses the dest's dw where the source is a wall particle —
  identical arithmetic without a nondeterministic scatter.
"""

import jax.numpy as jnp
import numpy as np

from pysph_tpu.sph.equation import MAX, MIN, Equation

M_PI = np.pi


class CheckForParticlesToSplit(Equation):
    """Flag particles whose area exceeds A_max inside the given box
    (reference swe/basic.py:18)."""

    def __init__(self, dest, h_max=1e9, A_max=1e9, x_min=-1e9,
                 x_max=1e9, y_min=-1e9, y_max=1e9):
        self.A_max = A_max
        self.h_max = h_max
        self.x_min = x_min
        self.x_max = x_max
        self.y_min = y_min
        self.y_max = y_max
        super(CheckForParticlesToSplit, self).__init__(dest, None)

    def initialize(self, d_idx, d_A, d_h, d_x, d_y, d_pa_to_split):
        cond = ((d_A[d_idx] > self.A_max) &
                (d_h[d_idx] < self.h_max) &
                (d_x[d_idx] > self.x_min) & (d_x[d_idx] < self.x_max) &
                (d_y[d_idx] > self.y_min) & (d_y[d_idx] < self.y_max))
        d_pa_to_split[d_idx] = jnp.where(cond, 1.0, 0.0)


class ParticleSplit(object):
    """Hexagonal 1->7 particle split (reference swe/basic.py:74,
    Vacondio et al.).  Host-side: operates on the numpy-backed
    ParticleArray between device sweeps."""

    def __init__(self, pa_arr):
        self.pa_arr = pa_arr
        self.center_pa_mass_frac = 0.178705766141917
        self.vertex_pa_mass_frac = 0.136882287617319
        self.pa_h_ratio = 0.9
        self.center_and_vertex_pa_separation_frac = 0.4
        self.idx_pa_to_split = np.where(
            np.asarray(pa_arr.pa_to_split) > 0)[0]
        self.num_vertex_pa_after_single_split = 6

    def do_particle_split(self, solver=None):
        idx = self.idx_pa_to_split
        if not idx.size:
            return
        pa = self.pa_arr
        n = self.num_vertex_pa_after_single_split
        rep = lambda a: np.repeat(np.asarray(a)[idx], n)  # noqa: E731

        h_parent = np.asarray(pa.h)[idx]
        u_parent = np.asarray(pa.u)[idx]
        v_parent = np.asarray(pa.v)[idx]

        # vertex positions: hexagon aligned with the velocity
        r = self.center_and_vertex_pa_separation_frac
        theta = np.deg2rad(np.arange(0, 360, 60))
        angle_vel = np.where(
            (np.abs(u_parent) > 1e-3) | (np.abs(v_parent) > 1e-3),
            np.arctan2(v_parent, u_parent), 0.0)
        ang = (np.tile(theta, idx.size) + np.repeat(angle_vel, n))
        hrep = np.repeat(h_parent, n)
        dx = r * np.cos(ang) * hrep
        dy = r * np.sin(ang) * hrep

        vertex = {
            'm': self.vertex_pa_mass_frac * rep(pa.m),
            'h': self.pa_h_ratio * rep(pa.h),
            'h0': self.pa_h_ratio * rep(pa.h0),
            'x': dx + rep(pa.x),
            'y': dy + rep(pa.y),
            'u_prev_step': rep(pa.u_prev_step),
            'v_prev_step': rep(pa.v_prev_step),
            'rho0': rep(pa.rho0),
            'rho': rep(pa.rho),
            'alpha': rep(pa.alpha),
            'parent_idx': np.repeat(idx, n).astype(np.int64),
        }
        pa.m[idx] *= self.center_pa_mass_frac
        pa.h[idx] *= self.pa_h_ratio
        pa.h0[idx] *= self.pa_h_ratio
        pa.parent_idx[idx] = idx
        pa.add_particles(**vertex)


class DaughterVelocityEval(Equation):
    """Velocity re-distribution after a split
    (reference swe/basic.py:229)."""

    def __init__(self, dest, sources, rhow=1000.0):
        self.rhow = rhow
        super(DaughterVelocityEval, self).__init__(dest, sources)

    def initialize(self, d_sum_Ak, d_idx, d_m, d_rho, d_u, d_v, d_uh,
                   d_vh, d_u_parent, d_v_parent, d_uh_parent,
                   d_vh_parent, d_parent_idx):
        d_sum_Ak[d_idx] = 0.0
        pidx = d_parent_idx[d_idx]
        d_u_parent[d_idx] = d_u[pidx]
        d_uh_parent[d_idx] = d_uh[pidx]
        d_v_parent[d_idx] = d_v[pidx]
        d_vh_parent[d_idx] = d_vh[pidx]

    def loop(self, d_sum_Ak, d_pa_to_split, d_parent_idx, d_idx, s_m,
             s_rho, s_parent_idx, s_idx):
        match = ((d_pa_to_split[d_idx] > 0) &
                 (s_parent_idx[s_idx] == d_parent_idx[d_idx]))
        d_sum_Ak[d_idx] += jnp.where(match,
                                     s_m[s_idx] / s_rho[s_idx], 0.0)

    def post_loop(self, d_idx, d_parent_idx, d_A, d_sum_Ak, d_dw,
                  d_rho, d_u, d_uh, d_vh, d_v, d_u_parent, d_v_parent,
                  d_uh_parent, d_vh_parent, t):
        has_parent = d_parent_idx[d_idx] > 0
        pidx = d_parent_idx[d_idx]
        sum_ak = d_sum_Ak[pidx]
        sum_ak = jnp.where(sum_ak != 0.0, sum_ak, 1.0)
        cv = d_A[pidx] / sum_ak
        dw_ratio = d_dw[pidx] / (d_rho[d_idx] / self.rhow)
        d_u[d_idx] = jnp.where(has_parent,
                               cv * dw_ratio * d_u_parent[d_idx],
                               d_u[d_idx])
        d_uh[d_idx] = jnp.where(has_parent,
                                cv * dw_ratio * d_uh_parent[d_idx],
                                d_uh[d_idx])
        d_v[d_idx] = jnp.where(has_parent,
                               cv * dw_ratio * d_v_parent[d_idx],
                               d_v[d_idx])
        d_vh[d_idx] = jnp.where(has_parent,
                                cv * dw_ratio * d_vh_parent[d_idx],
                                d_vh[d_idx])
        d_parent_idx[d_idx] = jnp.where(has_parent, 0,
                                        d_parent_idx[d_idx])


class FindMergeable(Equation):
    """Mutual-closest-neighbor merge (reference swe/basic.py:314).

    Device part flags merge pairs and absorbs the partner's mass into
    the lower-index particle; the ``merge`` flag marks the absorbed
    partner for host-side removal (call ``remove`` from a callback)."""

    def __init__(self, dest, sources, A_min, x_min=-1e9, x_max=1e9,
                 y_min=-1e9, y_max=1e9):
        self.A_min = A_min
        self.x_min = x_min
        self.x_max = x_max
        self.y_min = y_min
        self.y_max = y_max
        super(FindMergeable, self).__init__(dest, sources)

    def initialize(self, d_idx, d_merge, d_is_merged_pa, d_rmin_tmp,
                   d_closest_idx):
        d_merge[d_idx] = 0.0
        d_is_merged_pa[d_idx] = 0.0
        d_rmin_tmp[d_idx] = 1e30
        d_closest_idx[d_idx] = 1e30

    def loop(self, d_idx, d_closest_idx, d_rmin_tmp, d_x, d_y,
             d_h, d_A, RIJ, NBRS):
        eligible = ((d_A[d_idx] < self.A_min) &
                    (d_x[d_idx] > self.x_min) &
                    (d_x[d_idx] < self.x_max) &
                    (d_y[d_idx] > self.y_min) &
                    (d_y[d_idx] < self.y_max))
        big = 1e30
        rmax = d_h[d_idx] * 10.0
        rij = jnp.where((RIJ > 1e-12) & (RIJ < rmax) & eligible, RIJ,
                        big)
        d_rmin_tmp[d_idx] = MIN(rij, d_rmin_tmp[d_idx])
        rmin = d_rmin_tmp[d_idx]
        cand = jnp.where(rij <= rmin * (1 + 1e-7),
                         NBRS.astype(rij.dtype), big)
        d_closest_idx[d_idx] = MIN(cand, d_closest_idx[d_idx])

    def post_loop(self, d_idx, d_m, d_u, d_v, d_h, d_uh, d_vh,
                  d_closest_idx, d_is_merged_pa, d_merge, d_x, d_y,
                  d_rmin_tmp, D_PIDX, SPH_KERNEL):
        big = 1e30
        has = d_closest_idx[d_idx] < big
        idx = jnp.where(has, d_closest_idx[d_idx], 0).astype(jnp.int32)
        me = D_PIDX
        # mutual-closest check (indices are particle-space; the view
        # translates gathers through the layout)
        closest_of_closest = d_closest_idx[idx]
        mutual = has & (closest_of_closest.astype(jnp.int32) == me)
        lower = mutual & (me < idx)
        upper = mutual & (me > idx)

        m_merged = d_m[d_idx] + d_m[idx]
        x_merged = (d_m[d_idx] * d_x[d_idx] +
                    d_m[idx] * d_x[idx]) / m_merged
        y_merged = (d_m[d_idx] * d_y[d_idx] +
                    d_m[idx] * d_y[idx]) / m_merged
        xma = [x_merged - d_x[d_idx], y_merged - d_y[d_idx],
               jnp.zeros_like(x_merged)]
        xmb = [x_merged - d_x[idx], y_merged - d_y[idx],
               jnp.zeros_like(x_merged)]
        rma = jnp.sqrt(xma[0] ** 2 + xma[1] ** 2)
        rmb = jnp.sqrt(xmb[0] ** 2 + xmb[1] ** 2)
        u_new = (d_m[d_idx] * d_u[d_idx] +
                 d_m[idx] * d_u[idx]) / m_merged
        uh_new = (d_m[d_idx] * d_uh[d_idx] +
                  d_m[idx] * d_uh[idx]) / m_merged
        v_new = (d_m[d_idx] * d_v[d_idx] +
                 d_m[idx] * d_v[idx]) / m_merged
        vh_new = (d_m[d_idx] * d_vh[d_idx] +
                  d_m[idx] * d_vh[idx]) / m_merged
        const1 = d_m[d_idx] * SPH_KERNEL.kernel(xma, rma, d_h[d_idx])
        const2 = d_m[idx] * SPH_KERNEL.kernel(xmb, rmb, d_h[idx])
        denom = jnp.where(const1 + const2 > 0.0, const1 + const2, 1.0)
        h_new = jnp.sqrt((7 * M_PI / 10.0) * (m_merged / denom))

        d_u[d_idx] = jnp.where(lower, u_new, d_u[d_idx])
        d_uh[d_idx] = jnp.where(lower, uh_new, d_uh[d_idx])
        d_v[d_idx] = jnp.where(lower, v_new, d_v[d_idx])
        d_vh[d_idx] = jnp.where(lower, vh_new, d_vh[d_idx])
        d_h[d_idx] = jnp.where(lower, h_new, d_h[d_idx])
        d_m[d_idx] = jnp.where(lower, m_merged, d_m[d_idx])
        d_is_merged_pa[d_idx] = jnp.where(lower, 1.0, 0.0)
        d_merge[d_idx] = jnp.where(upper, 1.0, 0.0)

    @staticmethod
    def remove(pa):
        """Host: drop particles absorbed by a merge."""
        idx = np.where(np.asarray(pa.merge) > 0)[0]
        if idx.size:
            pa.remove_particles(idx)


class InitialDensityEvalAfterMerge(Equation):
    """Re-evaluate the density of freshly merged particles
    (reference swe/basic.py:448)."""

    def initialize(self, d_rho, d_idx, d_is_merged_pa):
        merged = d_is_merged_pa[d_idx] == 1
        d_rho[d_idx] = jnp.where(merged, 0.0, d_rho[d_idx])

    def loop(self, d_rho, d_idx, d_is_merged_pa, s_idx, s_h, s_m, XIJ,
             RIJ, SPH_KERNEL):
        merged = d_is_merged_pa[d_idx] == 1
        w = SPH_KERNEL.kernel(XIJ, RIJ, s_h[s_idx])
        d_rho[d_idx] += jnp.where(merged, s_m[s_idx] * w, 0.0)


from pysph_tpu.sph.integrator import Integrator  # noqa: E402
from pysph_tpu.sph.integrator_step import IntegratorStep  # noqa: E402


class EulerStep(IntegratorStep):
    """(reference swe/basic.py:482)"""

    def initialize(self, t, d_u, d_v, d_u_prev_step, d_v_prev_step,
                   d_idx):
        d_u_prev_step[d_idx] = d_u[d_idx]
        d_v_prev_step[d_idx] = d_v[d_idx]

    def stage1(self, d_idx, d_u, d_v, d_au, d_av, d_x, d_y, dt):
        d_u[d_idx] += dt * d_au[d_idx]
        d_v[d_idx] += dt * d_av[d_idx]
        d_x[d_idx] += dt * d_u[d_idx]
        d_y[d_idx] += dt * d_v[d_idx]


class SWEStep(IntegratorStep):
    """Leap-frog (reference swe/basic.py:495)."""

    def initialize(self, t, d_u, d_v, d_uh, d_vh, d_u_prev_step,
                   d_v_prev_step, d_idx):
        d_u_prev_step[d_idx] = d_u[d_idx]
        d_v_prev_step[d_idx] = d_v[d_idx]

    def stage1(self, d_uh, d_vh, d_idx, d_au, d_av, dt):
        d_uh[d_idx] += dt * d_au[d_idx]
        d_vh[d_idx] += dt * d_av[d_idx]

    def stage2(self, d_u, d_v, d_uh, d_vh, d_idx, d_au, d_av, d_x,
               d_y, dt):
        d_x[d_idx] += dt * d_uh[d_idx]
        d_y[d_idx] += dt * d_vh[d_idx]
        d_u[d_idx] = d_uh[d_idx] + dt / 2.0 * d_au[d_idx]
        d_v[d_idx] = d_vh[d_idx] + dt / 2.0 * d_av[d_idx]


class SWEIntegrator(Integrator):
    """Accelerations first, then kick/drift (reference
    swe/basic.py:515)."""

    def one_timestep(self, t, dt):
        self.compute_accelerations()
        self.initialize()
        self.stage1()
        self.do_post_stage(0.5 * dt, 1)
        self.stage2()
        self.do_post_stage(dt, 2)


class GatherDensityEvalNextIteration(Equation):
    """(reference swe/basic.py:535)"""

    def initialize(self, d_rho, d_idx, d_rho_prev_iter):
        d_rho_prev_iter[d_idx] = d_rho[d_idx]
        d_rho[d_idx] = 0.0

    def loop(self, d_rho, d_idx, s_m, s_idx, WI):
        d_rho[d_idx] += s_m[s_idx] * WI


class ScatterDensityEvalNextIteration(Equation):
    """(reference swe/basic.py:558)"""

    def initialize(self, t, d_rho, d_idx, d_rho_prev_iter):
        d_rho_prev_iter[d_idx] = d_rho[d_idx]
        d_rho[d_idx] = 0.0

    def loop(self, d_rho, d_idx, s_m, s_idx, WJ):
        d_rho[d_idx] += s_m[s_idx] * WJ


class NonDimensionalDensityResidual(Equation):
    """(reference swe/basic.py:581)"""

    def __init__(self, dest, sources=None):
        super(NonDimensionalDensityResidual, self).__init__(dest,
                                                            sources)

    def post_loop(self, d_psi, d_rho, d_rho_prev_iter, d_idx):
        d_psi[d_idx] = jnp.abs(d_rho[d_idx] - d_rho_prev_iter[d_idx]) \
            / d_rho_prev_iter[d_idx]


class CheckConvergenceDensityResidual(Equation):
    """(reference swe/basic.py:605); the max-residual check reduces
    into the ``swe_conv`` constant on device."""

    def __init__(self, dest, sources=None):
        super(CheckConvergenceDensityResidual, self).__init__(dest,
                                                              sources)

    def reduce(self, dst, t, dt):
        mask = dst.active
        eps = jnp.max(jnp.where(mask, dst.psi[:], 0.0))
        dst.swe_conv[0] = jnp.where(eps <= 1e-3, 1.0, -1.0)

    def converged(self, dst):
        return dst.swe_conv[0]


class CorrectionFactorVariableSmoothingLength(Equation):
    """(reference swe/basic.py:646)"""

    def initialize(self, d_idx, d_alpha):
        d_alpha[d_idx] = 0.0

    def loop(self, d_alpha, d_idx, DWIJ, XIJ, s_idx, s_m):
        d_alpha[d_idx] += -s_m[s_idx] * (DWIJ[0] * XIJ[0] +
                                         DWIJ[1] * XIJ[1])


class RemoveParticlesWithZeroAlpha(Equation):
    """Flag particles with zero correction factor; call ``remove``
    host-side to drop them (reference swe/basic.py:668)."""

    def __init__(self, dest):
        super(RemoveParticlesWithZeroAlpha, self).__init__(dest, None)

    def post_loop(self, d_alpha, d_pa_alpha_zero, d_idx):
        d_pa_alpha_zero[d_idx] = jnp.where(d_alpha[d_idx] == 0,
                                           1.0, 0.0)

    @staticmethod
    def remove(pa):
        idx = np.where(np.asarray(pa.pa_alpha_zero) > 0)[0]
        if idx.size:
            pa.remove_particles(idx)


class SummationDensity(Equation):
    """(reference swe/basic.py:687)"""

    def initialize(self, d_summation_rho, d_idx):
        d_summation_rho[d_idx] = 0.0

    def loop(self, d_summation_rho, d_idx, s_m, s_idx, WI):
        d_summation_rho[d_idx] += s_m[s_idx] * WI


class InitialGuessDensityVacondio(Equation):
    """(reference swe/basic.py:702)"""

    def __init__(self, dest, sources, dim=2):
        self.dim = dim
        super(InitialGuessDensityVacondio, self).__init__(dest,
                                                          sources)

    def initialize(self, d_arho, d_idx):
        d_arho[d_idx] = 0.0

    def loop(self, d_arho, d_rho, d_idx, s_m, s_rho, s_idx,
             d_u_prev_step, d_v_prev_step, s_u_prev_step,
             s_v_prev_step, DWI):
        tmp1 = (d_u_prev_step[d_idx] - s_u_prev_step[s_idx]) * DWI[0]
        tmp2 = (d_v_prev_step[d_idx] - s_v_prev_step[s_idx]) * DWI[1]
        d_arho[d_idx] += d_rho[d_idx] * (
            (s_m[s_idx] / s_rho[s_idx]) * (tmp1 + tmp2))

    def post_loop(self, d_rho, d_h, dt, d_arho, d_idx):
        d_rho[d_idx] += dt * d_arho[d_idx]
        d_h[d_idx] += -(dt / self.dim) * d_h[d_idx] * \
            (d_arho[d_idx] / d_rho[d_idx])


class InitialGuessDensity(Equation):
    """(reference swe/basic.py:755)"""

    def __init__(self, dest, sources, dim=2):
        self.dim = dim
        super(InitialGuessDensity, self).__init__(dest, sources)

    def initialize(self, d_exp_lambda, d_idx):
        d_exp_lambda[d_idx] = 0.0

    def loop(self, d_exp_lambda, d_u_prev_step, d_v_prev_step,
             d_alpha, d_idx, s_m, s_u_prev_step, s_v_prev_step, s_idx,
             DWI, dt, t):
        a1 = (d_u_prev_step[d_idx] - s_u_prev_step[s_idx]) * DWI[0]
        a2 = (d_v_prev_step[d_idx] - s_v_prev_step[s_idx]) * DWI[1]
        const = (self.dim * dt) / d_alpha[d_idx]
        d_exp_lambda[d_idx] += const * (s_m[s_idx] * (a1 + a2))

    def post_loop(self, t, d_rho, d_exp_lambda, d_idx):
        d_rho[d_idx] = d_rho[d_idx] * jnp.exp(d_exp_lambda[d_idx])


class UpdateSmoothingLength(Equation):
    """(reference swe/basic.py:801)"""

    def __init__(self, dest, dim=2):
        self.dim = dim
        super(UpdateSmoothingLength, self).__init__(dest, None)

    def post_loop(self, d_h, d_h0, d_rho0, d_rho, d_idx):
        d_h[d_idx] = d_h0[d_idx] * (d_rho0[d_idx] /
                                    d_rho[d_idx]) ** (1.0 / self.dim)


class DensityResidual(Equation):
    """(reference swe/basic.py:832)"""

    def __init__(self, dest, sources=None):
        super(DensityResidual, self).__init__(dest, sources)

    def post_loop(self, d_rho, d_idx, d_rho_residual, d_summation_rho,
                  t):
        d_rho_residual[d_idx] = d_rho[d_idx] - d_summation_rho[d_idx]


class DensityNewtonRaphsonIteration(Equation):
    """(reference swe/basic.py:854)"""

    def __init__(self, dest, sources=None, dim=2):
        self.dim = dim
        super(DensityNewtonRaphsonIteration, self).__init__(dest,
                                                            sources)

    def initialize(self, d_rho, d_rho_prev_iter, d_idx):
        d_rho_prev_iter[d_idx] = d_rho[d_idx]

    def post_loop(self, d_rho, d_idx, d_alpha, d_rho_residual):
        a1 = d_rho_residual[d_idx] * self.dim
        a2 = a1 + d_alpha[d_idx]
        a2 = jnp.where(a2 != 0.0, a2, 1.0)
        const = 1 - (a1 / a2)
        d_rho[d_idx] = d_rho[d_idx] * const


class CheckConvergence(Equation):
    """(reference swe/basic.py:891)"""

    def __init__(self, dest, sources=None):
        super(CheckConvergence, self).__init__(dest, sources)

    def post_loop(self, d_positive_rho_residual, d_rho_residual,
                  d_rho_prev_iter, d_idx, t):
        d_positive_rho_residual[d_idx] = jnp.abs(
            d_rho_residual[d_idx])

    def reduce(self, dst, t, dt):
        mask = dst.active
        eps = jnp.max(jnp.where(
            mask, dst.positive_rho_residual[:] /
            dst.rho_prev_iter[:], 0.0))
        dst.swe_conv[0] = jnp.where(eps <= 1e-15, 1.0, -1.0)

    def converged(self, dst):
        return dst.swe_conv[0]


class SWEOS(Equation):
    """Shallow-water EOS (reference swe/basic.py:935)."""

    def __init__(self, dest, sources=None, g=9.81, rhow=1000.0):
        self.rhow = rhow
        self.g = g
        self.fac = 0.5 * (g / rhow)
        super(SWEOS, self).__init__(dest, sources)

    def post_loop(self, d_rho, d_cs, d_u, d_v, d_idx, d_p, d_dw,
                  d_dt_cfl, d_m, d_A, d_alpha):
        d_p[d_idx] = self.fac * (d_rho[d_idx]) ** 2
        d_cs[d_idx] = jnp.sqrt(self.g * d_rho[d_idx] / self.rhow)
        d_A[d_idx] = d_m[d_idx] / d_rho[d_idx]
        d_dw[d_idx] = d_rho[d_idx] / self.rhow
        d_dt_cfl[d_idx] = d_cs[d_idx] + jnp.sqrt(
            d_u[d_idx] ** 2 + d_v[d_idx] ** 2)


def mu_calc(hi, hj, velij_dot_rij, rij2):
    """(reference swe/basic.py:978)"""
    h_bar = (hi + hj) / 2.0
    eta2 = 0.01 * hi ** 2
    return (h_bar * velij_dot_rij) / (rij2 + eta2)


def artificial_visc(alpha, rij2, hi, hj, rhoi, rhoj, csi, csj, muij):
    """(reference swe/basic.py:998)"""
    cs_bar = (csi + csj) / 2.0
    rho_bar = (rhoi + rhoj) / 2.0
    return -(alpha * cs_bar * muij) / rho_bar


def viscosity_LF(alpha, rij2, hi, hj, rhoi, rhoj, csi, csj, muij):
    """Lax-Friedrichs-like viscosity (reference swe/basic.py:1022)."""
    cs_bar = (csi + csj) / 2.0
    rho_bar = (rhoi + rhoj) / 2.0
    eta2 = 0.01 * hi ** 2
    h_bar = (hi + hj) / 2.0
    tmp = (muij * jnp.sqrt(rij2 + eta2)) / h_bar
    return -(cs_bar * tmp) / rho_bar


class ParticleAcceleration(Equation):
    """SWE momentum equation with bottom terms
    (reference swe/basic.py:1053)."""

    def __init__(self, dest, sources, dim=2, u_only=False,
                 v_only=False, alpha=0.0, visc_option=2, rhow=1000.0):
        self.g = 9.81
        self.rhow = rhow
        self.ct = self.g / (2 * self.rhow)
        self.dim = dim
        self.u_only = u_only
        self.v_only = v_only
        self.alpha = alpha
        self.viscous_func = artificial_visc if visc_option == 1 else \
            viscosity_LF
        super(ParticleAcceleration, self).__init__(dest, sources)

    def initialize(self, d_idx, d_tu, d_tv):
        d_tu[d_idx] = 0.0
        d_tv[d_idx] = 0.0

    def loop(self, d_rho, d_idx, s_m, s_idx, s_rho, d_m, DWI, DWJ,
             s_alpha, d_alpha, s_p, d_p, d_tu, s_dw, d_dw, t,
             s_is_wall_boun_pa, s_tu, d_tv, s_tv, d_h, s_h, d_u, s_u,
             d_v, s_v, d_cs, s_cs, XIJ, VIJ, R2IJ):
        is_wall = s_is_wall_boun_pa[s_idx] == 1
        velij_dot_rij = VIJ[0] * XIJ[0] + VIJ[1] * XIJ[1]
        muij = mu_calc(d_h[d_idx], s_h[s_idx], velij_dot_rij, R2IJ)
        pi_visc = self.viscous_func(
            self.alpha, R2IJ, d_h[d_idx], s_h[s_idx], d_rho[d_idx],
            s_rho[s_idx], d_cs[d_idx], s_cs[s_idx], muij)
        pi_visc = jnp.where(is_wall | (velij_dot_rij >= 0), 0.0,
                            pi_visc)

        # the reference scatters d_dw into wall sources here
        # (s_dw[s_idx] = d_dw[d_idx]); apply the same value locally.
        dw_s = jnp.where(is_wall, d_dw[d_idx], s_dw[s_idx])
        tmp1 = (dw_s * self.rhow * self.dim) / s_alpha[s_idx]
        tmp2 = (d_dw[d_idx] * self.rhow * self.dim) / d_alpha[d_idx]

        d_tu[d_idx] += s_m[s_idx] * (
            (self.ct * tmp1 + 0.5 * pi_visc) * DWJ[0] +
            (self.ct * tmp2 + 0.5 * pi_visc) * DWI[0])
        d_tv[d_idx] += s_m[s_idx] * (
            (self.ct * tmp1 + 0.5 * pi_visc) * DWJ[1] +
            (self.ct * tmp2 + 0.5 * pi_visc) * DWI[1])

    def post_loop(self, d_idx, d_u, d_v, d_tu, d_tv, d_au, d_av,
                  d_Sfx, d_Sfy, d_bx, d_by, d_bxx, d_bxy, d_byy):
        vikivi = (d_u[d_idx] * d_u[d_idx] * d_bxx[d_idx] +
                  2 * d_u[d_idx] * d_v[d_idx] * d_bxy[d_idx] +
                  d_v[d_idx] * d_v[d_idx] * d_byy[d_idx])
        tidotgradbi = (d_tu[d_idx] * d_bx[d_idx] +
                       d_tv[d_idx] * d_by[d_idx])
        gradbidotgradbi = d_bx[d_idx] ** 2 + d_by[d_idx] ** 2
        temp3 = self.g + vikivi - tidotgradbi
        temp4 = 1 + gradbidotgradbi
        if not self.v_only:
            d_au[d_idx] = -(temp3 / temp4) * d_bx[d_idx] - \
                d_tu[d_idx] - d_Sfx[d_idx]
        if not self.u_only:
            d_av[d_idx] = -(temp3 / temp4) * d_by[d_idx] - \
                d_tv[d_idx] - d_Sfy[d_idx]


class FluidBottomElevation(Equation):
    """Shepard-interpolated bed elevation onto the fluid
    (reference swe/basic.py:1208)."""

    def initialize(self, d_b, d_shep_corr, d_idx):
        d_b[d_idx] = 0.0
        d_shep_corr[d_idx] = 0.0

    def loop(self, d_b, d_shep_corr, d_idx, s_b, s_idx, s_V, s_h, WJ):
        # the reference's loop_all recomputes W(h_j); WJ is exactly that
        d_b[d_idx] += s_b[s_idx] * WJ * s_V[s_idx]
        d_shep_corr[d_idx] += s_V[s_idx] * WJ

    def post_loop(self, d_b, d_shep_corr, d_idx):
        ok = d_shep_corr[d_idx] > 1e-14
        denom = jnp.where(ok, d_shep_corr[d_idx], 1.0)
        d_b[d_idx] = jnp.where(ok, d_b[d_idx] / denom, d_b[d_idx])


class FluidBottomGradient(Equation):
    """(reference swe/basic.py:1249)"""

    def initialize(self, d_idx, d_bx, d_by):
        d_bx[d_idx] = 0.0
        d_by[d_idx] = 0.0

    def loop(self, d_idx, d_bx, d_by, WJ, s_idx, s_bx, s_by, s_V):
        d_bx[d_idx] += s_bx[s_idx] * WJ * s_V[s_idx]
        d_by[d_idx] += s_by[s_idx] * WJ * s_V[s_idx]


class FluidBottomCurvature(Equation):
    """(reference swe/basic.py:1272)"""

    def initialize(self, d_idx, d_bx, d_by, d_bxx, d_bxy, d_byy):
        d_bxx[d_idx] = 0.0
        d_bxy[d_idx] = 0.0
        d_byy[d_idx] = 0.0

    def loop(self, d_idx, d_bxx, d_bxy, d_byy, WJ, s_idx, s_bxx,
             s_bxy, s_byy, s_V):
        d_bxx[d_idx] += s_bxx[s_idx] * WJ * s_V[s_idx]
        d_bxy[d_idx] += s_bxy[s_idx] * WJ * s_V[s_idx]
        d_byy[d_idx] += s_byy[s_idx] * WJ * s_V[s_idx]


class BedGradient(Equation):
    """(reference swe/basic.py:1298)"""

    def initialize(self, d_bx, d_by, d_idx):
        d_bx[d_idx] = 0.0
        d_by[d_idx] = 0.0

    def loop(self, d_bx, d_by, d_idx, s_b, s_idx, DWJ, s_V, RIJ):
        ok = RIJ > 1e-6
        d_bx[d_idx] += jnp.where(ok, s_b[s_idx] * DWJ[0] * s_V[s_idx],
                                 0.0)
        d_by[d_idx] += jnp.where(ok, s_b[s_idx] * DWJ[1] * s_V[s_idx],
                                 0.0)


class BedCurvature(Equation):
    """(reference swe/basic.py:1325)"""

    def initialize(self, d_bxx, d_bxy, d_byy, d_idx):
        d_bxx[d_idx] = 0.0
        d_bxy[d_idx] = 0.0
        d_byy[d_idx] = 0.0

    def loop(self, d_bxx, d_bxy, d_byy, d_b, d_idx, s_h, s_b, s_idx,
             XIJ, RIJ, DWJ, s_V):
        ok = RIJ > 1e-6
        r2 = jnp.where(ok, RIJ * RIJ, 1.0)
        eta = 0.01 * s_h[s_idx]
        temp1 = (d_b[d_idx] - s_b[s_idx]) / (r2 + eta ** 2)
        temp2 = XIJ[0] * DWJ[0] + XIJ[1] * DWJ[1]
        temp_bxx = ((4 * XIJ[0] ** 2 / r2) - 1) * temp1
        temp_bxy = (4 * XIJ[0] * XIJ[1] / r2) * temp1
        temp_byy = ((4 * XIJ[1] ** 2 / r2) - 1) * temp1
        d_bxx[d_idx] += jnp.where(ok, temp_bxx * temp2 * s_V[s_idx],
                                  0.0)
        d_bxy[d_idx] += jnp.where(ok, temp_bxy * temp2 * s_V[s_idx],
                                  0.0)
        d_byy[d_idx] += jnp.where(ok, temp_byy * temp2 * s_V[s_idx],
                                  0.0)


class BedFrictionSourceEval(Equation):
    """Manning friction (reference swe/basic.py:1364)."""

    def __init__(self, dest, sources):
        self.g = 9.8
        super(BedFrictionSourceEval, self).__init__(dest, sources)

    def initialize(self, d_n, d_idx):
        d_n[d_idx] = 0.0

    def loop(self, d_n, d_idx, s_n, s_idx, WJ, s_V, RIJ):
        ok = RIJ > 1e-6
        d_n[d_idx] += jnp.where(ok, s_n[s_idx] * WJ * s_V[s_idx], 0.0)

    def post_loop(self, d_idx, d_Sfx, d_Sfy, d_u, d_v, d_n, d_dw):
        vmag = jnp.sqrt(d_u[d_idx] ** 2 + d_v[d_idx] ** 2)
        dw = jnp.where(d_dw[d_idx] > 0.0, d_dw[d_idx], 1.0)
        temp = (self.g * d_n[d_idx] ** 2 * vmag) / dw ** (4.0 / 3.0)
        d_Sfx[d_idx] = d_u[d_idx] * temp
        d_Sfy[d_idx] = d_v[d_idx] * temp


class BoundaryInnerReimannStateEval(Equation):
    """Interior Riemann state interpolated onto open-boundary
    particles (reference swe/basic.py:1398)."""

    def initialize(self, d_u_inner_reimann, d_v_inner_reimann,
                   d_dw_inner_reimann, d_shep_corr, d_idx):
        d_u_inner_reimann[d_idx] = 0.0
        d_v_inner_reimann[d_idx] = 0.0
        d_dw_inner_reimann[d_idx] = 0.0
        d_shep_corr[d_idx] = 0.0

    def loop(self, d_u_inner_reimann, d_v_inner_reimann, d_shep_corr,
             d_dw_inner_reimann, d_idx, WI, s_m, s_u, s_v, s_rho,
             s_dw, s_idx):
        tmp = WI * (s_m[s_idx] / s_rho[s_idx])
        d_shep_corr[d_idx] += tmp
        d_u_inner_reimann[d_idx] += s_u[s_idx] * tmp
        d_v_inner_reimann[d_idx] += s_v[s_idx] * tmp
        d_dw_inner_reimann[d_idx] += s_dw[s_idx] * tmp

    def post_loop(self, d_u_inner_reimann, d_v_inner_reimann,
                  d_dw_inner_reimann, d_shep_corr, d_idx):
        ok = d_shep_corr[d_idx] > 1e-14
        denom = jnp.where(ok, d_shep_corr[d_idx], 1.0)
        d_u_inner_reimann[d_idx] = jnp.where(
            ok, d_u_inner_reimann[d_idx] / denom,
            d_u_inner_reimann[d_idx])
        d_v_inner_reimann[d_idx] = jnp.where(
            ok, d_v_inner_reimann[d_idx] / denom,
            d_v_inner_reimann[d_idx])
        d_dw_inner_reimann[d_idx] = jnp.where(
            ok, d_dw_inner_reimann[d_idx] / denom,
            d_dw_inner_reimann[d_idx])


class SubCriticalInFlow(Equation):
    """(reference swe/basic.py:1454)"""

    def __init__(self, dest, dim=2, rhow=1000.0):
        self.g = 9.8
        self.dim = dim
        self.rhow = rhow
        super(SubCriticalInFlow, self).__init__(dest, None)

    def post_loop(self, d_dw, d_dw_inner_reimann, d_u,
                  d_u_inner_reimann, d_rho, d_alpha, d_cs, d_idx):
        const = 1.0 / (2.0 * np.sqrt(self.g))
        d_dw[d_idx] = (const * (d_u_inner_reimann[d_idx] -
                                d_u[d_idx]) +
                       jnp.sqrt(d_dw_inner_reimann[d_idx])) ** 2
        d_rho[d_idx] = d_dw[d_idx] * self.rhow
        d_alpha[d_idx] = self.dim * d_rho[d_idx]
        d_cs[d_idx] = jnp.sqrt(self.g * d_dw[d_idx])


class SubCriticalOutFlow(Equation):
    """(reference swe/basic.py:1498)"""

    def __init__(self, dest, dim=2, rhow=1000.0):
        self.g = 9.8
        self.dim = dim
        self.rhow = rhow
        super(SubCriticalOutFlow, self).__init__(dest, None)

    def post_loop(self, d_dw, d_dw_inner_reimann, d_u,
                  d_u_inner_reimann, d_rho, d_cs, d_alpha, d_v,
                  d_v_inner_reimann, d_idx):
        const = 2.0 * np.sqrt(self.g)
        d_u[d_idx] = (d_u_inner_reimann[d_idx] +
                      const * (jnp.sqrt(d_dw_inner_reimann[d_idx]) -
                               jnp.sqrt(d_dw[d_idx])))
        d_v[d_idx] = d_v_inner_reimann[d_idx]


class SubCriticalTimeVaryingOutFlow(Equation):
    """(reference swe/basic.py:1542)"""

    def __init__(self, dest, dim=2, rhow=1000.0):
        self.g = 9.8
        self.dim = dim
        self.rhow = rhow
        super(SubCriticalTimeVaryingOutFlow, self).__init__(dest, None)

    def post_loop(self, d_dw, d_dw_inner_reimann, d_u,
                  d_u_inner_reimann, d_rho, d_cs, d_alpha, d_v,
                  d_v_inner_reimann, d_idx, d_dw_at_t):
        d_dw[d_idx] = d_dw_at_t[d_idx]
        d_rho[d_idx] = d_dw[d_idx] * self.rhow
        d_cs[d_idx] = jnp.sqrt(d_dw[d_idx] * self.g)
        d_alpha[d_idx] = d_rho[d_idx] * self.dim
        const = 2.0 * np.sqrt(self.g)
        d_u[d_idx] = (d_u_inner_reimann[d_idx] +
                      const * (jnp.sqrt(d_dw_inner_reimann[d_idx]) -
                               jnp.sqrt(d_dw[d_idx])))
        d_v[d_idx] = d_v_inner_reimann[d_idx]


class SuperCriticalOutFlow(Equation):
    """(reference swe/basic.py:1593)"""

    def __init__(self, dest, dim=2, rhow=1000.0):
        self.g = 9.8
        self.dim = dim
        self.rhow = rhow
        super(SuperCriticalOutFlow, self).__init__(dest, None)

    def post_loop(self, d_dw, d_rho, d_dw_inner_reimann,
                  d_u_inner_reimann, d_u, d_v, d_v_inner_reimann,
                  d_alpha, d_cs, d_idx):
        d_u[d_idx] = d_u_inner_reimann[d_idx]
        d_v[d_idx] = d_v_inner_reimann[d_idx]
        d_dw[d_idx] = d_dw_inner_reimann[d_idx]
        d_rho[d_idx] = d_dw[d_idx] * self.rhow
        d_alpha[d_idx] = self.dim * d_rho[d_idx]
        d_cs[d_idx] = jnp.sqrt(self.g * d_dw[d_idx])


class GradientCorrectionPreStep(Equation):
    """SWE variant of the Bonet-Lok moment matrix, weighted by
    |dW| (reference swe/basic.py:1640)."""

    def __init__(self, dest, sources, dim=2):
        self.dim = dim
        super(GradientCorrectionPreStep, self).__init__(dest, sources)

    def initialize(self, d_idx, d_m_mat):
        for i in range(9):
            d_m_mat[9 * d_idx + i] = 0.0

    def loop(self, d_idx, d_m_mat, s_V, s_idx, XIJ, RIJ, DWIJ, HIJ,
             SPH_KERNEL):
        n = self.dim
        dwij = SPH_KERNEL.gradient(XIJ, RIJ, HIJ)
        dw = jnp.sqrt(dwij[0] ** 2 + dwij[1] ** 2 + dwij[2] ** 2)
        ok = RIJ >= 1e-12
        r = jnp.where(ok, RIJ, 1.0)
        V = s_V[s_idx]
        for i in range(n):
            for j in range(n):
                d_m_mat[9 * d_idx + 3 * i + j] += jnp.where(
                    ok, (dw * V * XIJ[i] * XIJ[j]) / r, 0.0)


class GradientCorrection(Equation):
    """Correct DWJ with the inverse moment matrix
    (reference swe/basic.py:1686)."""

    def __init__(self, dest, sources, dim=2, tol=0.5):
        self.dim = dim
        self.tol = tol
        super(GradientCorrection, self).__init__(dest, sources)

    def loop(self, d_idx, d_m_mat, DWJ, s_h, s_idx):
        n = self.dim
        eps = 1.0e-4 * s_h[s_idx]
        rows = []
        for i in range(n):
            cols = []
            for j in range(n):
                c = d_m_mat[9 * d_idx + 3 * i + j]
                cols.append(c[..., 0] if c.ndim == 3 else c)
            rows.append(jnp.stack(cols, axis=-1))
        A = jnp.stack(rows, axis=-2)         # (C, M, n, n)
        det = jnp.linalg.det(A)
        good = jnp.abs(det) > 1e-12
        eye = jnp.broadcast_to(jnp.eye(n), A.shape)
        Ainv = jnp.linalg.inv(jnp.where(good[..., None, None], A,
                                        eye))
        res = []
        for i in range(n):
            acc = 0.0
            for j in range(n):
                acc = acc + Ainv[..., i, j][..., None] * DWJ[j]
            res.append(acc)
        change = sum(jnp.abs(DWJ[i] - res[i]) /
                     (jnp.abs(DWJ[i]) + eps) for i in range(n))
        ok = (change <= self.tol) & good[..., None]
        for i in range(n):
            DWJ[i] = jnp.where(ok, res[i], DWJ[i])


class RemoveOutofDomainParticles(Equation):
    """Flag + host-remove out-of-domain particles
    (reference swe/basic.py:1740)."""

    def __init__(self, dest, x_min=-1e9, x_max=1e9, y_min=-1e9,
                 y_max=1e9):
        self.x_min = x_min
        self.x_max = x_max
        self.y_min = y_min
        self.y_max = y_max
        super(RemoveOutofDomainParticles, self).__init__(dest, None)

    def initialize(self, d_pa_out_of_domain, d_x, d_y, d_idx):
        out = ((d_x[d_idx] < self.x_min) | (d_x[d_idx] > self.x_max) |
               (d_y[d_idx] < self.y_min) | (d_y[d_idx] > self.y_max))
        d_pa_out_of_domain[d_idx] = jnp.where(out, 1.0, 0.0)

    @staticmethod
    def remove(pa):
        idx = np.where(np.asarray(pa.pa_out_of_domain) > 0)[0]
        if idx.size:
            pa.remove_particles(idx)


class RemoveCloseParticlesAtOpenBoundary(Equation):
    """(reference swe/basic.py:1790)"""

    def __init__(self, dest, sources, min_dist_ob=0.0):
        self.min_dist_ob = min_dist_ob
        super(RemoveCloseParticlesAtOpenBoundary,
              self).__init__(dest, sources)

    def initialize(self, d_idx, d_ob_pa_to_remove):
        d_ob_pa_to_remove[d_idx] = 0.0

    def loop(self, d_idx, d_ob_pa_to_tag, d_ob_pa_to_remove, RIJ):
        close = ((d_ob_pa_to_tag[d_idx] > 0) & (RIJ > 1e-12) &
                 (RIJ < self.min_dist_ob))
        hit = jnp.where(close, 1.0, 0.0)
        d_ob_pa_to_remove[d_idx] = MAX(hit, d_ob_pa_to_remove[d_idx])

    @staticmethod
    def remove(pa):
        idx = np.where(np.asarray(pa.ob_pa_to_remove) > 0)[0]
        if idx.size:
            pa.remove_particles(idx)
        pa.ob_pa_to_tag[:] = 0


class RemoveFluidParticlesWithNoNeighbors(Equation):
    """(reference swe/basic.py:1844)"""

    def initialize(self, d_idx, d_fluid_pa_to_remove):
        d_fluid_pa_to_remove[d_idx] = 0.0

    def loop(self, d_idx, d_fluid_pa_to_remove, d_h, RIJ, PAIR_MASK):
        near = jnp.where(PAIR_MASK & (RIJ > 1e-12) &
                         (RIJ <= 2 * d_h[d_idx]), 1.0, 0.0)
        d_fluid_pa_to_remove[d_idx] = MAX(near,
                                          d_fluid_pa_to_remove[d_idx])

    def post_loop(self, d_idx, d_fluid_pa_to_remove):
        d_fluid_pa_to_remove[d_idx] = 1.0 - d_fluid_pa_to_remove[d_idx]

    @staticmethod
    def remove(pa):
        idx = np.where(np.asarray(pa.fluid_pa_to_remove) > 0)[0]
        if idx.size:
            pa.remove_particles(idx)


class SWEInletOutletStep(IntegratorStep):
    """(reference swe/basic.py:1879)"""

    def initialize(self):
        pass

    def stage1(self, d_idx, d_x, d_y, d_uh, d_vh, d_u, d_v, dt):
        dtb2 = 0.5 * dt
        d_uh[d_idx] = d_u[d_idx]
        d_vh[d_idx] = d_v[d_idx]
        d_x[d_idx] += dtb2 * d_u[d_idx]
        d_y[d_idx] += dtb2 * d_v[d_idx]

    def stage2(self, d_idx, d_x, d_y, d_u, d_v, dt):
        dtb2 = 0.5 * dt
        d_x[d_idx] += dtb2 * d_u[d_idx]
        d_y[d_idx] += dtb2 * d_v[d_idx]


class SWEInlet(object):
    """Open-boundary inlet stacking ``n`` layers of the seed particles
    and recycling them into the destination array (reference
    swe/basic.py:1900).  Host-side particle management."""

    def __init__(self, inlet_pa, dest_pa, source_pa, spacing, n=5,
                 axis='x', xmin=-1.0, xmax=1.0, ymin=-1.0, ymax=1.0,
                 callback=None):
        self.inlet_pa = inlet_pa
        self.dest_pa = dest_pa
        self.spacing = spacing
        self.source_pa = source_pa
        self.callback = callback
        assert axis in ('x', 'y')
        self.axis = axis
        self.n = n
        self.xmin, self.xmax = xmin, xmax
        self.ymin, self.ymax = ymin, ymax
        self._create_inlet_particles()

    def _create_inlet_particles(self):
        props = self.inlet_pa.get_property_arrays()
        inlet_props = {}
        for prop, array in props.items():
            stacked = []
            for i in range(1, self.n):
                if prop == self.axis:
                    stacked.append(array - i * self.spacing)
                else:
                    stacked.append(array)
            inlet_props[prop] = (np.concatenate(stacked) if stacked
                                 else np.array([], dtype=array.dtype))
        self.inlet_pa.add_particles(**inlet_props)

    def update(self, t, dt, stage):
        inlet_pa = self.inlet_pa
        xmin, xmax = self.xmin, self.xmax
        ymin, ymax = self.ymin, self.ymax
        lx, ly = xmax - xmin, ymax - ymin
        x = np.asarray(inlet_pa.x)
        y = np.asarray(inlet_pa.y)

        xcond = x > xmax
        ycond = y > ymax
        all_idx = np.where(xcond | ycond)[0]
        x_idx = np.where(xcond)[0]
        y_idx = np.where(ycond)[0]

        # particles that crossed the boundary enter the fluid
        props = inlet_pa.get_property_arrays()
        self.dest_pa.add_particles(**{p: np.array(a[all_idx])
                                      for p, a in props.items()})

        # wrap them back into the inlet band
        inlet_pa.x[x_idx] -= np.sign(inlet_pa.x[x_idx] - xmax) * lx
        inlet_pa.y[y_idx] -= np.sign(inlet_pa.y[y_idx] - ymax) * ly
        inlet_pa.ob_pa_to_tag[all_idx] = 1

        # pull fresh particles from the source block into the inlet
        source_pa = self.source_pa
        sx = np.asarray(source_pa.x)
        sy = np.asarray(source_pa.y)
        idx = np.where((sx <= xmax) & (sx >= xmin) & (sy <= ymax) &
                       (sy >= ymin))[0]
        props = source_pa.get_property_arrays()
        pa_add = {p: np.array(a[idx]) for p, a in props.items()}
        if 'ob_pa_to_tag' in pa_add:
            pa_add['ob_pa_to_tag'] = np.ones_like(
                pa_add['ob_pa_to_tag'])
        if self.callback is not None:
            self.callback(inlet_pa, pa_add)
        inlet_pa.add_particles(**pa_add)
        source_pa.remove_particles(idx)

        # drop inlet particles that left the band entirely
        x = np.asarray(inlet_pa.x)
        y = np.asarray(inlet_pa.y)
        idx = np.where((x > xmax) | (x < xmin) | (y > ymax) |
                       (y < ymin))[0]
        inlet_pa.remove_particles(idx)
