"""Particle shifting (parity with
/root/reference/pysph/sph/wc/shift.py): SimpleShift [XuStaLau2009],
FickianShift [LiXuStaRo2012], velocity correction and the ShiftPositions
tool."""

import jax.numpy as jnp

from pysph_tpu.sph.equation import Equation
from pysph_tpu.solver.tools import Tool


class SimpleShift(Equation):
    """Simple shift, eq. (35) of [XuStaLau2009]
    (reference shift.py:33).  The global vmax reduction happens inline
    (the reference needs a host-side py_initialize)."""

    def __init__(self, dest, sources, const=0.04):
        self.beta = const
        super(SimpleShift, self).__init__(dest, sources)

    def loop_all(self, d_idx, d_x, d_y, d_z, d_u, d_v, d_w, s_idx,
                 s_x, s_y, s_z, d_vmax, d_dpos, dt, N_NBRS, PAIR_MASK,
                 XIJ, RIJ):
        vmag2 = (d_u[d_idx] * d_u[d_idx] + d_v[d_idx] * d_v[d_idx] +
                 d_w[d_idx] * d_w[d_idx])
        vmax = jnp.sqrt(jnp.max(vmag2))
        d_vmax[0] = vmax
        eps = 1.0e-8
        r3 = RIJ * RIJ * RIJ
        m = PAIR_MASK
        dxi = jnp.sum(jnp.where(m, XIJ[0] / (r3 + eps), 0.0), axis=2)
        dyi = jnp.sum(jnp.where(m, XIJ[1] / (r3 + eps), 0.0), axis=2)
        dzi = jnp.sum(jnp.where(m, XIJ[2] / (r3 + eps), 0.0), axis=2)
        nn = jnp.maximum(N_NBRS[..., 0], 1)
        ri = jnp.sum(jnp.where(m, RIJ, 0.0), axis=2) / nn
        fac = self.beta * ri * ri * vmax * dt
        d_dpos[d_idx * 3 + 0] = fac * dxi
        d_dpos[d_idx * 3 + 1] = fac * dyi
        d_dpos[d_idx * 3 + 2] = fac * dzi
        d_x[d_idx] += d_dpos[d_idx * 3 + 0]
        d_y[d_idx] += d_dpos[d_idx * 3 + 1]
        d_z[d_idx] += d_dpos[d_idx * 3 + 2]


class FickianShift(Equation):
    """Fickian shift, eq. (21-24) of [LiXuStaRo2012]
    (reference shift.py:74)."""

    def __init__(self, dest, sources, fickian_const=10,
                 tensile_const=0.2, tensile_pow=4, hdx=1.0,
                 tensile_correction=False):
        self.fickian_const = fickian_const
        self.tensile_const = tensile_const
        self.tensile_pow = tensile_pow
        self.hdx = hdx
        self.tensile_correction = tensile_correction
        super(FickianShift, self).__init__(dest, sources)

    def loop_all(self, d_idx, d_x, d_y, d_z, d_u, d_v, d_w, d_h,
                 s_idx, s_m, s_rho, dt, d_dpos, PAIR_MASK, WIJ, DWIJ,
                 SPH_KERNEL):
        hi = d_h[d_idx]
        vmag = jnp.sqrt(d_u[d_idx] ** 2 + d_v[d_idx] ** 2 +
                        d_w[d_idx] ** 2)
        Vj = s_m[s_idx] / s_rho[s_idx]
        fij = 0.0
        if self.tensile_correction:
            dx0 = hi / self.hdx
            wdx = SPH_KERNEL.kernel(None, dx0, hi)
            fij = self.tensile_const * (WIJ / wdx) ** self.tensile_pow
        m = PAIR_MASK
        gc = [jnp.sum(jnp.where(m, Vj * (1 + fij) * DWIJ[i], 0.0),
                      axis=2) for i in range(3)]
        fac = -self.fickian_const * hi[..., 0] * vmag[..., 0] * dt
        d_dpos[d_idx * 3 + 0] = fac * gc[0]
        d_dpos[d_idx * 3 + 1] = fac * gc[1]
        d_dpos[d_idx * 3 + 2] = fac * gc[2]
        d_x[d_idx] += d_dpos[d_idx * 3 + 0]
        d_y[d_idx] += d_dpos[d_idx * 3 + 1]
        d_z[d_idx] += d_dpos[d_idx * 3 + 2]


class CorrectVelocities(Equation):
    """First-order velocity correction after a shift, eq. (34) of
    [XuStaLau2009] (reference shift.py:135)."""

    def initialize(self, d_idx, d_gradv):
        for i in range(9):
            d_gradv[9 * d_idx + i] = 0.0

    def loop(self, d_idx, s_idx, s_m, s_rho, d_gradv, DWIJ, VIJ):
        Vj = s_m[s_idx] / s_rho[s_idx]
        for alp in range(3):
            for bet in range(3):
                d_gradv[d_idx * 9 + 3 * bet + alp] += \
                    -Vj * VIJ[alp] * DWIJ[bet]

    def post_loop(self, d_idx, d_u, d_v, d_w, d_gradv, d_dpos):
        res = []
        for i in range(3):
            tmp = 0.0
            for j in range(3):
                tmp = tmp + d_gradv[d_idx * 9 + 3 * i + j] * \
                    d_dpos[d_idx * 3 + j]
            res.append(tmp)
        d_u[d_idx] += res[0]
        d_v[d_idx] += res[1]
        d_w[d_idx] += res[2]


class ShiftPositions(Tool):
    """Post-step particle shifting tool (reference shift.py:191)."""

    def __init__(self, app, array_name, freq=1, shift_kind='simple',
                 correct_velocity=False, parameter=None):
        from pysph_tpu.solver.utils import get_array_by_name
        self.particles = app.particles
        self.dt = app.solver.dt
        self.dim = app.solver.dim
        self.kernel = app.solver.kernel
        self.array = get_array_by_name(self.particles, array_name)
        self.freq = freq
        self.kind = shift_kind
        self.correct_velocity = correct_velocity
        self.parameter = parameter
        self.count = 1
        self._sph_eval = None
        if self.kind not in ('simple', 'fickian'):
            raise ValueError("shift_kind should be 'simple' or "
                             "'fickian'")

    def _get_sph_eval(self, kind):
        from pysph_tpu.sph.equation import Group
        from pysph_tpu.tools.sph_evaluator import SPHEvaluator
        if self._sph_eval is None:
            arr = self.array
            name = arr.name
            eqns = []
            if 'vmax' not in arr.constants:
                arr.add_constant('vmax', [0.0])
            if 'dpos' not in arr.properties:
                arr.add_property('dpos', stride=3)
            if kind == 'simple':
                const = self.parameter or 0.04
                eqns.append(Group(equations=[
                    SimpleShift(name, [name], const=const)],
                    update_nnps=True))
            else:
                const = self.parameter or 4
                eqns.append(Group(equations=[
                    FickianShift(name, [name], fickian_const=const)],
                    update_nnps=True))
            if self.correct_velocity:
                if 'gradv' not in arr.properties:
                    arr.add_property('gradv', stride=9)
                eqns.append(Group(equations=[
                    CorrectVelocities(name, [name])]))
            return SPHEvaluator(arrays=[arr], equations=eqns,
                                dim=self.dim, kernel=self.kernel)
        return self._sph_eval

    def post_step(self, solver):
        if self.freq == 0:
            return
        if self.count % self.freq == 0:
            self._sph_eval = self._get_sph_eval(self.kind)
            solver._sync_to_host()
            self._sph_eval.evaluate(dt=solver.dt)
            solver._sync_to_device()
        self.count += 1
