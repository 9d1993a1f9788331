"""Resident-pack execution: particle state lives in the pallas pack
layout between re-binnings.

Round-2 profiling showed the eval was dominated by *rebuilding* the
kernel's compact packs from flat particle arrays every evaluation
(~16 ms of a 36.6 ms dam_break_3d eval: the (rows, P) gathers, barrier
transposes and (A, tz, P*M) pack gathers of ops/pallas_engine.py, paid
twice per step), even though the binning itself is reused Verlet-style
for many steps.  This module inverts the data residency:

- at (re)binning time, each array's state is packed ONCE into a
  lane-folded *pencil* pack ``(1 + A, R, P*M)`` over the active (x, y)
  pencils (entry 0 reserved all-zero; R = z-extent padded to the
  sublane multiple; plane p of pencil a's z-row r lives in lanes
  [p*M, (p+1)*M));
- integrator stages and per-particle equation phases run elementwise
  directly on the pack planes (empty slots are masked);
- pair phases DMA the resident packs straight into the pallas kernel
  (dest block = its own pencil; sources = the 9 (ox, oy) neighbor
  pencils via an inverse map; the 3 z-offsets are assembled in-kernel
  with static sublane shifts instead of the old pre-rolled 3*Ms HBM
  lane-concat);
- flat (cap,)-shaped arrays are re-materialized only at host sync
  points (output dumps, restarts, overflow redo) and at re-binning.

The flat state dicts the Solver carries become *stale* for pack props
between sync points; ``materialize`` folds the packs back.  Pack
shapes are static (active-pencil cap = GridSpec.block_fracs), so the
whole arrangement scans/jits cleanly; exceeding a cap raises the same
``block_overflow`` redo path as the compact engine.

Eligibility is deliberately conservative (``plan_resident``): one
acceleration eval, no distributed manager, no mirror ghosts, no
iterated/conditional/update_nnps groups, no reduce/initialize_pair/
loop_all, unstrided props only, and every pair phase must trace for
the pallas engine.  Anything else transparently falls back to the
SlotStore path.

Reference parity note: this changes only the execution layout, not the
math — the same Equation.loop bodies trace inside the kernel via the
machinery of ops/pallas_engine.py (recording pass, PlanePairContext,
delta-subtraction accumulation, write masks ref
sph/acceleration_eval_cython.mako:22-131).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from pysph_tpu.ops.pallas_engine import (
    _SYM_DEPS, _XYZH, PallasIneligible, PlanePairContext, _KernelRunner,
    _compiler_kwargs, _left_pack, _pack_from_rows, _pad_up, _record,
    _rows_matrix, _run_eqs)
from pysph_tpu.sph.equation import Group, _method_args


class PackState(NamedTuple):
    """One array's resident pack (all leaves traced; static geometry
    lives in the ResidentPlan)."""
    pack: jnp.ndarray      # (1 + A, R, P*M) fdt; entry 0 all-zero
    pid: jnp.ndarray       # (1 + A, R, M) int32 particle idx, -1 empty
    inv: jnp.ndarray       # (nx*ny,) int32 pencil -> entry idx (0=none)
    ref: jnp.ndarray       # (1 + A, R, 3*M) x/y/z snapshot at binning
    n_a: jnp.ndarray       # () int32 active pencils
    ovf: jnp.ndarray       # () bool pencil-cap overflow


jax.tree_util.register_pytree_node(
    PackState, lambda p: (tuple(p), None),
    lambda _, c: PackState(*c))


class ArrayPlan(object):
    """Static pack geometry + plane assignment for one array."""

    __slots__ = ('name', 'M', 'A', 'planes', 'n_src', 'consts',
                 'dtype')

    def __init__(self, name, M, A, planes, n_src, consts, dtype):
        self.name = name
        self.M = M                  # slots per cell
        self.A = A                  # active-pencil cap
        # plane 0 is the slot mask; planes[i] names plane 1 + i.  The
        # first n_src planes (after the mask) are the source-read
        # segment: source views DMA only lanes [0, (1 + n_src) * M).
        self.planes = planes
        self.n_src = n_src
        self.consts = consts
        self.dtype = dtype

    def plane_idx(self, prop):
        return 1 + self.planes.index(prop)


def _kernel_geom(spec):
    """(nx, ny, nz, R, kper, swapped): kernel axes after the 1D/2D
    swap (rows = the longest trailing axis), R = nz padded to 8."""
    nx, ny, nz = spec.dims
    per = spec.periodic
    kper = tuple(per[d] and spec.dims[d] >= 3 for d in range(3))
    swapped = nz == 1
    if swapped:
        ny, nz = 1, ny
        kper = (kper[0], kper[2], kper[1])
    R = max(8, _pad_up(nz, 8))
    return nx, ny, nz, R, kper, swapped


# ---------------------------------------------------------------------------
# Planning / eligibility
# ---------------------------------------------------------------------------
class ResidentPlan(object):
    """Static plan: array plans + per-group pair plans for one
    AccelerationEval."""

    def __init__(self, a_eval):
        self.a_eval = a_eval
        self.arrays = {}            # name -> ArrayPlan
        self.group_plans = []       # [(group, [(dest, phases, rec)])]
        self._build(a_eval)

    # -- eligibility ---------------------------------------------------
    def _build(self, a_eval):
        from pysph_tpu.sph.acceleration_eval import SlotStore  # noqa
        spec = a_eval.grid_spec
        if spec is None:
            raise PallasIneligible('no grid spec')
        if getattr(spec, 'stratified', False):
            raise PallasIneligible('stratified variable-h grid')
        nx, ny, nz, R, kper, swapped = _kernel_geom(spec)
        if R > 512:
            raise PallasIneligible('z extent too tall for pencils')
        for d in range(spec.dim):
            if spec.periodic[d] and spec.dims[d] == 2:
                raise PallasIneligible('periodic axis with 2 cells')
        dom = a_eval.domain
        if dom is not None and getattr(dom, 'is_mirror', False):
            raise PallasIneligible('mirror ghosts mutate particle sets')

        touched = {n: set() for n in a_eval.arrays_used}
        src_read = {n: set() for n in a_eval.arrays_used}

        def note(name, props):
            if name in touched:
                touched[name].update(props)

        groups = a_eval.groups
        for group in groups:
            self._check_group(group)
        for eq in a_eval._iter_equations():
            if hasattr(eq, 'py_initialize'):
                raise PallasIneligible('py_initialize')
            if getattr(eq, 'initialize_pair', None) is not None:
                raise PallasIneligible('initialize_pair')
            if getattr(eq, 'loop_all', None) is not None:
                raise PallasIneligible('loop_all')
            # reduce()/converged() access dest props as ``dst.<prop>``
            # attributes, invisible to the signature scan below — pull
            # them from the source text so those props become pack
            # planes (a prop read only by reduce would otherwise fall
            # through to the STALE flat copy)
            for fname in ('reduce', 'converged'):
                fn = getattr(eq, fname, None)
                if fn is None:
                    continue
                import inspect
                import re
                try:
                    src = inspect.getsource(fn)
                except (OSError, TypeError):
                    raise PallasIneligible(
                        '%s() without inspectable source' % fname)
                note(eq.dest, tuple(
                    re.findall(r'dst\.(\w+)', src)))
            for fname in ('initialize', 'loop', 'post_loop'):
                fn = getattr(eq, fname, None)
                if fn is None:
                    continue
                for arg in _method_args(fn):
                    if arg in ('d_idx', 's_idx', 't', 'dt',
                               'SPH_KERNEL', 'D_PIDX', 'PAIR_MASK',
                               'NBRS', 'N_NBRS'):
                        continue
                    if arg.startswith('d_'):
                        note(eq.dest, (arg[2:],))
                    elif arg.startswith('s_'):
                        for s in (eq.sources or ()):
                            note(s, (arg[2:],))
                            if fname == 'loop' and s in src_read:
                                src_read[s].add(arg[2:])
                    elif arg in _SYM_DEPS:
                        note(eq.dest, _SYM_DEPS[arg])
                        for s in (eq.sources or ()):
                            note(s, _SYM_DEPS[arg])
                            if s in src_read:
                                src_read[s].update(_SYM_DEPS[arg])

        # pair phases always need positions + h for masks/windows
        for n in touched:
            touched[n].update(_XYZH + ('tag',))
            src_read[n].update(_XYZH)

        # stepper stages (bound later by the integrator) are noted by
        # the integrator via note_stepper_props before first use
        self.touched = touched
        self.src_read = src_read
        self.spec = spec
        self.geom = (nx, ny, nz, R, kper, swapped)

    @staticmethod
    def _check_group(group):
        if group.condition is not None or group.update_nnps:
            raise PallasIneligible('conditional/update_nnps group')
        if group.pre is not None or group.post is not None:
            raise PallasIneligible('host pre/post callables')
        start = getattr(group, 'start_idx', 0)
        if start not in (0, None) or \
                getattr(group, 'stop_idx', None) is not None:
            raise PallasIneligible('start/stop idx group')
        for item in group.equations:
            if isinstance(item, Group):
                ResidentPlan._check_group(item)

    def finish(self, schemas, stepper_props, states):
        """Assign plane orders once stepper props are known."""
        nx, ny, nz, R, kper, swapped = self.geom
        spec = self.spec
        for name in self.a_eval.arrays_used:
            schema = schemas[name]
            props = (self.touched[name] |
                     stepper_props.get(name, set())) - \
                set(schema.consts)
            # the reduce()/converged() source scan can surface
            # non-prop attribute names (dst.mask, dst.active, view
            # helpers); only schema props become planes
            props &= set(schema.props)
            # adaptive-dt control props are read by
            # Integrator.compute_time_step against the pack-shaped
            # active mask; fold them in even when no equation writes
            # them
            props |= {p for p in ('dt_adapt', 'dt_cfl', 'dt_force',
                                  'dt_visc')
                      if p in schema.props and p not in schema.consts}
            fdt = states[name]['x'].dtype
            cap = states[name]['x'].shape[0]
            for p in props:
                d = states[name][p].dtype
                if (fdt == jnp.float32 and cap > (1 << 24) and
                        (jnp.issubdtype(d, jnp.integer) or
                         d == jnp.bool_)):
                    # f32 planes round-trip ints exactly only to 2^24
                    # (gid et al. would silently corrupt)
                    raise PallasIneligible(
                        'integer prop %r with particle cap > 2^24 '
                        'on f32 packs' % p)
                if states[name][p].dtype != fdt:
                    # integer props ride as fdt planes (values are
                    # small ints; f32 is exact to 2^24)
                    if not (jnp.issubdtype(states[name][p].dtype,
                                           jnp.integer) or
                            states[name][p].dtype == jnp.bool_):
                        raise PallasIneligible(
                            'mixed float dtype prop %r' % p)
            srcs_set = (self.src_read[name] | set(_XYZH)) - \
                set(schema.consts)

            # strided props (delta-SPH gradrho, CRKSPH moment
            # matrices, solid-mech tensors) ride as one pack plane
            # PER COLUMN, keyed (name, col) — the same convention as
            # the compact engine's plane keys (pallas_engine._pkey)
            def expand(p):
                s = schema.strides.get(p, 1)
                if s == 1:
                    return [p]
                return [(p, c) for c in range(s)]

            from pysph_tpu.ops.pallas_engine import _pkey
            # x/y/z/h first: every pair phase reads them (windows,
            # symbols), so phase-subset DMA widths stay minimal
            srcs = [p for p in _XYZH if p in srcs_set] + \
                [k for p in sorted(srcs_set - set(_XYZH))
                 for k in expand(p)]
            rest = [k for p in sorted(props - srcs_set - set(_XYZH))
                    for k in expand(p) if k not in srcs]
            planes = tuple(srcs + sorted(rest, key=_pkey))
            M = spec.capacity_for(name)
            B = nx * ny
            frac = spec.block_frac_for(name)
            A = min(B, int(np.ceil(frac * B)) + 8) if frac < 1.0 \
                else B
            self.arrays[name] = ArrayPlan(
                name, M, A, planes, len(srcs),
                tuple(sorted(schema.consts)), fdt)

    def int_planes(self, name, state):
        """Props whose flat dtype is integer/bool (stored as fdt
        planes; cast back on fold).  ``state`` is the one array's
        flat state dict."""
        ap = self.arrays[name]
        out = {}
        for p in ap.planes:
            base = p[0] if isinstance(p, tuple) else p
            d = state[base].dtype
            if jnp.issubdtype(d, jnp.integer) or d == jnp.bool_:
                out[p] = d
        return out


# ---------------------------------------------------------------------------
# Build / fold
# ---------------------------------------------------------------------------
def _active_pencils(layout, M, nx, ny, nz, A):
    """Activity-sorted pencil ids + inverse map (entry 0 reserved)."""
    C = nx * ny * nz
    occ = jnp.any(layout.slot_mask.reshape(nx * ny, nz * M), axis=1)
    n_a = jnp.sum(occ.astype(jnp.int32))
    order = jnp.argsort(~occ).astype(jnp.int32)[:A]
    ar = jnp.arange(A, dtype=jnp.int32)
    last = order[jnp.clip(n_a - 1, 0, A - 1)]
    ids = jnp.where(ar < n_a, order, last)
    sids = jnp.where(ar < n_a, order, nx * ny)
    inv = jnp.zeros(nx * ny, jnp.int32).at[sids].set(
        ar + 1, mode='drop')
    return ids, inv, n_a, n_a > A


def build_pack(plan, name, state, layout):
    """Pack one array's flat state into its resident pencil pack."""
    ap = plan.arrays[name]
    nx, ny, nz, R, kper, swapped = plan.geom
    M, A = ap.M, ap.A
    fdt = ap.dtype
    ids, inv, n_a, ovf = _active_pencils(layout, M, nx, ny, nz, A)
    # per-entry rows: cell indices per (pencil, z-row)
    ar_r = jnp.arange(R, dtype=jnp.int32)
    zok = ar_r < nz
    cell = ids[:, None] * nz + jnp.minimum(ar_r, nz - 1)[None, :]
    s2p = layout.slot_to_particle.reshape(nx * ny * nz, M)
    p_idx = jnp.where(zok[None, :, None], s2p[cell], -1)  # (A, R, M)
    # padding entries repeat the last active pencil; blank them so no
    # particle appears in two pack rows (fold/reductions stay exact)
    ent_ok = jnp.arange(A, dtype=jnp.int32) < n_a
    p_idx = jnp.where(ent_ok[:, None, None], p_idx, -1)

    cap = state['x'].shape[0]
    ones = jnp.ones((cap,), fdt)

    def colv(p):
        if isinstance(p, tuple):        # strided prop column
            return jnp.asarray(state[p[0]][:, p[1]], fdt)
        return jnp.asarray(state[p], fdt)

    cols = [ones] + [colv(p) for p in ap.planes]
    rows = _rows_matrix(cols, p_idx)
    pack = _pack_from_rows(rows, range(1 + len(ap.planes)), A, R, M)
    pack = jnp.concatenate(
        [jnp.zeros((1,) + pack.shape[1:], pack.dtype), pack], axis=0)
    pid = jnp.concatenate(
        [jnp.full((1, R, M), -1, jnp.int32), p_idx], axis=0)
    xi = ap.plane_idx('x') - 1
    yi = ap.plane_idx('y') - 1
    zi = ap.plane_idx('z') - 1
    ref = jnp.concatenate(
        [pack[:, :, (1 + xi) * M:(2 + xi) * M],
         pack[:, :, (1 + yi) * M:(2 + yi) * M],
         pack[:, :, (1 + zi) * M:(2 + zi) * M]], axis=-1)
    return PackState(pack=pack, pid=pid, inv=inv, ref=ref,
                     n_a=jnp.minimum(n_a, A), ovf=ovf)


def build_packs(plan, states, handle):
    return {name: build_pack(plan, name, states[name],
                             handle.layouts[name])
            for name in plan.a_eval.arrays_used}


def fold_pack(plan, name, pack_state, state):
    """Fold a resident pack back into the flat state dict."""
    ap = plan.arrays[name]
    M = ap.M
    P = 1 + len(ap.planes)
    A1, R, _ = pack_state.pack.shape
    # (A1, R, P*M) -> per-slot rows of P values
    rows = jax.lax.optimization_barrier(
        pack_state.pack.reshape(A1, R, P, M).transpose(0, 1, 3, 2)
        .reshape(-1))
    rows = rows.reshape(A1 * R * M, P)
    pid = pack_state.pid.reshape(-1)
    cap = state['x'].shape[0]
    # particle -> row: scatter the row index by pid (empty slots have
    # pid = -1; route them OOB so mode='drop' discards them — a plain
    # clip would alias -1 onto the last particle)
    sidx = jnp.where(pid >= 0, pid, cap + 1)
    row_of = jnp.full((cap + 1,), 0, jnp.int32).at[sidx].set(
        jnp.arange(A1 * R * M, dtype=jnp.int32), mode='drop')
    ok = jnp.full((cap + 1,), False).at[sidx].set(
        True, mode='drop')
    vals = rows[row_of[:cap]]                       # (cap, P)
    vals_t = jax.lax.optimization_barrier(vals.T.reshape(-1))
    out = dict(state)
    okc = ok[:cap]
    ints = plan.int_planes(name, state)
    for pi, p in enumerate(ap.planes):
        col = vals_t[(1 + pi) * cap:(2 + pi) * cap]
        if isinstance(p, tuple):        # strided prop column
            base, c = p
            old2 = out.get(base, state[base])
            colv = col.astype(old2.dtype)
            out[base] = old2.at[:, c].set(
                jnp.where(okc, colv, old2[:, c]))
            continue
        old = state[p]
        if p in ints:
            col = jnp.round(col).astype(old.dtype)
        else:
            col = col.astype(old.dtype)
        out[p] = jnp.where(okc, col, old)
    return out


def materialize(plan, states, packs):
    out = dict(states)
    for name, ps in packs.items():
        out[name] = fold_pack(plan, name, ps, states[name])
    return out


# ---------------------------------------------------------------------------
# Elementwise store over a pack
# ---------------------------------------------------------------------------
class PackStore(object):
    """Dict-like store exposing pack planes as flattened
    ``(A1*R*M,)`` arrays, so `_bind_particle_phase`/steppers run
    unchanged.  Writes are lazy; ``finalize_pack`` rebuilds the
    lane-folded pack in one concat pass."""

    def __init__(self, plan, name, pack_state, state):
        self.plan = plan
        self.ap = plan.arrays[name]
        self.name = name
        self.ps = pack_state
        self.flat = state            # consts / n_act / untouched props
        self._consts = set(self.ap.consts) | {'n_act'}
        self.cache = {}
        self.dirty = set()
        # strided props: base name -> {column: plane index} (each
        # column is its own pack plane; flat-phase reads/writes see
        # the reassembled (rows, stride) matrix)
        self._strided = {}
        for i, p in enumerate(self.ap.planes):
            if isinstance(p, tuple):
                self._strided.setdefault(p[0], {})[p[1]] = 1 + i

    def __contains__(self, key):
        return (key in self.ap.planes or key in self._strided or
                key in self.flat)

    def particle_index(self):
        """Slot-row -> particle index (D_PIDX in flat phases)."""
        return self.ps.pid.reshape(-1)

    @property
    def layout(self):
        """Adapter for ArrayView._to_slot (cross-particle gathers):
        particle index -> flattened pack row."""
        if getattr(self, '_layout', None) is None:
            cap = self.flat['x'].shape[0]
            pid = self.ps.pid.reshape(-1)
            n_rows = pid.shape[0]
            p2s = jnp.full((cap,), n_rows, jnp.int32).at[
                jnp.where(pid >= 0, pid, cap + 1)].set(
                jnp.arange(n_rows, dtype=jnp.int32), mode='drop')

            class _L(object):
                particle_to_slot = p2s
            self._layout = _L()
        return self._layout

    def keys(self):
        ks = set(self.ap.planes)
        ks.update(self.flat.keys())
        return ks

    def _plane(self, pi):
        M = self.ap.M
        return self.ps.pack[:, :, pi * M:(pi + 1) * M].reshape(-1)

    @property
    def slot_maskf(self):
        return self._plane(0)

    def active_mask(self):
        return self._plane(0) > 0.0

    def __getitem__(self, key):
        if key in self._strided:
            if key not in self.cache:
                cols = self._strided[key]
                self.cache[key] = jnp.stack(
                    [self._plane(cols[c])
                     for c in range(len(cols))], axis=-1)
            return self.cache[key]
        if key in self._consts or key not in self.ap.planes:
            return self.flat[key]
        if key not in self.cache:
            self.cache[key] = self._plane(self.ap.plane_idx(key))
        return self.cache[key]

    def __setitem__(self, key, value):
        if key in self._strided:
            self.cache[key] = value
            self.dirty.add(key)
            return
        if key in self._consts or key not in self.ap.planes:
            self.flat[key] = value
            return
        self.cache[key] = value
        self.dirty.add(key)

    def finalize_pack(self):
        """Fold dirty planes back into the lane-folded pack array.

        Lane-range ``.at[].set`` updates, not a concat rebuild: XLA
        lowers the 29-plane lane-concat to a strided re-gather that
        measured ~23 GB/s (3.5 ms for the 41 MB dam_break_3d fluid
        pack); in-place dynamic-update-slices copy once and fuse."""
        if not self.dirty:
            return self.ps
        from pysph_tpu.ops.pallas_engine import _pkey
        A1, R, _ = self.ps.pack.shape
        M = self.ap.M
        maskf = self.ps.pack[:, :, 0:M]
        pack = self.ps.pack
        for p in sorted(self.dirty, key=_pkey):
            if p in self._strided:
                vs = jnp.asarray(self.cache[p], self.ap.dtype)
                for c, pi in sorted(self._strided[p].items()):
                    v = vs[:, c].reshape(A1, R, M) * maskf
                    pack = pack.at[:, :, pi * M:(pi + 1) * M].set(v)
                continue
            pi = self.ap.plane_idx(p)
            v = jnp.asarray(self.cache[p], self.ap.dtype)
            # empty slots must stay exactly zero (entry 0 is the
            # reserved zero block; masks rely on it)
            v = v.reshape(A1, R, M) * maskf
            pack = pack.at[:, :, pi * M:(pi + 1) * M].set(v)
        self.ps = self.ps._replace(pack=pack)
        self.dirty = set()
        self.cache = {}
        return self.ps

    def adopt_pack(self, ps, out_props):
        """Replace the resident pack wholesale (the pair kernel wrote
        the full dest block back); drop cached planes the kernel
        changed (strided columns are cached under their base name)."""
        self.ps = ps
        for p in out_props:
            base = p[0] if isinstance(p, tuple) else p
            self.cache.pop(base, None)
            self.dirty.discard(base)



# ---------------------------------------------------------------------------
# The resident pair kernel
# ---------------------------------------------------------------------------
class _RkMeta(NamedTuple):
    R: int
    nz: int
    kper: tuple
    swapped: bool
    Md: int
    d_planes: tuple        # prop names, pack plane order
    d_const_list: tuple
    # per fused source phase:
    # (name, use_planes, pack_idx, Ms, const_list, K, levels, seg) —
    # use_planes lists only the props THIS phase's equations read
    # (plus x/y/z/h for the union prune); pack_idx maps each to its
    # pack plane; levels are the K-cascade sub-levels (chunks whose
    # max survivor count fits a sub-level run that many lanes only);
    # seg is the lane width of one (oy, ox) section of the phase's
    # xy-concat source view
    src_metas: tuple
    out_props: tuple
    out_ops: tuple         # dict as tuple of pairs
    oys: tuple
    oxs: tuple
    real: bool
    cz: int
    interp: bool
    d_strides: tuple = ()  # dest schema strides, dict items
    s_strides: tuple = ()  # per fused source phase: strides items


def _zshift(v, oz, nz, R, wrap, interpret=False):
    """Rows r of the result hold rows r + oz of ``v`` (logical length
    nz; pad rows beyond nz stay zero).

    Mosaic cannot concatenate sublane slices with mismatched offsets
    ("result/input offset mismatch on non-concat dimension"), so the
    shift is a hardware rotate (``pltpu.roll``) plus elementwise
    edge-row fixes; interpret mode (no Mosaic) uses ``jnp.roll``."""
    if oz == 0:
        return v
    if interpret:
        rolled = jnp.roll(v, -oz, axis=0)
    else:
        from jax.experimental.pallas import tpu as pltpu
        rolled = pltpu.roll(v, (R - oz) % R, 0)
    if wrap and nz == R:
        return rolled                  # pure cyclic shift
    iota = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    edge = nz - 1 if oz == 1 else 0
    if wrap:
        # the edge row receives the wrap row (row 0 for oz=+1, row
        # nz-1 for oz=-1); selected reduce + broadcast avoids the
        # odd-sublane-offset slice Mosaic rejects
        src = 0 if oz == 1 else nz - 1
        sel = (iota == src).astype(v.dtype)
        edge_vals = jnp.broadcast_to(
            jnp.sum(v * sel, axis=0, keepdims=True), v.shape)
        out = jnp.where(iota == edge, edge_vals, rolled)
    else:
        out = jnp.where(iota == edge, jnp.zeros_like(v), rolled)
    if R > nz:
        out = jnp.where(iota < nz, out, jnp.zeros_like(v))
    return out


# Trace-time bisection knob for kernel-internal profiling (see
# PERF_NOTES):  '' = normal, 'floor' = DMA+writeback only,
# 'window' = window build but no pair compute, 'nochunk' = pair
# compute without the per-chunk dest gating.
_DEBUG = ''
# Chunk gating on source emptiness / post-prune emptiness.  Module
# global (not env) so profiling scripts can A/B it in-process with
# fresh function objects (see PERF_NOTES "Measurement traps").
_GATE = True


def _pair_kernel_resident(eqs_list, kernel_obj, domain, radius_scale,
                          meta, *refs):
    """One program per active dest pencil; sources are the 9 (oy, ox)
    neighbor-pencil resident packs; z-offsets are assembled in-kernel
    with static sublane shifts (no pre-rolled HBM copies).  Each
    source runs either as a union-compacted window phase (wide
    sources) or 9 per-offset phases (small ones).

    (An xy-concat single-view variant — pre-gathering the 9 segments
    in XLA so each phase is one DMA — was tried in round 5 and
    REVERTED: the per-eval gather builds cost ~13 ms at dx=0.02,
    more than the ~6 ms of descriptor issue they saved.)"""
    (R, nz, kper, swapped, Md, d_planes, d_const_list, src_metas,
     out_props, out_ops_t, oys, oxs, real, cz, interp,
     _d_strides, _s_strides) = meta
    out_ops = dict(out_ops_t)
    n_oxy = len(oys) * len(oxs)
    it = iter(refs)
    bi_ref = next(it)
    bj_ref = next(it)
    na_ref = next(it)
    for _ in src_metas:
        next(it)                     # inverse pencil maps
    next(it)                         # dest entry list (index maps)
    scal = next(it)                  # (1, 8): t, dt, origin, widths
    d_ref = next(it)                 # (1, R, (1 + Pd) * Md)
    d_consts = {('d', p): next(it)[0] for p in d_const_list}
    srcs = []
    for (sname, planes, pack_idx, Ms, const_list, K, levels,
         seg) in src_metas:
        s_ref = {(oy, ox): next(it) for oy in oys for ox in oxs}
        s_consts = {('s', p): next(it)[0] for p in const_list}
        srcs.append((s_ref, planes, pack_idx, Ms, s_consts,
                     const_list, K, levels, seg))
    out_ref = next(it)      # (1, R, (1 + Pd) * Md), aliased to d_ref
    exc_ref = None
    if any(s[6] is not None for s in srcs):
        exc_ref = next(it)  # (1, R, Md) window-overflow excess
    scratch = [next(it) for _ in out_props]
    exc_scratch = None
    if exc_ref is not None:
        exc_scratch = next(it)

    t = scal[0, 0]
    dt = scal[0, 1]
    a = pl.program_id(0)
    valid = a < na_ref[0]

    dfold = d_ref[0]
    dmaskf = dfold[:, 0:Md]
    dcols = {}
    for pi, p in enumerate(d_planes):
        dcols[p] = dfold[:, (1 + pi) * Md:(2 + pi) * Md]
    if real:
        wmf = dmaskf * jnp.where(dcols['tag'] == 0.0, 1.0, 0.0)
    else:
        wmf = dmaskf
    occ = valid & (jnp.sum(wmf) > 0.0)

    @pl.when(valid)
    def _init_scratch():
        neutral = {'sum': 0.0, 'max': -jnp.inf, 'min': jnp.inf}
        for po, prop in enumerate(out_props):
            scratch[po][...] = jnp.full(
                scratch[po].shape, neutral[out_ops[prop]],
                scratch[po].dtype)
        if exc_scratch is not None:
            exc_scratch[...] = jnp.zeros(exc_scratch.shape,
                                         exc_scratch.dtype)

    def _strip27(si, pi):
        """(R, 27*Ms) lane-concat of PACK plane ``pi`` over the full
        stencil: 9 (oy, ox) views x 3 z-shifts, in a fixed order."""
        (s_ref, planes, pack_idx, Ms) = srcs[si][:4]
        cols = []
        for oy in oys:
            for ox in oxs:
                v = s_ref[(oy, ox)][0][:, pi * Ms:(pi + 1) * Ms]
                for oz in (-1, 0, 1) if nz > 1 else (0,):
                    cols.append(_zshift(v, oz, nz, R, kper[2],
                                        interp))
        return jnp.concatenate(cols, axis=-1)

    def _union_strips(si):
        """Materialize the stencil strips a union phase needs (at the
        phase trace level — a strip lazily built inside one chunk's
        pl.when cond and reused by a sibling chunk would leak that
        cond's tracers into the kernel jaxpr as captured constants,
        which pallas rejects on hardware)."""
        (s_ref, planes, pack_idx, Ms) = srcs[si][:4]
        wmask = _strip27(si, 0)
        vals = [_strip27(si, pack_idx[i]) for i in range(len(planes))]
        return wmask, vals

    def _union_window(si, wmask, vals, sl):
        """Distance-prune + left-pack the stencil window of source
        ``si`` for dest rows ``sl`` only (same prune semantics as
        pallas_engine._union_windows: exact distance to the dest
        pencil-cell AABB is a conservative superset of every per-pair
        max(hi, hj) support test).  Row-chunked: unoccupied chunks
        skip the prune + pack entirely (measured ~35% row occupancy
        on dam_break_3d fluid pencils).  Returns (pk, pmaskf, excess,
        count); count is (nr, 1) int32 survivors per row (-1 on the
        K >= C fast path, where the window is the raw strip)."""
        (s_ref, planes, pack_idx, Ms, _sc, _scl, K,
         _lv, _seg) = srcs[si]
        fdt = d_ref.dtype
        wmask = wmask[sl]
        C = wmask.shape[-1]
        K = min(K, C)
        nr = wmask.shape[0]
        wx = vals[planes.index('x')][sl]
        wy = vals[planes.index('y')][sl]
        wz = vals[planes.index('z')][sl]
        wh = vals[planes.index('h')][sl]
        o_i, o_j, o_z = scal[0, 2], scal[0, 3], scal[0, 4]
        w_i, w_j, w_z = scal[0, 5], scal[0, 6], scal[0, 7]
        cc_i = o_i + (bi_ref[a].astype(fdt) + 0.5) * w_i
        cc_j = o_j + (bj_ref[a].astype(fdt) + 0.5) * w_j
        iota_r = sl.start + \
            jax.lax.broadcasted_iota(jnp.int32, (nr, 1), 0)
        cc_z = o_z + (iota_r.astype(fdt) + 0.5) * w_z
        if swapped:
            dxp = wx - cc_i
            dyp = wy - cc_z
            dzp = jnp.zeros_like(dxp)
            hx, hy, hz = 0.5 * w_i, 0.5 * w_z, None
        else:
            dxp = wx - cc_i
            dyp = wy - cc_j
            dzp = wz - cc_z
            hx, hy, hz = 0.5 * w_i, 0.5 * w_j, 0.5 * w_z
        if domain is not None and domain.is_periodic:
            dxp, dyp, dzp = domain.minimum_image(dxp, dyp, dzp)
        d2 = jnp.maximum(jnp.abs(dxp) - hx, 0.0) ** 2 + \
            jnp.maximum(jnp.abs(dyp) - hy, 0.0) ** 2
        if hz is not None:
            d2 = d2 + jnp.maximum(jnp.abs(dzp) - hz, 0.0) ** 2
        hrow = jnp.max(dcols['h'][sl] * dmaskf[sl], axis=-1,
                       keepdims=True)
        sup = radius_scale * jnp.maximum(hrow, wh)
        flag = jnp.where((d2 <= sup * sup) & (wmask > 0.0),
                         1, 0).astype(jnp.int32)
        if K >= C:
            ff = flag.astype(fdt)
            pk = {p: vals[i][sl] for i, p in enumerate(planes)}
            return pk, ff * wmask, jnp.zeros((nr, 1), fdt), None
        packed, count = _left_pack(flag,
                                   [wmask] + [v[sl] for v in vals], K)
        excess = jnp.maximum(count - K, 0).astype(fdt)
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (nr, K), 1)
        pmaskf = jnp.where(k_iota < count, 1.0, 0.0).astype(fdt)
        pk = {p: packed[1 + i] * pmaskf
              for i, p in enumerate(planes)}
        return pk, pmaskf * packed[0], excess, count

    def _run_rows(eqs, dcols_c, dm_c, scat, smf, consts, planes,
                  const_list, out_idx, sl, s_stride=()):
        runner = _KernelRunner(dcols_c, scat, dm_c, smf, consts)
        ctx = PlanePairContext(
            runner, kernel_obj, domain, radius_scale,
            set(d_const_list), set(const_list),
            dest_strides=dict(meta.d_strides),
            src_strides=dict(s_stride))
        runner.ctx = ctx
        _run_eqs(eqs, ctx, t, dt)
        for prop, (op, val) in runner.acc.items():
            sref = scratch[out_idx[prop]]
            cur = sref[sl, :]
            if op == 'sum':
                sref[sl, :] = cur + val
            elif op == 'max':
                sref[sl, :] = jnp.maximum(cur, val)
            else:
                sref[sl, :] = jnp.minimum(cur, val)

    @pl.when(occ)
    def _compute():
        if _DEBUG == 'floor':
            return
        out_idx = {p: po for po, p in enumerate(out_props)}
        for si, ((s_ref, planes, pack_idx, Ms, s_consts,
                  s_const_list, K, levels, seg), eqs) in enumerate(
                      zip(srcs, eqs_list)):
            consts = {}
            consts.update(d_consts)
            consts.update(s_consts)
            if K is None:
                # per-offset phases (small sources)
                for oy in oys:
                    for ox in oxs:
                        ref = s_ref[(oy, ox)]
                        sm0 = ref[0][:, 0:Ms]
                        src_any = jnp.sum(sm0) > 0.0

                        def _phase(ref=ref, planes=planes,
                                   pack_idx=pack_idx, Ms=Ms,
                                   eqs=eqs, sm0=sm0):
                            strips = {}

                            def strip3(pi):
                                if pi not in strips:
                                    v = ref[0][:, pi * Ms:
                                               (pi + 1) * Ms]
                                    if nz > 1:
                                        strips[pi] = jnp.concatenate(
                                            [_zshift(v, oz, nz, R,
                                                     kper[2], interp)
                                             for oz in (-1, 0, 1)],
                                            axis=-1)
                                    else:
                                        strips[pi] = v
                                return strips[pi]

                            # materialize every plane THIS phase
                            # reads HERE, at the _phase trace level:
                            # a strip first built lazily inside one
                            # pl.when(_chunk) cond trace and reused
                            # by a sibling chunk leaks that trace's
                            # tracers into the kernel jaxpr as
                            # captured constants (pallas rejects the
                            # kernel)
                            smf = strip3(0)
                            for _pi in pack_idx:
                                strip3(_pi)

                            def scat(prop):
                                return strip3(
                                    pack_idx[planes.index(prop)])

                            for r0 in range(0, R, cz):
                                sl = slice(r0, r0 + cz)
                                dm_c = dmaskf[sl]
                                # skip chunks with no dest rows OR no
                                # source slots in their stencil rows
                                ch_any = jnp.sum(wmf[sl]) > 0.0
                                if _GATE:
                                    ch_any = ch_any & (
                                        jnp.sum(smf[sl]) > 0.0)

                                def _chunk(sl=sl, dm_c=dm_c,
                                           smf=smf, scat=scat):
                                    dc = {p: dcols[p][sl]
                                          for p in d_planes}
                                    _run_rows(
                                        eqs, dc, dm_c,
                                        lambda p, sl=sl:
                                        scat(p)[sl],
                                        smf[sl], consts, planes,
                                        s_const_list, out_idx, sl,
                                        s_stride=meta.s_strides[si])

                                pl.when(ch_any)(_chunk)

                        pl.when(src_any)(_phase)
                continue

            # union-window phase
            tot = None
            for oy in oys:
                for ox in oxs:
                    m = jnp.sum(s_ref[(oy, ox)][0][:, 0:Ms])
                    tot = m if tot is None else tot + m
            src_any = tot > 0.0

            def _uphase(si=si, planes=planes, eqs=eqs,
                        s_const_list=s_const_list, consts=consts,
                        levels=levels):
                wmask, vals = _union_strips(si)
                for r0 in range(0, R, cz):
                    sl = slice(r0, r0 + cz)
                    # skip chunks with no dest rows OR no source slots
                    # in their stencil rows (sparse cross phases:
                    # fluid<-boundary is empty for the whole fluid
                    # interior — measured mean 26 of K=384 candidates)
                    ch_any = jnp.sum(wmf[sl]) > 0.0
                    if _GATE:
                        ch_any = ch_any & (jnp.sum(wmask[sl]) > 0.0)

                    def _chunk(sl=sl, levels=levels):
                        pk, pmaskf, excess, count = _union_window(
                            si, wmask, vals, sl)
                        # rows with no written dest slots tolerate a
                        # truncated window (accumulations masked by
                        # wmf) — see pallas_engine._pair_kernel_compact
                        rocc = jnp.max(wmf[sl], axis=-1,
                                       keepdims=True)
                        exc_scratch[sl, :] = jnp.maximum(
                            exc_scratch[sl, :],
                            jnp.broadcast_to(
                                excess * rocc,
                                exc_scratch[sl, :].shape))
                        if _DEBUG == 'window':
                            # consume the packed window so it isn't
                            # DCE'd
                            tot = jnp.sum(pmaskf, axis=-1,
                                          keepdims=True)
                            for v in pk.values():
                                tot = tot + jnp.sum(
                                    v, axis=-1, keepdims=True)
                            s0 = scratch[0]
                            s0[sl, :] = s0[sl, :] + jnp.broadcast_to(
                                tot, s0[sl, :].shape)
                            return

                        def _phys_at(Kl):
                            """Physics on the first Kl window lanes
                            only (None = full K) — the count-gated
                            cascade: lanes past the chunk's max
                            survivor count are all zero-masked
                            padding, so truncating them is exact."""
                            def f():
                                if Kl is None:
                                    pk_l, pm_l = pk, pmaskf
                                else:
                                    pk_l = {p: v[..., :Kl]
                                            for p, v in pk.items()}
                                    pm_l = pmaskf[..., :Kl]
                                dc = {p: dcols[p][sl]
                                      for p in d_planes}
                                _run_rows(
                                    eqs, dc, dmaskf[sl],
                                    lambda p: pk_l[p],
                                    pm_l, consts, planes,
                                    s_const_list, out_idx, sl,
                                    s_stride=meta.s_strides[si])
                            return f

                        lv = () if count is None else tuple(
                            l for l in levels
                            if l < pmaskf.shape[-1])
                        if not lv:
                            # prune can empty a chunk the stencil
                            # test passed (sources near the AABB but
                            # outside every support radius)
                            if _GATE:
                                pl.when(jnp.sum(pmaskf) > 0.0)(
                                    _phys_at(None))
                            else:
                                _phys_at(None)()
                            return
                        cmax = jnp.max(count)
                        prev = 0
                        for L in lv:
                            cond = cmax <= L
                            if prev:
                                cond = cond & (cmax > prev)
                            elif _GATE:
                                cond = cond & (cmax > 0)
                            pl.when(cond)(_phys_at(L))
                            prev = L
                        pl.when(cmax > prev)(_phys_at(None))

                    pl.when(ch_any)(_chunk)

            pl.when(src_any)(_uphase)

    @pl.when(valid)
    def _writeback():
        # full-block writeback: copy the untouched planes through and
        # overwrite the accumulated ones, so the output IS the new
        # resident pack (the buffer is aliased to the input; entries
        # no program visits — the reserved zero entry, blanks past
        # n_a — keep their prior content).  This replaced an XLA-side
        # lane-merge + pack rebuild that measured ~23 GB/s.
        out_ref[0, :, :] = dfold
        for po, prop in enumerate(out_props):
            op = out_ops[prop]
            cur = dcols[prop]
            val = scratch[po][...]
            if op == 'sum':
                new = cur + wmf * val
            elif op == 'max':
                new = jnp.where(wmf > 0, jnp.maximum(cur, val), cur)
            else:
                new = jnp.where(wmf > 0, jnp.minimum(cur, val), cur)
            pi = 1 + d_planes.index(prop)
            out_ref[0, :, pi * Md:(pi + 1) * Md] = new
        if exc_ref is not None:
            exc_ref[0, :, :] = exc_scratch[...]


# ---------------------------------------------------------------------------
# Launcher
# ---------------------------------------------------------------------------
def execute_resident(plan, phases, dest_name, stores, rec, kernel_obj,
                     domain, radius_scale, real, t, dt, geometry,
                     interpret=None):
    """Run the fused pair phases of one dest on the resident packs.

    ``phases``: [(src_name, eqs)]; ``stores``: {name: PackStore}.
    Returns overflow-flag dict; accumulated outputs are merged into
    the dest PackStore's pack in place."""
    import os
    nx, ny, nz, R, kper, swapped = plan.geom
    dstore = stores[dest_name]
    dap = plan.arrays[dest_name]
    Md = dap.M
    fdt = dap.dtype
    dps = dstore.finalize_pack()
    out_props = list(rec.out_ops)
    d_const_list = sorted(rec.d_consts)

    oys = (0,) if ny == 1 else (-1, 0, 1)
    oxs = (0,) if nx == 1 else (-1, 0, 1)
    n_oxy = len(oys) * len(oxs)
    n_oz = 3 if nz > 1 else 1
    spec = plan.spec

    # VMEM row-chunk height for the pair blocks
    n_temps = int(os.environ.get('PYSPH_TPU_VMEM_TEMPS', '50'))

    src_metas = []
    eqs_list = []
    inv_srcs = []
    ins = []
    in_specs = []
    window_any = False

    # scalars: t, dt, kernel-axis origin/widths for the AABB prune
    origin_g, widths_g = geometry
    if swapped:
        gvals = [origin_g[0], jnp.zeros((), fdt), origin_g[1],
                 widths_g[0], jnp.ones((), fdt), widths_g[1]]
    else:
        gvals = [origin_g[0], origin_g[1], origin_g[2],
                 widths_g[0], widths_g[1], widths_g[2]]
    tdt = [jnp.asarray(t, fdt), jnp.asarray(dt, fdt)] + \
        [jnp.asarray(v, fdt) for v in gvals]
    scal = jnp.stack(tdt).reshape(1, len(tdt))
    const_map = lambda a, *r: (0, 0)  # noqa: E731
    # dest entry per program via the prefetched entry list (programs
    # are source-proximity-filtered and compacted; padding programs
    # repeat the last entry so consecutive equal block indices skip
    # the re-DMA)
    dest_map = lambda a, *r: (r[-1][a], 0, 0)  # noqa: E731
    ins.append(scal)
    in_specs.append(pl.BlockSpec((1, len(tdt)), const_map))

    # dest block: mask + ALL planes (the kernel needs tag + pre-phase
    # values of the out props; reading the full pack block keeps one
    # DMA descriptor)
    Pd = len(dap.planes)
    ins.append(dps.pack)
    in_specs.append(pl.BlockSpec((1, R, (1 + Pd) * Md), dest_map))
    for p in d_const_list:
        c = jnp.asarray(dstore.flat[p]).reshape(1, -1)
        ins.append(c)
        in_specs.append(pl.BlockSpec(c.shape, const_map))

    # entry -> pencil id map (for the program-filter compaction below)
    ar = jnp.arange(nx * ny, dtype=jnp.int32)
    A = dap.A
    ent_of = jnp.zeros((A + 2,), jnp.int32).at[
        jnp.clip(dps.inv, 0, A + 1)].set(ar, mode='drop')
    ids = ent_of[1 + jnp.arange(A, dtype=jnp.int32)]

    def smap(a, bi_, bj_, na_, *invs, ox=0, oy=0, si=0):
        i2 = bi_[a] + ox
        j2 = bj_[a] + oy
        if kper[0]:
            i2 = jax.lax.rem(i2 + jnp.int32(nx), jnp.int32(nx))
            iok = True
        else:
            iok = (i2 >= 0) & (i2 <= nx - 1)
        if kper[1]:
            j2 = jax.lax.rem(j2 + jnp.int32(ny), jnp.int32(ny))
            jok = True
        else:
            jok = (j2 >= 0) & (j2 <= ny - 1)
        flat = jnp.clip(i2, 0, nx - 1) * ny + jnp.clip(j2, 0, ny - 1)
        e = invs[si][flat]
        if iok is not True:
            e = jnp.where(iok, e, 0)
        if jok is not True:
            e = jnp.where(jok, e, 0)
        return (e, 0, 0)

    env_u = os.environ.get('PYSPH_TPU_UNION', 'auto')
    dname = dest_name
    block_ovf = dps.ovf
    Kmax = 0
    for src_name, eqs in phases:
        sstore = stores[src_name]
        sap = plan.arrays[src_name]
        sps = sstore.finalize_pack()
        block_ovf = block_ovf | sps.ovf
        Ms = sap.M
        n_src = sap.n_src
        inv_srcs.append(sps.inv)
        # union decision (mirrors pallas_engine)
        C_s = n_oxy * n_oz * Ms
        K = None
        if env_u != '0':
            pair_key = '%s<-%s' % (dname, src_name)
            Kc = spec.window_cap_for(pair_key)
            if Kc == 0:
                Kc = spec.window_cap_for(src_name)
            if Kc == 0:
                Kc = _pad_up(max(128, int(0.72 * C_s)), 128)
            Kc = min(Kc, _pad_up(C_s, 128))
            if env_u == '1' or n_oxy * _pad_up(n_oz * Ms, 128) >= \
                    Kc + 256:
                spec.window_caps.setdefault(pair_key, Kc)
                K = Kc
                window_any = True
                Kmax = max(Kmax, K)
        # phase-subset planes: only the props THIS phase's equations
        # read (x/y/z/h always — window prune + symbols); strips,
        # left-packs and the view DMA skip the rest
        s_read = set(rec.sources[len(src_metas)][0])
        use = tuple(p for p in sap.planes[:n_src]
                    if p in s_read or p in _XYZH)
        pack_idx = tuple(1 + sap.planes.index(p) for p in use)
        # source views DMA only up to the highest used plane.  Mosaic
        # requires a lane-partial block's width to be a multiple of
        # 128 (or equal to the array's); round the segment up (extra
        # lanes carry the next planes — harmless), falling back to
        # the full width.
        full_l = (1 + len(sap.planes)) * Ms
        seg_l = (1 + max(pack_idx)) * Ms
        if seg_l != full_l and seg_l % 128:
            seg_l = min(_pad_up(seg_l, 128), full_l)
        spec_blk = (1, R, seg_l)
        for oy in oys:
            for ox in oxs:
                ins.append(sps.pack)
                in_specs.append(pl.BlockSpec(
                    spec_blk,
                    functools.partial(smap, ox=ox, oy=oy,
                                      si=len(inv_srcs) - 1)))
        s_const_list = sorted(
            set(rec.sources[len(src_metas)][1]))
        for p in s_const_list:
            c = jnp.asarray(sstore.flat[p]).reshape(1, -1)
            ins.append(c)
            in_specs.append(pl.BlockSpec(c.shape, const_map))
        # calibrated K-cascade sub-levels (at most 2 to bound the
        # extra physics trace copies).  DEFAULT OFF: interleaved A/B
        # on dam_break_3d dx=0.02 measured the cascade net-NEGATIVE
        # (36.0 vs 35.0 ms/eval) — the per-chunk count/branch
        # overhead exceeds what the sparse cross phases still waste
        # after source-proximity filtering + per-chunk gating.  Kept
        # behind PYSPH_TPU_CASCADE=1 for configurations with many
        # sparse pair phases (parity-covered by
        # tests/test_resident.py::test_cascade_forced_parity).
        levels = ()
        if K is not None and \
                os.environ.get('PYSPH_TPU_CASCADE', '0') == '1':
            levels = tuple(sorted(set(
                l for l in spec.window_levels.get(
                    '%s<-%s' % (dname, src_name), ())
                if 128 <= l <= K // 2))[-2:])
        src_metas.append((src_name, use, pack_idx, Ms,
                          tuple(s_const_list), K, levels, seg_l))
        eqs_list.append(eqs)

    width = max(Kmax, max(n_oz * plan.arrays[s].M
                          for s, _ in phases))
    row_b = (n_temps * _pad_up(Md, 8) * _pad_up(width, 128) *
             np.dtype(fdt).itemsize)
    # Row chunks must start at sublane boundaries: the per-chunk
    # window prune left-packs sliced strips, and Mosaic's
    # tpu.concatenate rejects operands whose sublane offset differs
    # ("offset mismatch on non-concat dimension") — a slice starting
    # at row 2 carries sublane offset 2.  So cz is a multiple of 8
    # (f32 sublanes); the n_temps live-range estimate is pessimistic,
    # so budget generously and let Mosaic complain if a pathological
    # phase really overflows VMEM.
    cz = max(1, min(R, int(20e6 // row_b)))
    cz_env = os.environ.get('PYSPH_TPU_UNION_CZ')
    if cz_env:
        cz = max(1, min(R, int(cz_env)))
    if cz < R:
        cz = min(_pad_up(R, 8), _pad_up(cz, 8))

    Po = len(out_props)
    Pd_full = 1 + len(dap.planes)
    A1 = dps.pack.shape[0]
    # full-block writeback: the output IS the new resident pack
    # (replaces an XLA-side lane-merge + pack rebuild that measured
    # ~23 GB/s).  NOT buffer-aliased to the input: for self-source
    # phases (fluid<-fluid) the dest pack is also a source view, and
    # in-place writes would race the pipelined source prefetch of
    # later programs.  Entries no program writes (the reserved zero
    # entry, blanks past n_a) are zero-filled afterwards — one fused
    # where pass at full HBM bandwidth.
    out_spec = [pl.BlockSpec((1, R, Pd_full * Md), dest_map)]
    out_shape = [jax.ShapeDtypeStruct((A1, R, Pd_full * Md), fdt)]
    if window_any:
        out_spec.append(pl.BlockSpec((1, R, Md), dest_map))
        out_shape.append(jax.ShapeDtypeStruct((A1, R, Md), fdt))

    if interpret is None:
        interpret = jax.default_backend() not in ('tpu', 'axon')
    schemas = plan.a_eval.schemas
    meta = _RkMeta(
        R=R, nz=nz, kper=kper, swapped=swapped, Md=Md,
        d_planes=tuple(dap.planes), d_const_list=tuple(d_const_list),
        src_metas=tuple(src_metas), out_props=tuple(out_props),
        out_ops=tuple(rec.out_ops.items()), oys=oys, oxs=oxs,
        real=real, cz=cz, interp=bool(interpret),
        d_strides=tuple(sorted(schemas[dest_name].strides.items())),
        s_strides=tuple(
            tuple(sorted(schemas[s].strides.items()))
            for s, _ in phases))
    kern = functools.partial(_pair_kernel_resident, eqs_list,
                             kernel_obj, domain, radius_scale, meta)
    from jax.experimental.pallas import tpu as pltpu
    n_scratch = Po + (1 if window_any else 0)

    # source-proximity filter: a dest pencil with no source pencil in
    # its (oy, ox) neighborhood has nothing to accumulate — skip its
    # program entirely (dam_break_3d walls: most boundary pencils are
    # far from fluid).  Active-first compaction; padding programs
    # repeat the last kept entry.
    src2d = jnp.zeros((nx, ny), bool)
    for inv_s in inv_srcs:
        src2d = src2d | (inv_s > 0).reshape(nx, ny)
    dil = src2d
    for ox in oxs:
        for oy in oys:
            if ox == 0 and oy == 0:
                continue
            dil = dil | jnp.roll(src2d, (ox, oy), axis=(0, 1))
    aA = jnp.arange(A, dtype=jnp.int32)
    keep = dil.reshape(-1)[ids] & (aA < dps.n_a)
    n_eff = jnp.sum(keep.astype(jnp.int32))
    order = jnp.argsort(~keep).astype(jnp.int32)
    ids_o = ids[order]
    ent = 1 + order
    last = ent[jnp.clip(n_eff - 1, 0, A - 1)]
    ent = jnp.where(aA < n_eff, ent, last)
    ids_o = jnp.where(aA < n_eff, ids_o,
                      ids_o[jnp.clip(n_eff - 1, 0, A - 1)])
    bi = ids_o // ny
    bj = ids_o % ny
    na_pf = n_eff.reshape(1)

    n_prefetch = 4 + len(inv_srcs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch, grid=(A,),
        in_specs=in_specs, out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((R, Md), fdt)
                        for _ in range(n_scratch)])
    result = pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
        **_compiler_kwargs(pltpu))(bi, bj, na_pf, *inv_srcs, ent,
                                   *ins)
    if window_any:
        outp, exc = result
    else:
        (outp,) = result

    # entries no program covered keep their prior pack content
    # (entry 0 stays the reserved zero block; skipped far-from-source
    # pencils keep their planes; blanks past n_a stay blank)
    cov = jnp.zeros((A1,), bool).at[
        jnp.where(aA < n_eff, ent, A1)].set(True, mode='drop')
    cov3 = cov[:, None, None]
    outp = jnp.where(cov3, outp, dps.pack)

    window_ovf = jnp.asarray(False)
    if window_any:
        window_ovf = jnp.max(jnp.where(cov3, exc, 0.0)) > 0.0

    dstore.adopt_pack(dps._replace(pack=outp), out_props)
    return {'block_overflow': block_ovf,
            'window_overflow': window_ovf}


# ---------------------------------------------------------------------------
# Runner: owns the plan + per-eval dispatch for one AccelerationEval
# ---------------------------------------------------------------------------
class ResidentRunner(object):
    """Eligibility is decided eagerly at construction (including the
    recording pass for every fused pair phase), so entering resident
    mode can never fail mid-trace."""

    def __init__(self, a_eval, stepper_props, states):
        self.a_eval = a_eval
        self.plan = ResidentPlan(a_eval)
        self.plan.finish(a_eval.schemas, stepper_props, states)
        self.interpret = None
        if jax.default_backend() not in ('tpu', 'axon'):
            self.interpret = True
        self._recs = {}
        # eager recording for every (group, dest) fused phase
        for group, dest, eqs_by_src in self._walk_groups():
            phases = [(eqs, set(a_eval.schemas[s].consts))
                      for s, eqs in eqs_by_src]
            if not any(eqs for eqs, _consts in phases):
                continue
            rec = _record(
                phases, a_eval.kernel, a_eval.domain,
                a_eval.grid_spec.radius_scale,
                set(a_eval.schemas[dest].consts),
                dest_strides=dict(a_eval.schemas[dest].strides),
                src_strides_list=[
                    dict(a_eval.schemas[s].strides)
                    for s, _eqs in eqs_by_src])
            # resident pair phases run the delta protocol only:
            # sequential semantics (read-after-write between
            # equations, per-particle 'set' assigns, mixed ops) need
            # the compact engine's value-so-far union path — fall
            # back to the SlotStore path for the whole eval
            if any(f[0] for (_r, _c, f) in rec.sources):
                raise PallasIneligible(
                    'sequential-semantics pair phase (dest %r)'
                    % dest)
            for p, op in rec.out_ops.items():
                if op not in ('sum', 'max', 'min'):
                    raise PallasIneligible(
                        'out op %r on %r needs value-so-far '
                        'execution' % (op, p))
            for p in rec.out_ops:
                if p in self.plan.int_planes(dest, states[dest]):
                    raise PallasIneligible(
                        'pair accumulation into integer prop %r' % p)
            self._recs[(id(group), dest)] = rec

    def _walk_groups(self, groups=None):
        """Yield (group, dest, [(src, loop_eqs)]) in execution
        order."""
        from collections import OrderedDict
        a_eval = self.a_eval
        for group in (groups if groups is not None else a_eval.groups):
            subs = [it for it in group.equations
                    if isinstance(it, Group)]
            if subs:
                for item in self._walk_groups(subs):
                    yield item
                continue
            dests = OrderedDict()
            for eq in group.equations:
                dests.setdefault(eq.dest, []).append(eq)
            for dest, eqs in dests.items():
                sources = OrderedDict()
                for eq in eqs:
                    if getattr(eq, 'loop', None) is None:
                        continue
                    for src in (eq.sources or ()):
                        sources.setdefault(src, []).append(eq)
                yield group, dest, list(sources.items())

    # -- state management ---------------------------------------------
    def prepare(self, states):
        handle, diag = self.a_eval.prepare(states)
        packs = build_packs(self.plan, states, handle)
        for ps in packs.values():
            diag = dict(diag)
            diag['block_overflow'] = \
                diag.get('block_overflow', jnp.asarray(False)) | ps.ovf
        return handle, packs, diag

    def ensure_fresh(self, states, handle, packs):
        """Verlet-style reuse on pack positions; rebuild = fold to
        flat, re-bin, re-pack (all traced; lax.cond)."""
        spec = self.a_eval.grid_spec
        plan = self.plan
        fdt = next(iter(states.values()))['x'].dtype
        hmax = jnp.zeros((), fdt)
        disp2 = jnp.zeros((), fdt)
        dom = self.a_eval.domain
        for name, ps in packs.items():
            ap = plan.arrays[name]
            M = ap.M
            maskf = ps.pack[:, :, 0:M]
            hx = ps.pack[:, :, ap.plane_idx('h') * M:
                         (ap.plane_idx('h') + 1) * M]
            hmax = jnp.maximum(hmax, jnp.max(hx * maskf))
            dx = ps.pack[:, :, ap.plane_idx('x') * M:
                         (ap.plane_idx('x') + 1) * M] - \
                ps.ref[:, :, 0:M]
            dy = ps.pack[:, :, ap.plane_idx('y') * M:
                         (ap.plane_idx('y') + 1) * M] - \
                ps.ref[:, :, M:2 * M]
            dz = ps.pack[:, :, ap.plane_idx('z') * M:
                         (ap.plane_idx('z') + 1) * M] - \
                ps.ref[:, :, 2 * M:3 * M]
            if dom is not None and dom.is_periodic:
                dx, dy, dz = dom.minimum_image(dx, dy, dz)
            d2 = dx * dx + dy * dy + dz * dz
            disp2 = jnp.maximum(disp2, jnp.max(d2 * maskf))
        margin = 0.5 * (spec.cell_slack - 1.0) * spec.radius_scale * \
            hmax
        cell_now = spec.cell_slack * spec.radius_scale * hmax
        stale = (disp2 > margin * margin) | \
            (cell_now > jnp.min(handle.widths[:spec.dim]) * 1.0001)

        from pysph_tpu.sph.acceleration_eval import empty_diag

        def rebuild(args):
            states, handle, packs = args
            states = materialize(self.plan, states, packs)
            handle, packs, diag = self.prepare(states)
            return states, handle, packs, diag

        def keep(args):
            states, handle, packs = args
            return states, handle, packs, empty_diag()

        return jax.lax.cond(stale, rebuild, keep,
                            (states, handle, packs))

    # -- evaluation ----------------------------------------------------
    def compute(self, t, dt, stores, handle):
        """Run all groups on the PackStores (mutated in place);
        returns the overflow-flag diag."""
        from pysph_tpu.sph.acceleration_eval import empty_diag
        diag = empty_diag()
        for group in self.a_eval.groups:
            diag = self._run_tree(group, t, dt, stores, handle, diag)
        return diag

    def _run_tree(self, group, t, dt, stores, handle, diag):
        if getattr(group, 'iterate', False):
            return self._run_iterated(group, t, dt, stores, handle,
                                      diag)
        subs = [it for it in group.equations if isinstance(it, Group)]
        if subs:
            for sub in subs:
                diag = self._run_tree(sub, t, dt, stores, handle,
                                      diag)
            return diag
        for g2, dest, eqs_by_src in self._walk_groups([group]):
            diag = self._run_dest(g2, dest, eqs_by_src, t, dt, stores,
                                  handle, diag)
        return diag

    def _run_iterated(self, group, t, dt, stores, handle, diag):
        """Fixed-point group on resident packs: the sub-tree runs
        inside a ``lax.while_loop`` whose carry is every store's
        (pack, flat) state + the overflow diag; convergence is the
        AND of the equations' ``converged()`` on the packs (mirrors
        the compact path, sph/acceleration_eval.py:1072; reference
        group iteration sph/acceleration_eval_cython.mako:305-357).
        This is the IISPH/SISPH-class fast path."""
        max_it = int(group.max_iterations)
        min_it = int(group.min_iterations)
        names = list(stores)

        def carry_of(stores_l):
            return {n: (stores_l[n].finalize_pack(),
                        dict(stores_l[n].flat)) for n in names}

        def body(carry):
            st_c, it, _conv, d = carry
            stores_l = {n: PackStore(self.plan, n, st_c[n][0],
                                     dict(st_c[n][1]))
                        for n in names}
            d = self._run_tree_once(group, t, dt, stores_l, handle, d)
            conv = self._converged(group, stores_l)
            return (carry_of(stores_l), it + 1, conv, d)

        def cond(carry):
            _, it, conv, _ = carry
            return (it < max_it) & ~(conv & (it >= min_it))

        init = (carry_of(stores), jnp.asarray(0, jnp.int32),
                jnp.asarray(False), diag)
        st_c, _it, _conv, diag = jax.lax.while_loop(cond, body, init)
        for n in names:
            stores[n].ps = st_c[n][0]
            stores[n].flat = dict(st_c[n][1])
            stores[n].cache = {}
            stores[n].dirty = set()
        return diag

    def _run_tree_once(self, group, t, dt, stores, handle, diag):
        """One pass over an iterated group's sub-tree (no iteration
        at this level; nested iterate groups recurse normally)."""
        subs = [it for it in group.equations if isinstance(it, Group)]
        if subs:
            for sub in subs:
                diag = self._run_tree(sub, t, dt, stores, handle,
                                      diag)
            return diag
        for g2, dest, eqs_by_src in self._walk_groups([group]):
            diag = self._run_dest(g2, dest, eqs_by_src, t, dt, stores,
                                  handle, diag)
        return diag

    def _converged(self, group, stores):
        from pysph_tpu.sph.acceleration_eval import ReduceView
        from pysph_tpu.sph.equation import _method_args
        conv = jnp.asarray(True)
        for eq in self.a_eval._iter_equations([group]):
            fn = getattr(eq, 'converged', None)
            if fn is None:
                continue
            if 'dst' in _method_args(fn):
                store = stores[eq.dest]
                view = ReduceView(store,
                                  self.a_eval.schemas[eq.dest], None,
                                  store.active_mask())
                val = fn(dst=view)
            else:
                val = fn()
            conv = conv & (jnp.asarray(val) > 0)
        return conv

    def _run_dest(self, group, dest, eqs_by_src, t, dt, stores,
                  handle, diag):
        from pysph_tpu.sph.acceleration_eval import (
            ReduceView, _bind_particle_phase)
        a_eval = self.a_eval
        geometry = (handle.origin, handle.widths)
        store = stores[dest]
        schema = a_eval.schemas[dest]
        mask = store.active_mask()
        if group.real:
            mask = mask & (store['tag'] == 0)
        dests_eqs = [eq for eq in group.equations
                     if not isinstance(eq, Group) and
                     eq.dest == dest]
        for eq in dests_eqs:
            fn = getattr(eq, 'initialize', None)
            if fn is not None:
                _bind_particle_phase(fn, store, schema, mask, t,
                                     dt, a_eval.kernel)
        for eq in dests_eqs:
            if eq.no_source:
                fn = getattr(eq, 'loop', None)
                if fn is not None:
                    _bind_particle_phase(fn, store, schema, mask,
                                         t, dt, a_eval.kernel)
        rec = self._recs.get((id(group), dest))
        if rec is not None and rec.out_ops:
            flags = execute_resident(
                self.plan, eqs_by_src, dest, stores, rec,
                a_eval.kernel, a_eval.domain,
                a_eval.grid_spec.radius_scale, group.real, t, dt,
                geometry, interpret=self.interpret)
            diag = dict(diag)
            for k, v in flags.items():
                diag[k] = diag[k] | v
        for eq in dests_eqs:
            fn = getattr(eq, 'post_loop', None)
            if fn is not None:
                _bind_particle_phase(fn, store, schema, mask, t,
                                     dt, a_eval.kernel)
        for eq in dests_eqs:
            fn = getattr(eq, 'reduce', None)
            if fn is not None:
                view = ReduceView(store, schema, mask,
                                  store.active_mask())
                fn(dst=view, t=t, dt=dt)
        return diag


def make_runner(a_eval, steppers, states):
    """Build a ResidentRunner, or None when anything is ineligible.

    ``steppers``: {array_name: IntegratorStep} — their stage methods'
    d_* args become pack planes."""
    import logging
    import os
    if os.environ.get('PYSPH_TPU_RESIDENT', '1') == '0':
        return None
    from pysph_tpu.config import get_config
    if not get_config().use_pallas:
        return None
    stepper_props = {}
    try:
        for name, stepper in steppers.items():
            props = set()
            for stage in ('initialize', 'stage1', 'stage2', 'stage3',
                          'stage4', 'stage5'):
                fn = getattr(stepper, stage, None)
                if fn is None:
                    continue
                for arg in _method_args(fn):
                    if arg in ('d_idx', 't', 'dt', 'SPH_KERNEL',
                               'D_PIDX'):
                        continue
                    if arg.startswith('d_'):
                        props.add(arg[2:])
                    else:
                        raise PallasIneligible(
                            'stepper arg %r' % arg)
            stepper_props[name] = props
        return ResidentRunner(a_eval, stepper_props, states)
    except PallasIneligible as e:
        logging.getLogger(__name__).info('resident mode off: %s', e)
        return None
