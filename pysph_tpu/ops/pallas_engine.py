"""Pallas pair-phase executor: runs equation ``loop`` methods inside a
fused TPU kernel over the dense cell grid.

The XLA roll engine (sph/acceleration_eval.py) evaluates dense
``(C, M, S*M)`` pair blocks whose temporaries stream through HBM
(~10% VPU efficiency measured; see PERF_NOTES.md).  This executor
traces the *same* equation ``loop`` methods — unchanged — inside a
pallas kernel where the pair block lives in VMEM:

- grid ``(nx, ny, 3)``: each program owns one cell row (fixed x, y);
  the inner grid axis is the x-offset, accumulated into the output
  block across grid revisits (``@pl.when(k == 0)`` init);
- the 3 y-offsets arrive as separately index-mapped input blocks;
- the 3 z-offsets are lane-concatenated so the pair block is
  ``(nz, Md, 3*Ms)`` — one 128-lane tile for Ms <= 42.

``dims`` is always a 3-tuple (1D/2D grids have singleton dims whose
phantom neighbor offsets are edge-masked away), so the same kernel
serves all dimensions.

Eligibility is discovered by a cheap recording pass over tiny arrays;
anything the kernel cannot express (strided writes, source writes,
``NBRS`` iteration, cross-equation read-after-write of accumulated
values, non-float accumulation) raises ``PallasIneligible`` and the
caller falls back to the XLA path.  Semantics parity notes:

- Reads of a dest property return its value *before the pair phase*
  (the delta-subtraction convention), so ``d_x[d_idx] + expr``
  self-accumulation is exact.  An equation reading a property that an
  *earlier* equation of the same pair phase accumulates observes the
  pre-accumulation value; the recording pass numerically probes that
  such reads are only used as the additive base of a ``+=`` (for
  which the convention is exact) and rejects the phase otherwise.
- The write mask (``real`` groups, start/stop idx) gates the final
  combine exactly like GridPairDest (acceleration_eval.py:176).
"""

import functools
import zlib
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from pysph_tpu.sph.equation import (
    IndexSym, _AccumMax, _AccumMin, _method_args)


class PallasIneligible(Exception):
    """This pair phase cannot run in the pallas kernel; fall back."""


# dest/src property dependencies of each precomputed pair symbol
_XYZH = ('x', 'y', 'z', 'h')
_SYM_DEPS = {
    'HIJ': ('h',), 'EPS': ('h',), 'RHOIJ': ('rho',),
    'RHOIJ1': ('rho',), 'XIJ': ('x', 'y', 'z'),
    'VIJ': ('u', 'v', 'w'), 'R2IJ': ('x', 'y', 'z'),
    'RIJ': ('x', 'y', 'z'), 'WIJ': _XYZH, 'WI': _XYZH, 'WJ': _XYZH,
    'DWIJ': _XYZH, 'DWI': _XYZH, 'DWJ': _XYZH, 'GHI': _XYZH,
    'GHJ': _XYZH, 'GHIJ': _XYZH, 'WDASHI': _XYZH, 'WDASHJ': _XYZH,
    'WDASHIJ': _XYZH, 'WDP': _XYZH,
}
_SPECIAL_ARGS = ('d_idx', 's_idx', 't', 'dt', 'SPH_KERNEL',
                 'PAIR_MASK', 'N_NBRS')


# ---------------------------------------------------------------------------
# Pair views over a runner (recording or in-kernel)
# ---------------------------------------------------------------------------
class PlanePairDest(object):
    __slots__ = ('runner', 'name', 'is_const')

    def __init__(self, runner, name, is_const):
        self.runner = runner
        self.name = name
        self.is_const = is_const

    def __getitem__(self, key):
        r = self.runner
        if not isinstance(key, IndexSym):
            if self.is_const:
                return r.get_const('d', self.name, key)
            raise PallasIneligible(
                'fixed-index read of non-constant %r' % self.name)
        if key.mul != 1:
            raise PallasIneligible('strided read of %r' % self.name)
        return r.dread(self.name)[:, :, None]

    def __setitem__(self, key, value):
        r = self.runner
        if self.is_const or not isinstance(key, IndexSym):
            raise PallasIneligible(
                'unsupported write target %r' % self.name)
        if key.mul != 1:
            raise PallasIneligible('strided write of %r' % self.name)
        ctx = r.ctx
        col = r.dread(self.name)           # (nz, Md)
        maskf = ctx.pair_maskf             # (nz, Md, 3Ms)
        mask = maskf > 0.0
        if isinstance(value, _AccumMax):
            v = jnp.broadcast_to(
                jnp.asarray(value.value, col.dtype), maskf.shape)
            contrib = jnp.max(jnp.where(mask, v, -jnp.inf), axis=2)
            r.accumulate(self.name, 'max', contrib)
        elif isinstance(value, _AccumMin):
            v = jnp.broadcast_to(
                jnp.asarray(value.value, col.dtype), maskf.shape)
            contrib = jnp.min(jnp.where(mask, v, jnp.inf), axis=2)
            r.accumulate(self.name, 'min', contrib)
        else:
            v = jnp.asarray(value, col.dtype)
            if not (v.ndim == 3 and v.shape[2] == maskf.shape[2]):
                raise PallasIneligible(
                    'per-particle assignment to %r in a pair loop'
                    % self.name)
            delta = jnp.where(mask, v - col[:, :, None], 0.0)
            r.accumulate(self.name, 'sum', jnp.sum(delta, axis=2))


class PlanePairSrc(object):
    __slots__ = ('runner', 'name', 'is_const')

    def __init__(self, runner, name, is_const):
        self.runner = runner
        self.name = name
        self.is_const = is_const

    def __getitem__(self, key):
        r = self.runner
        if not isinstance(key, IndexSym):
            if self.is_const:
                return r.get_const('s', self.name, key)
            raise PallasIneligible(
                'fixed-index read of non-constant %r' % self.name)
        if key.mul != 1:
            raise PallasIneligible('strided read of %r' % self.name)
        return r.scat(self.name)[:, None, :]

    def __setitem__(self, key, value):
        raise PallasIneligible(
            'source write s_%s[...] in a pair loop' % self.name)


class PlanePairContext(object):
    """Precomputed pair symbols over ``(nz, Md, 3Ms)`` plane blocks.

    Reuses GridPairContext's symbol formulas (acceleration_eval.py:271)
    via inheritance set up lazily to avoid a circular import."""

    def __init__(self, runner, kernel, domain, radius_scale,
                 dest_consts, src_consts):
        self.runner = runner
        self.kernel = kernel
        self.domain = domain
        self.radius_scale = radius_scale
        self._dest_consts = dest_consts
        self._src_consts = src_consts
        self._sym = {}
        self._dest_views = {}
        self._src_views = {}
        self._pair_maskf = None

    def dget(self, prop):
        # dread: reads of props accumulated by an earlier equation of
        # this phase return the pre-phase value in the kernel; the
        # recording pass probes that this is equivalent (additive-only
        # usage) and rejects the phase otherwise.
        return self.runner.dread(prop)[:, :, None]

    def sget(self, prop):
        return self.runner.scat(prop)[:, None, :]

    def dest_view(self, prop):
        if prop not in self._dest_views:
            self._dest_views[prop] = PlanePairDest(
                self.runner, prop, prop in self._dest_consts)
        return self._dest_views[prop]

    def src_view(self, prop):
        if prop not in self._src_views:
            self._src_views[prop] = PlanePairSrc(
                self.runner, prop, prop in self._src_consts)
        return self._src_views[prop]

    @property
    def pair_maskf(self):
        """Float indicator (Mosaic can't broadcast i1 along a new
        minor dim) of: dest slot valid & src candidate valid & within
        the symmetric support radius."""
        if self._pair_maskf is None:
            r2 = self.sym('R2IJ')
            rs = self.radius_scale
            sup = jnp.maximum(rs * self.dget('h'), rs * self.sget('h'))
            self._pair_maskf = (
                self.runner.dmaskf[:, :, None] *
                self.runner.smaskf_cat[:, None, :] *
                jnp.where(r2 < sup * sup, 1.0, 0.0))
        return self._pair_maskf

    @property
    def pair_mask(self):
        return self.pair_maskf > 0.0

    def sym(self, name):
        if name not in self._sym:
            self._sym[name] = getattr(self, '_c_' + name.lower())()
        return self._sym[name]


def _install_symbol_formulas():
    """Graft GridPairContext's _c_* symbol methods onto
    PlanePairContext (they only use dget/sget/kernel/domain, which are
    interface-compatible)."""
    from pysph_tpu.sph.acceleration_eval import GridPairContext
    for name in dir(GridPairContext):
        if name.startswith('_c_') or name in ('_safe_h', '_grad'):
            if not hasattr(PlanePairContext, name):
                setattr(PlanePairContext, name,
                        getattr(GridPairContext, name))


# ---------------------------------------------------------------------------
# Binding
# ---------------------------------------------------------------------------
def _bind_loop(fn, ctx, t, dt):
    kwargs = {}
    for arg in _method_args(fn):
        if arg == 'd_idx':
            kwargs[arg] = IndexSym('dest')
        elif arg == 's_idx':
            kwargs[arg] = IndexSym('src')
        elif arg == 't':
            kwargs[arg] = t
        elif arg == 'dt':
            kwargs[arg] = dt
        elif arg == 'SPH_KERNEL':
            kwargs[arg] = ctx.kernel
        elif arg == 'PAIR_MASK':
            kwargs[arg] = ctx.pair_mask
        elif arg == 'N_NBRS':
            kwargs[arg] = jnp.sum(ctx.pair_maskf, axis=2,
                                  keepdims=True).astype(jnp.int32)
        elif arg in _SYM_DEPS:
            kwargs[arg] = ctx.sym(arg)
        elif arg.startswith('d_'):
            kwargs[arg] = ctx.dest_view(arg[2:])
        elif arg.startswith('s_'):
            kwargs[arg] = ctx.src_view(arg[2:])
        else:
            raise PallasIneligible('cannot bind %r of %r' % (arg, fn))
    fn(**kwargs)


def _run_eqs(eqs, ctx, t, dt, written=None):
    """Run every equation's loop; the runner tracks per-equation
    writes so cross-equation read-after-write is probed (the same
    code path runs during recording and inside the kernel).  Pass
    ``written`` to carry the written-set across fused source phases
    (the reference evaluates them sequentially, so a later source's
    equations can read props accumulated by an earlier source's)."""
    r = ctx.runner
    r.written_before = set() if written is None else written
    for eq in eqs:
        r.cur_written = set()
        _bind_loop(eq.loop, ctx, t, dt)
        r.written_before |= r.cur_written
    return r.written_before


# ---------------------------------------------------------------------------
# Recording pass
# ---------------------------------------------------------------------------
def _prop_values(prop, n, ramp):
    """Deterministic, non-degenerate per-prop sample values so the
    recording pass exercises real arithmetic (all-ones inputs zero out
    XIJ/DWIJ and would blind the linearity probe below)."""
    h = zlib.crc32(prop.encode()) % 89
    base = 0.7 + h / 89.0
    return jnp.asarray(base + ramp * np.arange(1, n + 1,
                                               dtype=np.float32))


class _Recorder(object):
    """Tiny-array dry run: discovers read/written props, accumulation
    ops, and constants; raises PallasIneligible on anything the
    kernel can't express.

    ``perturb``: offset added to reads of props already accumulated in
    this phase (``dread`` of a written prop).  The in-kernel execution
    returns the *pre-phase* value for such reads (the delta-subtraction
    convention), which is exact iff the read is only used as the
    additive base of a ``d_p[d_idx] += expr``.  Recording runs twice
    (perturb 0 and != 0); any contribution that shifts with the
    perturbation used the read non-additively -> fall back."""

    def __init__(self, perturb=0.0):
        self.perturb = perturb
        self.d_read = set()
        self.raw_reads = set()
        self.contribs = []
        self.d_consts = OrderedDict()
        self.out_ops = OrderedDict()
        self.written_before = set()
        self.cur_written = set()
        self.dmaskf = jnp.ones((2, 2), jnp.float32)
        self.smaskf_cat = jnp.ones((2, 6), jnp.float32)
        self.ctx = None
        # per fused source phase: (s_read, s_consts)
        self.sources = []
        self.s_read = None
        self.s_consts = None

    def begin_source(self):
        self.s_read = set()
        self.s_consts = OrderedDict()
        self.sources.append((self.s_read, self.s_consts))

    def dcol(self, prop):
        self.d_read.add(prop)
        return _prop_values(prop, 4, 0.05).reshape(2, 2)

    def dread(self, prop):
        if prop in self.written_before or prop in self.cur_written:
            self.raw_reads.add(prop)
            return self.dcol(prop) + jnp.float32(self.perturb)
        return self.dcol(prop)

    def scat(self, prop):
        self.s_read.add(prop)
        return _prop_values(prop, 12, 0.03).reshape(2, 6)

    def get_const(self, side, prop, key):
        d = self.d_consts if side == 'd' else self.s_consts
        d.setdefault(prop, set()).add(key)
        return jnp.asarray(1.0, jnp.float32)

    def accumulate(self, prop, op, contrib):
        prev = self.out_ops.get(prop)
        if prev is not None and prev != op:
            raise PallasIneligible(
                'mixed accumulation ops on %r' % prop)
        self.out_ops[prop] = op
        self.cur_written.add(prop)
        self.contribs.append((prop, op, np.asarray(contrib)))


def _record_once(phases, kernel, domain, radius_scale, dest_consts,
                 perturb):
    """phases: list of (eqs, src_consts) run sequentially (fused
    sources of one dest)."""
    rec = _Recorder(perturb)
    written = None
    for eqs, src_consts in phases:
        rec.begin_source()
        ctx = PlanePairContext(rec, kernel, domain, radius_scale,
                               dest_consts, src_consts)
        rec.ctx = ctx
        written = _run_eqs(eqs, ctx, 0.0, 1e-3, written)
    return rec


def _record(phases, kernel, domain, radius_scale, dest_consts):
    # plan_pair_phases runs while the caller's step is being traced;
    # the recording uses only concrete inputs, so evaluate it eagerly
    # (the linearity probe below needs concrete contributions).  Pin
    # the tiny eager ops to the host CPU: through a remote-dispatch
    # TPU tunnel each one costs ~0.5 s (measured 205 s/record on the
    # device vs 1.5 s on CPU).
    cpu = jax.local_devices(backend='cpu')[0]
    with jax.ensure_compile_time_eval(), jax.default_device(cpu):
        return _record_concrete(phases, kernel, domain, radius_scale,
                                dest_consts)


def _record_concrete(phases, kernel, domain, radius_scale,
                     dest_consts):
    _install_symbol_formulas()
    rec = _record_once(phases, kernel, domain, radius_scale,
                       dest_consts, 0.0)
    if rec.raw_reads:
        rec2 = _record_once(phases, kernel, domain, radius_scale,
                            dest_consts, 0.731)
        ok = len(rec.contribs) == len(rec2.contribs)
        if ok:
            for (p1, o1, c1), (p2, o2, c2) in zip(rec.contribs,
                                                  rec2.contribs):
                if (p1 != p2 or o1 != o2 or not np.allclose(
                        c1, c2, rtol=1e-4, atol=1e-5, equal_nan=True)):
                    ok = False
                    break
        if not ok:
            raise PallasIneligible(
                'non-additive cross-equation read of %s'
                % sorted(rec.raw_reads))
    return rec


# ---------------------------------------------------------------------------
# Kernel runner
# ---------------------------------------------------------------------------
class _KernelRunner(object):
    def __init__(self, dcols, scat_fn, dmaskf, smaskf_cat, consts):
        self._dcols = dcols          # prop -> (nz, Md)
        self._scat = scat_fn         # prop -> (nz, 3Ms)
        self.dmaskf = dmaskf
        self.smaskf_cat = smaskf_cat
        self._consts = consts        # (side, prop) -> 1D array
        self.acc = {}                # prop -> (op, (nz, Md))
        self.written_before = set()
        self.cur_written = set()
        self.ctx = None

    def dcol(self, prop):
        return self._dcols[prop]

    def dread(self, prop):
        # reads always see the pre-phase value; the recording probe
        # guaranteed that post-write reads are additive-only, for
        # which the delta-subtraction accumulation is exact.
        return self._dcols[prop]

    def scat(self, prop):
        return self._scat(prop)

    def get_const(self, side, prop, key):
        return self._consts[(side, prop)][key]

    def accumulate(self, prop, op, contrib):
        self.cur_written.add(prop)
        if prop in self.acc:
            _, cur = self.acc[prop]
            if op == 'sum':
                cur = cur + contrib
            elif op == 'max':
                cur = jnp.maximum(cur, contrib)
            else:
                cur = jnp.minimum(cur, contrib)
            self.acc[prop] = (op, cur)
        else:
            self.acc[prop] = (op, contrib)


def _pair_kernel(eqs_list, kernel_obj, domain, radius_scale, meta,
                 *refs):
    """The pallas kernel: one (x, y, z-tile) cell block, one
    x-offset.  All fused source phases of the dest run sequentially
    inside (the per-pass temporaries die at pass end, so peak VMEM
    stays at the single-source level while launch overhead, dest
    DMA and output accumulation are paid once)."""
    (nx, ny, nz, tz, Md, oys, kper, d_props, d_const_list, src_metas,
     out_props) = meta
    it = iter(refs)
    scal = next(it)                  # (1, 2): t, dt
    wm_ref = next(it)
    dm_ref = next(it)
    d_refs = {p: next(it) for p in d_props}
    d_consts = {('d', p): next(it)[0] for p in d_const_list}
    n_oy = len(oys)
    srcs = []
    for s_props, s_const_list in src_metas:
        sm_refs = [next(it) for _ in range(n_oy)]
        s_refs = {p: [next(it) for _ in range(n_oy)]
                  for p in s_props}
        s_consts = {('s', p): next(it)[0] for p in s_const_list}
        srcs.append((sm_refs, s_refs, s_consts, s_const_list))
    out_refs = {p: next(it) for p in out_props}

    t = scal[0, 0]
    dt = scal[0, 1]
    i = pl.program_id(0)
    j = pl.program_id(1)
    zt = pl.program_id(2)
    k = pl.program_id(3)
    ox = k - 1
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    if kper[0]:
        x_okf = one
    else:
        x_okf = jnp.where((i + ox >= 0) & (i + ox <= nx - 1), one,
                          zero)

    def z_edge_for(Ms):
        if kper[2]:
            return jnp.ones((tz, 3 * Ms), jnp.float32)
        zi = zt * tz + jax.lax.broadcasted_iota(jnp.int32, (tz, 1), 0)
        return jnp.concatenate(
            [jnp.broadcast_to(
                jnp.where((zi + oz >= 0) & (zi + oz <= nz - 1), one,
                          zero),
                (tz, Ms))
             for oz in (-1, 0, 1)], axis=-1)

    dcols = {p: d_refs[p][0, 0] for p in d_props}
    dmaskf = dm_ref[0, 0]
    wmf = wm_ref[0, 0]

    @pl.when(k == 0)
    def _init():
        # identity base; contributions accumulate below (the order of
        # pl.when blocks is program order)
        for prop in out_props:
            out_refs[prop][0, 0] = dcols[prop]

    # dest-occupancy skip: SPH geometries are sparse on the dense cell
    # grid (fluid fills a corner, walls line the box), so whole blocks
    # often have no writable dest slot — skip all pair work for them.
    occ = jnp.sum(wmf * dmaskf) > 0.0

    @pl.when(occ)
    def _compute():
        total = {}
        for ty, oy in enumerate(oys):
            if kper[1]:
                y_okf = one
            else:
                y_okf = jnp.where((j + oy >= 0) & (j + oy <= ny - 1),
                                  one, zero)
            written = None
            for (sm_refs, s_refs, s_consts, s_const_list), eqs in zip(
                    srcs, eqs_list):
                # the 3 z-offset views were pre-shifted by jnp.roll
                # and lane-concatenated in HBM outside the kernel
                # (cyclic, so periodic wrap is free; out-of-range rows
                # on non-periodic axes are edge-masked) — one packed
                # (tz, 3Ms) block per (oy, prop).
                def scat(prop, _ty=ty, _s_refs=s_refs):
                    return _s_refs[prop][_ty][0, 0]

                Ms = sm_refs[0].shape[-1] // 3
                smaskf_cat = (x_okf * y_okf * z_edge_for(Ms) *
                              sm_refs[ty][0, 0])
                consts = {}
                consts.update(d_consts)
                consts.update(s_consts)
                runner = _KernelRunner(dcols, scat, dmaskf,
                                       smaskf_cat, consts)
                ctx = PlanePairContext(
                    runner, kernel_obj, domain, radius_scale,
                    set(p for p in d_const_list),
                    set(p for p in s_const_list))
                runner.ctx = ctx
                written = _run_eqs(eqs, ctx, t, dt, written)
                for prop, (op, val) in runner.acc.items():
                    if prop in total:
                        top, tval = total[prop]
                        if op == 'sum':
                            tval = tval + val
                        elif op == 'max':
                            tval = jnp.maximum(tval, val)
                        else:
                            tval = jnp.minimum(tval, val)
                        total[prop] = (top, tval)
                    else:
                        total[prop] = (op, val)

        for prop in out_props:
            op, val = total[prop]
            cur = out_refs[prop][0, 0]
            if op == 'sum':
                new = cur + wmf * val
            elif op == 'max':
                new = jnp.where(wmf > 0, jnp.maximum(cur, val), cur)
            else:
                new = jnp.where(wmf > 0, jnp.minimum(cur, val), cur)
            out_refs[prop][0, 0] = new


# ---------------------------------------------------------------------------
# Launcher
# ---------------------------------------------------------------------------
def _static_eligible(eqs, dest_schema, src_schema):
    for eq in eqs:
        if getattr(eq, 'loop_all', None) is not None:
            raise PallasIneligible('%s uses loop_all' % eq.name)
        fn = getattr(eq, 'loop', None)
        if fn is None:
            continue
        for arg in _method_args(fn):
            if arg in _SPECIAL_ARGS or arg in _SYM_DEPS:
                if arg == 'NBRS':
                    raise PallasIneligible('NBRS iteration')
                continue
            if arg.startswith('d_'):
                if dest_schema.strides.get(arg[2:], 1) != 1:
                    raise PallasIneligible('strided %s' % arg)
            elif arg.startswith('s_'):
                if src_schema.strides.get(arg[2:], 1) != 1:
                    raise PallasIneligible('strided %s' % arg)
            else:
                raise PallasIneligible('unknown arg %r' % arg)


def _pad_up(v, m):
    return -(-v // m) * m


def _tiling(spec, Md, Ms):
    """Grid/tile geometry shared by plan (validation) and execute.

    Returns (nx, ny, nz, kper, tz, n_zt, nz_p) where kper are the
    periodic-wrap flags of the *kernel* axes (after the 1D/2D axis
    swap).  Axes with <3 cells never wrap: 1-cell periodic axes are
    correct under the edge mask (only the 0 offset survives, matching
    the XLA path's (0,) offset list) and 2-cell ones were rejected in
    plan_pair_phase."""
    nx, ny, nz = spec.dims
    per = spec.periodic
    kper = tuple(per[d] and spec.dims[d] >= 3 for d in range(3))
    if nz == 1:
        # 1D/2D axis swap (see _execute_plan)
        ny, nz = 1, ny
        kper = (kper[0], kper[2], kper[1])
    # z-tile height: the traced pair block (tz, Md, 3Ms) spawns ~50
    # live VMEM temporaries (Mosaic doesn't spill); keep them inside
    # the 16 MB scoped budget.
    import os
    n_temps = int(os.environ.get('PYSPH_TPU_VMEM_TEMPS', '50'))
    row_bytes = _pad_up(Md, 8) * _pad_up(3 * Ms, 128) * 4
    tz = max(1, min(nz, int(12e6 // (n_temps * row_bytes))))
    if tz < nz:
        # multi-tile: the block z-dim must be a multiple of 8 (TPU
        # tiling rule; a single full-height tile satisfies the
        # equal-to-array-dim rule instead)
        tz = max(8, (tz // 8) * 8)
    n_zt = -(-nz // tz)
    nz_p = n_zt * tz
    return nx, ny, nz, kper, tz, n_zt, nz_p


class _Plan(object):
    """Validated pair phases of one dest (one or more fused sources)
    ready to execute with the pallas kernel."""

    def __init__(self, phases, rec, kernel_obj, domain, radius_scale):
        self.phases = phases         # [(src_store, eqs), ...]
        self.rec = rec
        self.kernel_obj = kernel_obj
        self.domain = domain
        self.radius_scale = radius_scale

    def execute(self, dest_store, spec, write_mask, t, dt,
                interpret=None):
        _execute_plan(self, dest_store, spec, write_mask, t, dt,
                      interpret)


def plan_pair_phases(phases, dest_store, spec, kernel_obj, domain,
                     radius_scale):
    """Validate the pair phases of one dest (``phases`` is a list of
    ``(src_store, eqs)``, fused into a single kernel call) for pallas
    execution.  Returns a _Plan (or None if there is nothing to run);
    raises PallasIneligible — before any device-state writes — if a
    phase can't be expressed, so the caller can fall back cleanly."""
    phases = [(s, [eq for eq in eqs
                   if getattr(eq, 'loop', None) is not None or
                   getattr(eq, 'loop_all', None) is not None])
              for s, eqs in phases]
    phases = [(s, eqs) for s, eqs in phases if eqs]
    if not phases:
        return None
    for d in range(spec.dim):
        if spec.periodic[d] and spec.dims[d] == 2:
            # wrap on +-1 offsets would visit the same cell twice
            # (the XLA path shrinks the offset list instead,
            # cell_grid.py:_stencil_offsets)
            raise PallasIneligible('periodic axis with 2 cells')
    dest_schema = dest_store.schema
    Md = dest_store.layout.slot_to_particle.shape[0] // spec.n_cells
    for src_store, eqs in phases:
        Ms = (src_store.layout.slot_to_particle.shape[0] //
              spec.n_cells)
        if 3 * Ms > 512:
            raise PallasIneligible('source cell capacity too large')
        _tiling(spec, Md, Ms)
        _static_eligible(eqs, dest_schema, src_store.schema)
    rec = _record([(eqs, set(s.schema.consts)) for s, eqs in phases],
                  kernel_obj, domain, radius_scale,
                  set(dest_schema.consts))
    if not rec.out_ops:
        return None
    for p in rec.out_ops:
        if not jnp.issubdtype(dest_store[p].dtype, jnp.floating):
            raise PallasIneligible('non-float accumulation on %r' % p)
    return _Plan(phases, rec, kernel_obj, domain, radius_scale)


def _execute_plan(plan, dest_store, spec, write_mask, t, dt,
                  interpret=None):
    rec = plan.rec
    kernel_obj = plan.kernel_obj
    domain = plan.domain
    radius_scale = plan.radius_scale
    dest_consts = set(dest_store.schema.consts)

    C = spec.n_cells
    Md = dest_store.layout.slot_to_particle.shape[0] // C
    Mss = [s.layout.slot_to_particle.shape[0] // C
           for s, _ in plan.phases]

    dep_props = set(_XYZH)  # pair mask needs positions + h
    for _, eqs in plan.phases:
        for eq in eqs:
            for a in _method_args(eq.loop):
                if a in _SYM_DEPS:
                    dep_props.update(_SYM_DEPS[a])
    d_props = sorted((rec.d_read | set(rec.out_ops) | dep_props) -
                     dest_consts)
    out_props = list(rec.out_ops)
    fdt = dest_store['x'].dtype

    # 1D/2D grids: (nx, ny, 1, M) and (nx, 1, ny, M) are the same
    # linear layout, so treat y as the lane-concat axis — each program
    # then owns a whole (ny, Md, 3Ms) block instead of a degenerate
    # (1, Md, 3Ms) one, and the grid shrinks from (nx, ny, 3) to
    # (nx, 1, 3) programs.  The phantom middle-axis offsets are
    # edge-masked like any out-of-range neighbor.
    nx, ny, nz, kper, tz, n_zt, nz_p = _tiling(spec, Md, max(Mss))

    def dblock(arr):
        b = arr.reshape(nx, ny, nz, Md)
        if nz_p != nz:
            b = jnp.pad(b, ((0, 0), (0, 0), (0, nz_p - nz), (0, 0)))
        return b

    def sblock3(arr, Ms):
        """One (nx, ny, nz_p, 3*Ms) array lane-concatenating the 3
        z-offset views of a source array, pre-shifted with jnp.roll
        (cheap XLA data movement).  Cyclic wrap makes the periodic
        case exact for any tiling; on non-periodic axes the wrapped
        rows are removed by the kernel's z edge mask.  Rolling
        *before* padding keeps the pad rows (zero mask) inert.
        Pre-concatenating in HBM (vs 3 separate view inputs) cuts the
        per-program DMA count 3x and avoids lane-padding each narrow
        Ms view to 128."""
        b = arr.reshape(nx, ny, nz, Ms)
        cat = jnp.concatenate(
            [jnp.roll(b, -oz, axis=2) if oz != 0 else b
             for oz in (-1, 0, 1)], axis=-1)
        if nz_p != nz:
            cat = jnp.pad(cat, ((0, 0), (0, 0), (0, nz_p - nz),
                                (0, 0)))
        return cat

    scal = jnp.stack([jnp.asarray(t, fdt),
                      jnp.asarray(dt, fdt)]).reshape(1, 2)
    wmf = dblock(jnp.where(write_mask, 1.0, 0.0).astype(fdt))
    dmf = dblock(jnp.where(dest_store.layout.slot_mask, 1.0,
                           0.0).astype(fdt))

    d_const_list = sorted(rec.d_consts)

    dest_spec = pl.BlockSpec((1, 1, tz, Md), lambda i, j, zt, k:
                             (i, j, zt, 0))
    const_map = lambda i, j, zt, k: (0, 0)  # noqa: E731

    def _axis(v, n, wrap):
        # periodic axes wrap the stencil block index; non-periodic
        # ones clamp (the out-of-range offsets are edge-masked away)
        return jnp.mod(v, n) if wrap else jnp.clip(v, 0, n - 1)

    def _src_map(i, j, zt, k, oy):
        # the z offset is pre-baked into the rolled arrays, so all
        # three z views read the *current* z-tile
        return (_axis(i + k - 1, nx, kper[0]),
                _axis(j + oy, ny, kper[1]), zt, 0)

    # singleton y axis (1D/2D after the axis swap): the oy = +-1
    # passes are fully edge-masked, skip them statically
    oys = (0,) if ny == 1 else (-1, 0, 1)

    ins = [scal, wmf, dmf]
    in_specs = [
        pl.BlockSpec((1, 2), const_map),
        dest_spec, dest_spec,
    ]
    for p in d_props:
        ins.append(dblock(dest_store[p]))
        in_specs.append(dest_spec)
    for p in d_const_list:
        c = jnp.asarray(dest_store[p]).reshape(1, -1)
        ins.append(c)
        in_specs.append(pl.BlockSpec(c.shape, const_map))

    src_metas = []
    eqs_list = []
    for (src_store, eqs), Ms, (s_read, s_consts) in zip(
            plan.phases, Mss, rec.sources):
        src_consts = set(src_store.schema.consts)
        s_props = sorted((s_read | dep_props) - src_consts)
        s_const_list = sorted(s_consts)
        src_specs = [pl.BlockSpec(
            (1, 1, tz, 3 * Ms), functools.partial(_src_map, oy=oy))
            for oy in oys]
        smf3 = sblock3(jnp.where(src_store.layout.slot_mask, 1.0,
                                 0.0).astype(fdt), Ms)
        for ty in range(len(oys)):
            ins.append(smf3)
            in_specs.append(src_specs[ty])
        for p in s_props:
            sb3 = sblock3(src_store[p], Ms)
            for ty in range(len(oys)):
                ins.append(sb3)
                in_specs.append(src_specs[ty])
        for p in s_const_list:
            c = jnp.asarray(src_store[p]).reshape(1, -1)
            ins.append(c)
            in_specs.append(pl.BlockSpec(c.shape, const_map))
        src_metas.append((tuple(s_props), tuple(s_const_list)))
        eqs_list.append(eqs)

    out_specs = [dest_spec for _ in out_props]
    out_shape = [jax.ShapeDtypeStruct((nx, ny, nz_p, Md),
                                      dest_store[p].dtype)
                 for p in out_props]

    meta = (nx, ny, nz, tz, Md, oys, kper, tuple(d_props),
            tuple(d_const_list), tuple(src_metas), tuple(out_props))
    kern = functools.partial(_pair_kernel, eqs_list, kernel_obj,
                             domain, radius_scale, meta)
    if interpret is None:
        interpret = jax.default_backend() not in ('tpu', 'axon')
    outs = pl.pallas_call(
        kern, grid=(nx, ny, n_zt, 3), in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape,
        interpret=interpret)(*ins)
    for p, out in zip(out_props, outs):
        out = out[:, :, :nz, :] if nz_p != nz else out
        dest_store[p] = out.reshape(C * Md)
