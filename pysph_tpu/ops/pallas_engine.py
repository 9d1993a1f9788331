"""Pallas pair-phase executor: runs equation ``loop`` methods inside a
fused TPU kernel over the dense cell grid.

The XLA roll engine (sph/acceleration_eval.py) evaluates dense
``(C, M, S*M)`` pair blocks whose temporaries stream through HBM
(~10% VPU efficiency measured; see PERF_NOTES.md).  This executor
traces the *same* equation ``loop`` methods — unchanged — inside a
pallas kernel where the pair block lives in VMEM:

- grid ``(A_max,)``: one program per *active* (x, y, z-tile) cell
  block, walking a scalar-prefetched activity-sorted block list
  (SPH geometries fill a fraction of the bounding grid; inactive
  blocks cost nothing).  All fused source phases and all 9 in-plane
  neighbor offsets run inside the program, accumulating into VMEM
  scratch; each block's output is written exactly once;
- the 9 (x, y)-offset source views arrive as separately index-mapped,
  prop-stacked blocks (one DMA descriptor per view instead of one
  per (view, prop));
- the 3 z-offsets are pre-rolled in HBM and lane-concatenated so the
  per-view pair block is ``(tz, Md, 3*Ms)`` — one 128-lane tile for
  Ms <= 42.

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
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from pysph_tpu.sph.equation import (
    IndexSym, _AccumMax, _AccumMin, _method_args)


class PallasIneligible(Exception):
    """This pair phase cannot run in the pallas kernel; fall back."""


def _compiler_kwargs(pltpu):
    """Mosaic compiler knobs, env-overridable for on-chip A/B sweeps:
    ``PYSPH_TPU_DIMSEM`` = parallel|arbitrary (grid dimension
    semantics) and ``PYSPH_TPU_VMEM_MB`` (scoped-VMEM budget)."""
    import os
    sem = os.environ.get('PYSPH_TPU_DIMSEM', '')
    vmem = os.environ.get('PYSPH_TPU_VMEM_MB', '')
    kw = {}
    if sem == 'parallel':
        kw['dimension_semantics'] = (pltpu.PARALLEL,)
    elif sem == 'arbitrary':
        kw['dimension_semantics'] = (pltpu.ARBITRARY,)
    if vmem:
        kw['vmem_limit_bytes'] = int(float(vmem) * 2 ** 20)
    if not kw:
        return {}
    return {'compiler_params': pltpu.CompilerParams(**kw)}


# dest/src property dependencies of each precomputed pair symbol
_XYZH = ('x', 'y', 'z', 'h')
_SYM_DEPS = {
    'HIJ': ('h',), 'EPS': ('h',), 'RHOIJ': ('rho',),
    'RHOIJ1': ('rho',), 'XIJ': ('x', 'y', 'z'),
    'VIJ': ('u', 'v', 'w'), 'R2IJ': ('x', 'y', 'z'),
    'RIJ': ('x', 'y', 'z'), 'RINV': ('x', 'y', 'z'),
    'WIJ': _XYZH, 'WI': _XYZH, 'WJ': _XYZH,
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
    __slots__ = ('runner', 'name', 'is_const', 'stride')

    def __init__(self, runner, name, is_const, stride=1):
        self.runner = runner
        self.name = name
        self.is_const = is_const
        self.stride = stride

    def _key(self, key):
        """Plane key: the prop name, or (name, column) for strided
        props — each column of a strided prop (e.g. the 9 entries of
        a moment matrix) is its own pack plane."""
        if key.mul != self.stride:
            raise PallasIneligible(
                'stride mismatch on %r (%d vs %d)'
                % (self.name, key.mul, self.stride))
        return self.name if self.stride == 1 else (self.name, key.off)

    def __getitem__(self, key):
        r = self.runner
        if not isinstance(key, IndexSym):
            if self.is_const:
                return r.get_const('d', self.name, key)
            raise PallasIneligible(
                'fixed-index read of non-constant %r' % self.name)
        return r.dread(self._key(key))[:, :, None]

    def __setitem__(self, key, value):
        r = self.runner
        if self.is_const or not isinstance(key, IndexSym):
            raise PallasIneligible(
                'unsupported write target %r' % self.name)
        k = self._key(key)
        ctx = r.ctx
        col = r.dread(k)                   # (nz, Md)
        maskf = ctx.pair_maskf             # (nz, Md, 3Ms)
        mask = maskf > 0.0
        if isinstance(value, _AccumMax):
            v = jnp.broadcast_to(
                jnp.asarray(value.value, col.dtype), maskf.shape)
            contrib = jnp.max(jnp.where(mask, v, -jnp.inf), axis=2)
            r.accumulate(k, 'max', contrib)
        elif isinstance(value, _AccumMin):
            v = jnp.broadcast_to(
                jnp.asarray(value.value, col.dtype), maskf.shape)
            contrib = jnp.min(jnp.where(mask, v, jnp.inf), axis=2)
            r.accumulate(k, 'min', contrib)
        else:
            v = jnp.asarray(value, col.dtype)
            if v.ndim == 3 and v.shape[2] == maskf.shape[2]:
                delta = jnp.where(mask, v - col[:, :, None], 0.0)
                r.accumulate(k, 'sum', jnp.sum(delta, axis=2))
            else:
                # per-particle assignment (d_p[d_idx] = expr inside a
                # pair loop, e.g. the normalization passes of
                # kernel-correction loop_all bodies): exact only under
                # sequential (union-window) execution — the runner
                # raises when the execution path can't honor it
                if v.ndim == 3:
                    v = v[:, :, 0]
                r.accumulate(k, 'set',
                             jnp.broadcast_to(v, col.shape))


class PlanePairSrc(object):
    __slots__ = ('runner', 'name', 'is_const', 'stride')

    def __init__(self, runner, name, is_const, stride=1):
        self.runner = runner
        self.name = name
        self.is_const = is_const
        self.stride = stride

    def __getitem__(self, key):
        r = self.runner
        if not isinstance(key, IndexSym):
            if self.is_const:
                return r.get_const('s', self.name, key)
            raise PallasIneligible(
                'fixed-index read of non-constant %r' % self.name)
        if key.mul != self.stride:
            raise PallasIneligible(
                'stride mismatch on %r (%d vs %d)'
                % (self.name, key.mul, self.stride))
        k = self.name if self.stride == 1 else (self.name, key.off)
        return r.scat(k)[:, None, :]

    def __setitem__(self, key, value):
        raise PallasIneligible(
            'source write s_%s[...] in a pair loop' % self.name)


class PlanePairContext(object):
    """Precomputed pair symbols over ``(nz, Md, 3Ms)`` plane blocks.

    Reuses GridPairContext's symbol formulas (acceleration_eval.py:271)
    via inheritance set up lazily to avoid a circular import."""

    def __init__(self, runner, kernel, domain, radius_scale,
                 dest_consts, src_consts, dest_strides=None,
                 src_strides=None):
        self.runner = runner
        self.kernel = kernel
        self.domain = domain
        self.radius_scale = radius_scale
        self._dest_consts = dest_consts
        self._src_consts = src_consts
        self._dest_strides = dest_strides or {}
        self._src_strides = src_strides or {}
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
                self.runner, prop, prop in self._dest_consts,
                self._dest_strides.get(prop, 1))
        return self._dest_views[prop]

    def src_view(self, prop):
        if prop not in self._src_views:
            self._src_views[prop] = PlanePairSrc(
                self.runner, prop, prop in self._src_consts,
                self._src_strides.get(prop, 1))
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
        if name.startswith('_c_') or name in ('_safe_h', '_grad',
                                              '_gradh', '_kparts',
                                              '_recip'):
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


def _run_eqs(eqs, ctx, t, dt):
    """Run every equation's loop and loop_all (the same code path
    runs during recording and inside the kernel)."""
    for eq in eqs:
        fn = getattr(eq, 'loop', None)
        if fn is not None:
            _bind_loop(fn, ctx, t, dt)
        fn = getattr(eq, 'loop_all', None)
        if fn is not None:
            _bind_loop(fn, ctx, t, dt)


# ---------------------------------------------------------------------------
# Recording pass
# ---------------------------------------------------------------------------
def _plane_label(key):
    """Display/sample label for a plane key (a prop name, or a
    (name, column) tuple for strided props)."""
    return key if isinstance(key, str) else '%s@%d' % key


def _pkey(key):
    """Sort key usable on mixed str / (name, column) plane keys."""
    return (key, -1) if isinstance(key, str) else (key[0], key[1])


def _flat_col(view, key, fdt):
    """Flat column of a plane key from a FlatView/state mapping."""
    if isinstance(key, tuple):
        return jnp.asarray(view[key[0]][:, key[1]], fdt)
    return jnp.asarray(view[key], fdt)


def _prop_values(prop, n, ramp):
    """Deterministic, non-degenerate per-prop sample values so the
    recording pass exercises real arithmetic (all-ones inputs zero out
    XIJ/DWIJ and would blind the analysis)."""
    h = zlib.crc32(prop.encode()) % 89
    base = 0.7 + h / 89.0
    return jnp.asarray(base + ramp * np.arange(1, n + 1,
                                               dtype=np.float32))


class _Recorder(object):
    """Tiny-array dry run: discovers read/written planes, accumulation
    ops, constants, and whether a source phase needs SEQUENTIAL
    (union-window) execution; raises PallasIneligible on anything the
    kernel can't express.

    Sequential execution is required when the phase's results depend
    on seeing the full candidate set mid-body: read-after-write of an
    accumulated plane, per-particle assignment ('set'), mixed ops on
    one plane, or a loop_all body.  Pure sum/max/min phases may
    instead run per stencil offset (candidate subsets commute)."""

    mode = 'seq'

    def __init__(self, read_mode='seq'):
        # read_mode 'seq': reads of accumulated planes see the
        # value-so-far (reference semantics) and raise the phase's
        # needs_seq flag.  read_mode 'delta': reads return the
        # pre-phase base, mimicking the fast per-offset delta
        # protocol — _record compares the two passes to prove the
        # ubiquitous `d_x[d_idx] += expr` pattern (whose += read
        # cancels in the delta) safe for delta execution.
        self.read_mode = read_mode
        self.d_read = set()
        self.d_consts = OrderedDict()
        self.out_ops = OrderedDict()   # plane key -> op ('mixed' ok)
        self.acc = {}                  # plane key -> sample value
        self.dmaskf = jnp.ones((2, 2), jnp.float32)
        self.smaskf_cat = jnp.ones((2, 6), jnp.float32)
        self.ctx = None
        # per fused source phase: (s_read, s_consts, needs_seq)
        self.sources = []
        self.s_read = None
        self.s_consts = None
        self._seq_flag = [False]

    def begin_source(self, loop_all=False):
        self.s_read = set()
        self.s_consts = OrderedDict()
        self._seq_flag = [bool(loop_all)]
        self.sources.append((self.s_read, self.s_consts,
                             self._seq_flag))

    def dcol(self, key):
        self.d_read.add(key)
        return _prop_values(_plane_label(key), 4, 0.05).reshape(2, 2)

    def dread(self, key):
        if key in self.acc:
            if self.read_mode == 'delta':
                return self.dcol(key)
            # read-after-write: exact only sequentially (unless the
            # delta-probe pass of _record proves additivity)
            self._seq_flag[0] = True
            return self.acc[key]
        return self.dcol(key)

    def scat(self, key):
        self.s_read.add(key)
        return _prop_values(_plane_label(key), 12, 0.03).reshape(2, 6)

    def get_const(self, side, prop, key):
        d = self.d_consts if side == 'd' else self.s_consts
        d.setdefault(prop, set()).add(key)
        return jnp.asarray(1.0, jnp.float32)

    def accumulate(self, key, op, contrib):
        prev = self.out_ops.get(key)
        if prev is not None and prev != op:
            self.out_ops[key] = 'mixed'
            self._seq_flag[0] = True
        else:
            self.out_ops[key] = op
        if op == 'set':
            self._seq_flag[0] = True
        cur = self.acc.get(key)
        if cur is None:
            cur = self.dcol(key)
        contrib = jnp.asarray(contrib, jnp.float32)
        if op == 'sum':
            val = cur + contrib
        elif op == 'max':
            val = jnp.maximum(cur, contrib)
        elif op == 'min':
            val = jnp.minimum(cur, contrib)
        else:
            val = jnp.broadcast_to(contrib, cur.shape)
        self.acc[key] = val


def _record(phases, kernel, domain, radius_scale, dest_consts,
            dest_strides=None, src_strides_list=None):
    # plan_pair_phases runs while the caller's step is being traced;
    # the recording uses only concrete inputs, so evaluate it eagerly.
    # Pin the tiny eager ops to the host CPU: through a remote-dispatch
    # TPU tunnel each one costs ~0.5 s (measured 205 s/record on the
    # device vs 1.5 s on CPU).
    cpu = jax.local_devices(backend='cpu')[0]
    with jax.ensure_compile_time_eval(), jax.default_device(cpu):
        _install_symbol_formulas()
        has_la = [any(getattr(eq, 'loop_all', None) is not None
                      for eq in eqs) for eqs, _c in phases]

        def run(read_mode):
            rec = _Recorder(read_mode)
            for pi, (eqs, src_consts) in enumerate(phases):
                rec.begin_source(loop_all=has_la[pi])
                ctx = PlanePairContext(
                    rec, kernel, domain, radius_scale, dest_consts,
                    src_consts, dest_strides=dest_strides,
                    src_strides=(src_strides_list[pi]
                                 if src_strides_list else None))
                rec.ctx = ctx
                _run_eqs(eqs, ctx, 0.0, 1e-3)
            return rec

        rec = run('seq')
        # Linearity probe: needs_seq raised only by read-after-write
        # (no 'set'/'mixed' ops, no loop_all) is usually the benign
        # `d_x[d_idx] += expr` pattern whose += read cancels in the
        # delta protocol.  Re-record with delta-mode reads (pre-phase
        # bases); identical accumulations on the synthetic per-plane
        # probe data prove the phases additive, so the fast per-offset
        # delta path stays exact and the flags are cleared.
        raw_flagged = any(f[0] for (_r, _c, f) in rec.sources)
        if (raw_flagged and not any(has_la) and
                not any(op in ('set', 'mixed')
                        for op in rec.out_ops.values())):
            rec_d = run('delta')
            same = (list(rec_d.out_ops.items()) ==
                    list(rec.out_ops.items()))
            if same:
                import numpy as _np
                for k, v in rec.acc.items():
                    vd = rec_d.acc.get(k)
                    if vd is None or not _np.allclose(
                            _np.asarray(v), _np.asarray(vd),
                            rtol=1e-4, atol=1e-6):
                        same = False
                        break
            if same:
                for (_r, _c, f) in rec.sources:
                    f[0] = False
        return rec


# ---------------------------------------------------------------------------
# Kernel runner
# ---------------------------------------------------------------------------
class _KernelRunner(object):
    """mode='delta': reads return the provided base planes; each
    accumulation is an op-tagged contribution over this phase's
    candidate subset, combined into the caller's value-so-far scratch
    (exact for single-op sum/max/min bodies — the recording pass
    guarantees it before this mode is chosen; candidate sets may be
    split across stencil-offset phases).

    mode='seq': reads see the value-so-far (pending accumulation if
    any, else the base plane), and accumulations compose sequentially
    — including per-particle assigns ('set') and mixed ops.  Exact
    reference semantics; valid only when ONE phase sees the FULL
    candidate window (the union-compaction path)."""

    def __init__(self, dcols, scat_fn, dmaskf, smaskf_cat, consts,
                 mode='delta'):
        self._dcols = dcols          # plane key -> (nz, Md)
        self._scat = scat_fn         # plane key -> (nz, W)
        self.dmaskf = dmaskf
        self.smaskf_cat = smaskf_cat
        self._consts = consts        # (side, prop) -> 1D array
        self.mode = mode
        # delta: key -> (op, contrib); seq: key -> value-so-far
        self.acc = {}
        self.ctx = None

    def dcol(self, key):
        return self._dcols[key]

    def dread(self, key):
        if self.mode == 'seq' and key in self.acc:
            return self.acc[key]
        return self._dcols[key]

    def scat(self, key):
        return self._scat(key)

    def get_const(self, side, prop, key):
        return self._consts[(side, prop)][key]

    def accumulate(self, key, op, contrib):
        if self.mode == 'seq':
            cur = self.dread(key)
            if op == 'sum':
                val = cur + contrib
            elif op == 'max':
                val = jnp.maximum(cur, contrib)
            elif op == 'min':
                val = jnp.minimum(cur, contrib)
            else:
                val = jnp.broadcast_to(contrib, cur.shape)
            self.acc[key] = val
            return
        if op == 'set':
            raise PallasIneligible(
                'assignment accumulation on a per-offset phase')
        if key in self.acc:
            pop, cur = self.acc[key]
            if pop != op:
                raise PallasIneligible(
                    'mixed ops on %r in a per-offset phase' % (key,))
            if op == 'sum':
                cur = cur + contrib
            elif op == 'max':
                cur = jnp.maximum(cur, contrib)
            else:
                cur = jnp.minimum(cur, contrib)
            self.acc[key] = (op, cur)
        else:
            self.acc[key] = (op, contrib)


def _pair_kernel(eqs_list, kernel_obj, domain, radius_scale, meta,
                 *refs):
    """The pallas kernel: one active (x, y, z-tile) cell block per
    program (single grid axis over the scalar-prefetched active block
    list; entries past ``na`` repeat the last active block and are
    skipped).  All 9 (x, y)-offset neighbor views and all fused source
    phases run inside the program, accumulating into VMEM scratch, so
    each block's dest data is DMA'd once and its output written once —
    no cross-program revisiting.

    DMA-transaction economy is the point: dest props arrive as ONE
    prop-stacked block (plane 0 = write mask, 1 = slot mask, then the
    props), each (phase, oy, ox) source view as ONE prop-stacked block
    (plane 0 = slot mask, then the props) — ~30 descriptors per
    program instead of ~100 per (program, x-offset) with per-prop
    inputs (measured 35 us/program of pure DMA issue overhead at
    dam_break_3d dx=0.02 before this layout)."""
    (nx, ny, nz, tz, Md, oys, oxs, kper, d_props, d_const_list,
     src_metas, out_props, out_ops) = meta
    it = iter(refs)
    bi_ref = next(it)                # scalar prefetch: block coords
    bj_ref = next(it)
    bz_ref = next(it)
    na_ref = next(it)                # (1,): number of active blocks
    scal = next(it)                  # (1, 2): t, dt
    d_ref = next(it)                 # (1, 1, 2 + Pd, tz, Md)
    d_consts = {('d', p): next(it)[0] for p in d_const_list}
    srcs = []
    for s_props, s_const_list in src_metas:
        s_ref = {(oy, ox): next(it) for oy in oys for ox in oxs}
        s_consts = {('s', p): next(it)[0] for p in s_const_list}
        srcs.append((s_ref, s_props, s_consts, s_const_list))
    out_ref = next(it)               # (1, 1, Po, tz, Md)
    scratch = [next(it) for _ in out_props]

    t = scal[0, 0]
    dt = scal[0, 1]
    a = pl.program_id(0)
    valid = a < na_ref[0]
    i = bi_ref[a]
    j = bj_ref[a]
    zt = bz_ref[a]
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

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

    wmf = d_ref[0, 0, 0]
    dmaskf = d_ref[0, 0, 1]
    dcols = {p: d_ref[0, 0, 2 + pi] for pi, p in enumerate(d_props)}

    # the active list guarantees a dest particle somewhere in the
    # block, but this group's write mask may still leave nothing
    # writable.  Padding entries (a >= na) repeat the last active
    # block: skipping them flushes the VMEM out buffer unchanged — the
    # same correct values written at its real visit.
    occ = valid & (jnp.sum(wmf * dmaskf) > 0.0)

    # scratch init + final write run for EVERY valid block (a block
    # whose write mask is all-zero — e.g. pure-ghost blocks of a real
    # group — must still flush its identity output, not VMEM garbage);
    # only the pair compute is gated on writability.
    @pl.when(valid)
    def _init_scratch():
        # value-so-far protocol (see _pair_kernel_compact)
        for po, prop in enumerate(out_props):
            scratch[po][...] = dcols[prop]

    @pl.when(occ)
    def _compute():
        out_idx = {p: po for po, p in enumerate(out_props)}

        for oy in oys:
            if kper[1] or ny == 1:
                y_okf = one
            else:
                y_okf = jnp.where((j + oy >= 0) & (j + oy <= ny - 1),
                                  one, zero)
            for ox in oxs:
                if kper[0] or nx == 1:
                    x_okf = one
                else:
                    x_okf = jnp.where(
                        (i + ox >= 0) & (i + ox <= nx - 1), one, zero)
                for (s_ref, s_props, s_consts, s_const_list), eqs in \
                        zip(srcs, eqs_list):
                    # the 3 z-offset views were pre-shifted by
                    # jnp.roll and lane-concatenated in HBM (cyclic,
                    # so periodic wrap is free; out-of-range rows on
                    # non-periodic axes are edge-masked) — one packed
                    # (Ps, tz, 3Ms) block per (phase, oy, ox).
                    ref = s_ref[(oy, ox)]
                    Ms = ref.shape[-1] // 3
                    smaskf_cat = (x_okf * y_okf * z_edge_for(Ms) *
                                  ref[0, 0, 0])
                    src_any = jnp.sum(smaskf_cat) > 0.0

                    def _phase(ref=ref, s_props=s_props,
                               s_consts=s_consts,
                               s_const_list=s_const_list, eqs=eqs,
                               smaskf_cat=smaskf_cat):
                        def scat(prop):
                            pi = s_props.index(prop)
                            return ref[0, 0, 1 + pi]

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
                        _run_eqs(eqs, ctx, t, dt)
                        for prop, (op, val) in runner.acc.items():
                            sref = scratch[out_idx[prop]]
                            cur = sref[...]
                            if op == 'sum':
                                sref[...] = cur + val
                            elif op == 'max':
                                sref[...] = jnp.maximum(cur, val)
                            else:
                                sref[...] = jnp.minimum(cur, val)

                    # skip phases with no candidate in this offset
                    # view (obstacle/wall sources are empty in most
                    # interior fluid blocks)
                    pl.when(src_any)(_phase)

    @pl.when(valid)
    def _writeback():
        # value-so-far protocol: scratch was seeded with the pre-phase
        # value (see _init_scratch) and every op combined into it, so
        # the writeback is one uniform write-masked select — adding
        # ``cur`` again here would double-count the base for 'sum'
        for po, prop in enumerate(out_props):
            cur = dcols[prop]
            val = scratch[po][...]
            out_ref[0, 0, po] = jnp.where(wmf > 0, val, cur)


# ---------------------------------------------------------------------------
# Launcher
# ---------------------------------------------------------------------------
def _static_eligible(eqs, dest_schema, src_schema):
    for eq in eqs:
        for fn in (getattr(eq, 'loop', None),
                   getattr(eq, 'loop_all', None)):
            if fn is None:
                continue
            for arg in _method_args(fn):
                if arg in _SPECIAL_ARGS or arg in _SYM_DEPS:
                    continue
                if arg.startswith('d_') or arg.startswith('s_'):
                    continue     # strided props ride per-column planes
                # NBRS (raw neighbor indices) lands here: unsupported
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
                interpret=None, write_mask_flat=None, geometry=None):
        """Run the kernel; returns a dict of traced overflow flags
        ('block_overflow': more active blocks than the static A_max;
        'window_overflow': a union window exceeded its capacity); the
        caller folds them into the step diag.

        ``write_mask`` may be a (n_slots,) array or a zero-arg callable
        producing one (the compact path never needs slot-space masks,
        so the conversion is skipped); ``write_mask_flat`` is the same
        mask in flat particle space.  ``geometry`` is the binning's
        (origin, widths) — needed by the union-compaction AABB test."""
        import os
        compact = os.environ.get('PYSPH_TPU_COMPACT', '1') != '0'
        if compact and write_mask_flat is not None:
            return _execute_plan_compact(self, dest_store, spec,
                                         write_mask_flat, t, dt,
                                         interpret, geometry)
        if callable(write_mask):
            write_mask = write_mask()
        return {'block_overflow': _execute_plan(
            self, dest_store, spec, write_mask, t, dt, interpret)}


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
    rec = _record(
        [(eqs, set(s.schema.consts)) for s, eqs in phases],
        kernel_obj, domain, radius_scale, set(dest_schema.consts),
        dest_strides=dict(dest_schema.strides),
        src_strides_list=[dict(s.schema.strides)
                          for s, _ in phases])
    if not rec.out_ops:
        return None
    import os
    compact = os.environ.get('PYSPH_TPU_COMPACT', '1') != '0'
    needs_seq = [bool(f[0]) for (_r, _c, f) in rec.sources]
    strided = any(isinstance(k, tuple) for k in
                  (set(rec.d_read) | set(rec.out_ops) |
                   set().union(*(r for r, _c, _f in rec.sources))))
    if (any(needs_seq) or strided) and not compact:
        raise PallasIneligible(
            'sequential/strided phases need the compact union path')
    if any(needs_seq) and os.environ.get('PYSPH_TPU_UNION',
                                         'auto') == '0':
        raise PallasIneligible(
            'sequential-semantics phase with union compaction '
            'disabled')
    # prop-stacked DMA blocks require one uniform dtype
    fdt = dest_store.flat['x'].dtype

    def _flat_dtype(store, key):
        return store.flat[key[0] if isinstance(key, tuple)
                          else key].dtype

    for p in rec.out_ops:
        if not jnp.issubdtype(_flat_dtype(dest_store, p),
                              jnp.floating):
            raise PallasIneligible('non-float accumulation on %r'
                                   % (p,))
    for p in set(rec.d_read) | set(rec.out_ops):
        if _flat_dtype(dest_store, p) != fdt:
            raise PallasIneligible('mixed-dtype dest prop %r' % (p,))
    for (src_store, _), (s_read, _c, _f) in zip(phases, rec.sources):
        for p in s_read:
            if _flat_dtype(src_store, p) != fdt:
                raise PallasIneligible('mixed-dtype src prop %r'
                                       % (p,))
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

    # ---- active block list (sparse dispatch) -------------------------
    # A block is active if any dest slot in it holds a particle; the
    # grid walks only the first A_max entries of the activity-sorted
    # block list (padding entries repeat the last active block: their
    # compute is skipped).  A_max is a static fraction
    # (GridSpec.block_fracs) of the B blocks; exceeding it raises
    # diag['block_overflow'] and the solver re-jits with doubled caps.
    B = nx * ny * n_zt
    frac = spec.block_frac_for(dest_store.schema.name)
    if frac >= 1.0:
        # dense: every block visited in order — no activity sort, and
        # no post-kernel combine (every output block is written)
        A_max = B
        ids_np = np.arange(B, dtype=np.int32)
        bi_pf = jnp.asarray(ids_np // (ny * n_zt))
        bj_pf = jnp.asarray((ids_np // n_zt) % ny)
        bz_pf = jnp.asarray(ids_np % n_zt)
        na_pf = jnp.asarray([B], jnp.int32)
        block_ovf = jnp.asarray(False)
        act_exp = None
    else:
        act_blk = jnp.max(dmf.reshape(nx, ny, n_zt, tz * Md),
                          axis=3) > 0.0                  # (nx,ny,n_zt)
        act_flat = act_blk.reshape(B)
        A_max = min(B, int(np.ceil(frac * B)) + 8)
        n_act = jnp.sum(act_flat.astype(jnp.int32))
        block_ovf = n_act > A_max
        order = jnp.argsort(~act_flat).astype(jnp.int32)[:A_max]
        last = order[jnp.clip(n_act - 1, 0, A_max - 1)]
        ids = jnp.where(jnp.arange(A_max, dtype=jnp.int32) < n_act,
                        order, last)
        bi_pf = ids // (ny * n_zt)
        bj_pf = (ids // n_zt) % ny
        bz_pf = ids % n_zt
        na_pf = jnp.minimum(n_act, A_max).reshape(1)
        # blocks with no dest particle are never visited: their out
        # region is uninitialized — carry the pre-phase values through
        act_exp = jnp.broadcast_to(
            act_blk[:, :, :, None, None],
            (nx, ny, n_zt, tz, Md)).reshape(nx, ny, nz_p, Md)

    d_const_list = sorted(rec.d_consts)

    const_map = lambda a, bi, bj, bz, na: (0, 0)  # noqa: E731
    dest_map = lambda a, bi, bj, bz, na: \
        (bi[a], bj[a], 0, bz[a], 0)  # noqa: E731

    def _axis(v, n, wrap):
        # periodic axes wrap the stencil block index; non-periodic
        # ones clamp (the out-of-range offsets are edge-masked away)
        return jnp.mod(v, n) if wrap else jnp.clip(v, 0, n - 1)

    def _src_map(a, bi, bj, bz, na, ox, oy):
        # the z offset is pre-baked into the rolled arrays, so all
        # views read the *current* z-tile
        return (_axis(bi[a] + ox, nx, kper[0]),
                _axis(bj[a] + oy, ny, kper[1]), 0, bz[a], 0)

    # singleton axes (1D/2D after the axis swap): the +-1 offset
    # passes are fully edge-masked, skip them statically
    oys = (0,) if ny == 1 else (-1, 0, 1)
    oxs = (0,) if nx == 1 else (-1, 0, 1)

    # dest props as ONE prop-stacked block: plane 0 = write mask,
    # 1 = slot mask, then d_props (see _pair_kernel docstring for the
    # DMA-descriptor economics)
    d_pack = jnp.stack([wmf, dmf] + [dblock(dest_store[p])
                                     for p in d_props], axis=2)
    d_ins = {p: d_pack[:, :, 2 + pi]
             for pi, p in enumerate(d_props)}
    ins = [scal, d_pack]
    in_specs = [
        pl.BlockSpec((1, 2), const_map),
        pl.BlockSpec((1, 1, 2 + len(d_props), tz, Md), dest_map),
    ]
    for p in d_const_list:
        c = jnp.asarray(dest_store[p]).reshape(1, -1)
        ins.append(c)
        in_specs.append(pl.BlockSpec(c.shape, const_map))

    src_metas = []
    eqs_list = []
    for (src_store, eqs), Ms, (s_read, s_consts, _seq) in zip(
            plan.phases, Mss, rec.sources):
        src_consts = set(src_store.schema.consts)
        s_props = tuple(sorted((s_read | dep_props) - src_consts))
        s_const_list = sorted(s_consts)
        smf3 = sblock3(jnp.where(src_store.layout.slot_mask, 1.0,
                                 0.0).astype(fdt), Ms)
        s_pack = jnp.stack([smf3] + [sblock3(src_store[p], Ms)
                                     for p in s_props], axis=2)
        spec_blk = (1, 1, 1 + len(s_props), tz, 3 * Ms)
        for oy in oys:
            for ox in oxs:
                ins.append(s_pack)
                in_specs.append(pl.BlockSpec(
                    spec_blk,
                    functools.partial(_src_map, ox=ox, oy=oy)))
        for p in s_const_list:
            c = jnp.asarray(src_store[p]).reshape(1, -1)
            ins.append(c)
            in_specs.append(pl.BlockSpec(c.shape, const_map))
        src_metas.append((s_props, tuple(s_const_list)))
        eqs_list.append(eqs)

    Po = len(out_props)
    out_spec = pl.BlockSpec((1, 1, Po, tz, Md), dest_map)
    out_shape = jax.ShapeDtypeStruct((nx, ny, Po, nz_p, Md), fdt)

    meta = (nx, ny, nz, tz, Md, oys, oxs, kper, tuple(d_props),
            tuple(d_const_list), tuple(src_metas), tuple(out_props),
            dict(rec.out_ops))
    kern = functools.partial(_pair_kernel, eqs_list, kernel_obj,
                             domain, radius_scale, meta)
    if interpret is None:
        interpret = jax.default_backend() not in ('tpu', 'axon')
    from jax.experimental.pallas import tpu as pltpu
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=(A_max,), in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((tz, Md), fdt)
                        for _ in out_props])
    outp = pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
        **_compiler_kwargs(pltpu))(bi_pf, bj_pf, bz_pf, na_pf, *ins)
    for po, p in enumerate(out_props):
        out = outp[:, :, po]
        if act_exp is not None:
            out = jnp.where(act_exp, out, d_ins[p])
        out = out[:, :, :nz, :] if nz_p != nz else out
        dest_store[p] = out.reshape(C * Md)
    return block_ovf


# ---------------------------------------------------------------------------
# Compacted execution: packs live only over ACTIVE blocks
# ---------------------------------------------------------------------------
class _UnionMeta(NamedTuple):
    """Static per-kernel union-compaction config: ``Ks`` has one
    entry per source (window capacity, or None = classic per-offset
    phases), ``cz`` is the pair-phase row-chunk height (VMEM bound),
    ``swapped`` marks the 1D/2D kernel-axis swap for the AABB test."""
    Ks: tuple
    cz: int
    swapped: bool


def _shift_lanes_left(a, s):
    """Shift lanes left by static ``s`` (vacated lanes zero-filled).
    Mosaic lowers static lane slicing/concat to vector shifts."""
    pad = jnp.zeros(a.shape[:-1] + (s,), a.dtype)
    return jnp.concatenate([a[..., s:], pad], axis=-1)


def _shift_lanes_right(a, s):
    pad = jnp.zeros(a.shape[:-1] + (s,), a.dtype)
    return jnp.concatenate([pad, a[..., :-s]], axis=-1)


def _lane_cumsum(x):
    """Inclusive prefix sum along lanes (Hillis-Steele over static
    shifts; Mosaic has no cumsum primitive)."""
    n = x.shape[-1]
    s = 1
    while s < n:
        x = x + _shift_lanes_right(x, s)
        s *= 2
    return x


def _left_pack(flag, planes, K):
    """Pack flagged lanes to the front of each row, truncated to K.

    ``flag``: (R, C) int32 0/1; ``planes``: list of (R, C) float
    arrays packed with one shared shift schedule (split-radix: move
    every element left by its distance-to-rank, one bit per step —
    monotone distances never collide).  Unflagged/overflow lanes are
    zero.  Returns (packed planes (R, K), count (R, 1) int32).

    All masks stay int32: Mosaic cannot bitcast i1 vregs for the
    shifted-concat moves."""
    C = flag.shape[-1]
    rank = _lane_cumsum(flag)
    count = rank[:, C - 1:C]
    pos = jax.lax.broadcasted_iota(jnp.int32, flag.shape, 1)
    dist = flag * (pos - (rank - 1))
    ff = flag.astype(planes[0].dtype)
    vals = [ff * p for p in planes]
    alive = flag
    step = 1
    while step < C:
        bit = jax.lax.rem(dist // step, jnp.int32(2))
        moved = alive * bit
        recv = _shift_lanes_left(moved, step)
        stay = alive * (1 - bit)
        rf = recv.astype(vals[0].dtype)
        sf = stay.astype(vals[0].dtype)
        vals = [rf * _shift_lanes_left(v, step) + sf * v
                for v in vals]
        dist = recv * (_shift_lanes_left(dist, step) - step) + \
            stay * dist
        alive = recv + stay
        step *= 2
    return [v[..., :K] for v in vals], count


def _pair_kernel_compact(eqs_list, kernel_obj, domain, radius_scale,
                         meta, *refs):
    """Compact variant of ``_pair_kernel``: dest/source packs are
    plane-LANE-folded (A, tz, P*Md / P*3Ms) arrays over the active-
    block lists only, so no dense slot-space arrays are ever
    materialized.  The plane dim lives in the lane axis (static lane
    slices recover per-prop columns in-kernel) so every DMA block is
    one wide contiguous row run — plane-minor (P, tz, Md) blocks move
    sub-512B rows and measured ~9-150 GB/s effective; the folded
    layout moves 1.6-4.6 KB rows.  Geometry handling (x/y edges and
    wrap, z edges/wrap) stays out of the kernel: the source index maps
    resolve out-of-range/inactive neighbors to the reserved all-zero
    entry 0, and the z lane-concat was gathered with sentinel rows
    host-side.  The kernel is pure pair arithmetic over mask planes."""
    (tz, Md, oys, oxs, d_props, d_const_list, src_metas, out_props,
     out_ops, union, d_strides_t) = meta
    d_strides = dict(d_strides_t)
    s_strides_list = [dict(m[3]) for m in src_metas]
    it = iter(refs)
    bi_ref = next(it)                # scalar prefetch (used by maps)
    bj_ref = next(it)
    bz_ref = next(it)
    na_ref = next(it)                # (1,): number of active blocks
    for _ in src_metas:
        next(it)                     # per-source inverse block maps
    scal = next(it)                  # (1, 2) [t, dt] or (1, 8) union
    d_ref = next(it)                 # (1, tz, (2 + Pd) * Md)
    d_consts = {('d', p): next(it)[0] for p in d_const_list}
    srcs = []
    for s_props, s_const_list, _Ms, _sstr in src_metas:
        s_ref = {(oy, ox): next(it) for oy in oys for ox in oxs}
        s_consts = {('s', p): next(it)[0] for p in s_const_list}
        srcs.append((s_ref, s_props, s_consts, s_const_list))
    out_ref = next(it)               # (1, tz, Po(+1 union) * Md)
    scratch = [next(it) for _ in out_props]
    exc_scratch = None
    if union is not None and any(K is not None for K in union.Ks):
        exc_scratch = next(it)

    t = scal[0, 0]
    dt = scal[0, 1]
    a = pl.program_id(0)
    valid = a < na_ref[0]

    dfold = d_ref[0]                 # (tz, (2 + Pd) * Md)
    wmf = dfold[:, 0:Md]
    dmaskf = dfold[:, Md:2 * Md]
    dcols = {p: dfold[:, (2 + pi) * Md:(3 + pi) * Md]
             for pi, p in enumerate(d_props)}

    occ = valid & (jnp.sum(wmf * dmaskf) > 0.0)

    # scratch protocol: VALUE-SO-FAR.  Each out plane's scratch is
    # initialized to its pre-phase value; per-offset (delta) phases
    # op-combine contributions into it, union (seq) phases read it as
    # the current value and overwrite — so mixed per-offset and
    # sequential sources compose exactly, and the writeback is one
    # uniform write-masked select.
    @pl.when(valid)
    def _init_scratch():
        for po, prop in enumerate(out_props):
            scratch[po][...] = dcols[prop]
        if exc_scratch is not None:
            exc_scratch[...] = jnp.zeros(exc_scratch.shape,
                                         exc_scratch.dtype)

    def _accumulate(runner, out_idx):
        for prop, (op, val) in runner.acc.items():
            sref = scratch[out_idx[prop]]
            cur = sref[...]
            if op == 'sum':
                sref[...] = cur + val
            elif op == 'max':
                sref[...] = jnp.maximum(cur, val)
            else:
                sref[...] = jnp.minimum(cur, val)

    def _union_windows(si):
        """Per-row union window of source ``si``: lane-concat the
        stencil strips, prune candidates by exact distance to the
        dest cell's AABB (conservative superset of every per-pair
        max(hi,hj) support test), left-pack the value planes, and
        return (packed planes, pair mask, count excess)."""
        (s_ref, s_props, _sc, _scl) = srcs[si]
        fdt = d_ref.dtype
        refs9 = [s_ref[(oy, ox)] for oy in oys for ox in oxs]
        W3 = refs9[0].shape[-1] // (1 + len(s_props))

        def win(pi):
            return jnp.concatenate(
                [r_[0][:, pi * W3:(pi + 1) * W3] for r_ in refs9],
                axis=-1)

        wmask = win(0)                          # (tz, C)
        C = wmask.shape[-1]
        K = min(union.Ks[si], C)
        wx = win(1 + s_props.index('x'))
        wy = win(1 + s_props.index('y'))
        wz = win(1 + s_props.index('z'))
        wh = win(1 + s_props.index('h'))
        # dest cell AABB (kernel axes; scal rows 2.. are the swapped
        # origin/width): i from bi, j from bj, z per row r
        o_i, o_j, o_z = scal[0, 2], scal[0, 3], scal[0, 4]
        w_i, w_j, w_z = scal[0, 5], scal[0, 6], scal[0, 7]
        cc_i = o_i + (bi_ref[a].astype(fdt) + 0.5) * w_i
        cc_j = o_j + (bj_ref[a].astype(fdt) + 0.5) * w_j
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (tz, 1), 0)
        cc_z = o_z + ((bz_ref[a] * tz + iota_r).astype(fdt) + 0.5) \
            * w_z
        if union.swapped:
            # 2D/1D: kernel z-axis is the physical y-axis
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
        dh = dcols['h']
        hrow = jnp.max(dh * dmaskf, axis=-1, keepdims=True)  # (tz,1)
        sup = radius_scale * jnp.maximum(hrow, wh)
        flag = jnp.where((d2 <= sup * sup) & (wmask > 0.0), 1, 0)
        flag = flag.astype(jnp.int32)
        if K >= C:
            # window fits uncompacted: flags become the pair mask and
            # the pack pass is skipped entirely
            ff = flag.astype(fdt)
            pk = {p: win(1 + pi) for pi, p in enumerate(s_props)}
            return pk, ff * wmask, jnp.zeros((tz, 1), fdt)
        planes = [wmask] + [win(1 + pi)
                            for pi in range(len(s_props))]
        packed, count = _left_pack(flag, planes, K)
        excess = jnp.maximum(count - K, 0).astype(fdt)
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (tz, K), 1)
        pmaskf = jnp.where(k_iota < count, 1.0, 0.0).astype(fdt)
        # left-pack zero-fills dropped lanes; fold the slot mask so
        # stale values beyond count can never contribute
        pk = {p: packed[1 + pi] * pmaskf
              for pi, p in enumerate(s_props)}
        return pk, pmaskf * packed[0], excess

    @pl.when(occ)
    def _compute():
        out_idx = {p: po for po, p in enumerate(out_props)}
        Ks = union.Ks if union is not None else \
            tuple(None for _ in srcs)
        for oy in oys:
            for ox in oxs:
                for si, ((s_ref, s_props, s_consts, s_const_list),
                         eqs) in enumerate(zip(srcs, eqs_list)):
                    if Ks[si] is not None:
                        continue
                    ref = s_ref[(oy, ox)]
                    W3 = ref.shape[-1] // (1 + len(s_props))
                    smaskf_cat = ref[0][:, 0:W3]    # (tz, 3Ms)
                    src_any = jnp.sum(smaskf_cat) > 0.0

                    def _phase(ref=ref, s_props=s_props,
                               s_consts=s_consts,
                               s_const_list=s_const_list, eqs=eqs,
                               smaskf_cat=smaskf_cat, W3=W3, si=si):
                        def scat(prop):
                            pi = s_props.index(prop)
                            return ref[0][:, (1 + pi) * W3:
                                          (2 + pi) * W3]

                        consts = {}
                        consts.update(d_consts)
                        consts.update(s_consts)
                        runner = _KernelRunner(dcols, scat, dmaskf,
                                               smaskf_cat, consts)
                        ctx = PlanePairContext(
                            runner, kernel_obj, domain, radius_scale,
                            set(p for p in d_const_list),
                            set(p for p in s_const_list),
                            dest_strides=d_strides,
                            src_strides=s_strides_list[si])
                        runner.ctx = ctx
                        _run_eqs(eqs, ctx, t, dt)
                        _accumulate(runner, out_idx)

                    pl.when(src_any)(_phase)

        for si, ((s_ref, s_props, s_consts, s_const_list), eqs) in \
                enumerate(zip(srcs, eqs_list)):
            if Ks[si] is None:
                continue
            # any candidate in the 9 strips at all?
            W3s = (s_ref[(oys[0], oxs[0])].shape[-1] //
                   (1 + len(s_props)))
            tot = None
            for oy in oys:
                for ox in oxs:
                    m = jnp.sum(s_ref[(oy, ox)][0][:, 0:W3s])
                    tot = m if tot is None else tot + m
            src_any = tot > 0.0

            def _uphase(si=si, s_props=s_props, s_consts=s_consts,
                        s_const_list=s_const_list, eqs=eqs):
                pk, pmaskf, excess = _union_windows(si)
                # truncating the window of a row with no written dest
                # slots is harmless (its accumulations are masked by
                # wmf); without this, empty rows of active blocks next
                # to a dense source region (e.g. boundary rows beside
                # the fluid bulk) trip window_overflow for windows no
                # output depends on, forcing a spurious grow+recompile
                rocc = jnp.max(wmf * dmaskf, axis=-1, keepdims=True)
                exc_scratch[...] = jnp.maximum(
                    exc_scratch[...],
                    jnp.broadcast_to(excess * rocc,
                                     exc_scratch.shape))
                cz = union.cz
                consts = {}
                consts.update(d_consts)
                consts.update(s_consts)
                for r0 in range(0, tz, cz):
                    sl = slice(r0, r0 + cz)
                    # skip row chunks with no writable dest (blocks
                    # cover tz z-cells but the dest often occupies a
                    # few: measured ~24% slot occupancy at
                    # dam_break_3d dx=0.02)
                    chunk_any = jnp.sum(wmf[sl] * dmaskf[sl]) > 0.0

                    def _chunk(sl=sl):
                        # seq mode: out planes read the value-so-far
                        # from scratch (earlier sources / earlier
                        # statements included); acc holds the new
                        # value-so-far, written back wholesale
                        dcols_c = {
                            p: (scratch[out_idx[p]][sl, :]
                                if p in out_idx else dcols[p][sl])
                            for p in d_props}

                        def scat(prop, sl=sl):
                            return pk[prop][sl]

                        runner = _KernelRunner(dcols_c, scat,
                                               dmaskf[sl],
                                               pmaskf[sl], consts,
                                               mode='seq')
                        ctx = PlanePairContext(
                            runner, kernel_obj, domain, radius_scale,
                            set(p for p in d_const_list),
                            set(p for p in s_const_list),
                            dest_strides=d_strides,
                            src_strides=s_strides_list[si])
                        runner.ctx = ctx
                        _run_eqs(eqs, ctx, t, dt)
                        for prop, val in runner.acc.items():
                            scratch[out_idx[prop]][sl, :] = val

                    pl.when(chunk_any)(_chunk)

            pl.when(src_any)(_uphase)

    @pl.when(valid)
    def _writeback():
        for po, prop in enumerate(out_props):
            cur = dcols[prop]
            val = scratch[po][...]        # value-so-far
            out_ref[0, :, po * Md:(po + 1) * Md] = \
                jnp.where(wmf > 0, val, cur)
        if exc_scratch is not None:
            Po_ = len(out_props)
            out_ref[0, :, Po_ * Md:(Po_ + 1) * Md] = exc_scratch[...]


def _flat_block(i, j, zt, ny, n_zt):
    return (i * ny + j) * n_zt + zt


def _active_ids(act_flat, A_max, B):
    """Activity-sorted id list (padded by repeating the last active
    entry) + inverse block map (0 = inactive/reserved)."""
    n_act = jnp.sum(act_flat.astype(jnp.int32))
    order = jnp.argsort(~act_flat).astype(jnp.int32)[:A_max]
    last = order[jnp.clip(n_act - 1, 0, A_max - 1)]
    ar = jnp.arange(A_max, dtype=jnp.int32)
    ids = jnp.where(ar < n_act, order, last)
    sids = jnp.where(ar < n_act, order, B)      # sentinel-dropped
    inv = jnp.zeros(B, jnp.int32).at[sids].set(ar + 1, mode='drop')
    ovf = n_act > A_max
    return ids, inv, jnp.minimum(n_act, A_max), ovf


def _block_activity(layout, M, nx, ny, nz, n_zt, tz):
    """(B,) bool: block holds >= 1 particle of this layout."""
    C = nx * ny * nz
    occ_cell = jnp.any(layout.slot_mask.reshape(C, M), axis=1)
    g = occ_cell.reshape(nx, ny, nz)
    if n_zt * tz != nz:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, n_zt * tz - nz)))
    return jnp.any(g.reshape(nx, ny, n_zt, tz), axis=3).reshape(-1)


def _store_active_ids(store, M, A_max, nx, ny, nz, n_zt, tz):
    """Activity + id lists for one store, cached on the store so a
    store serving several roles in one eval (fluid as dest and as the
    source of other dests) computes them once."""
    B = nx * ny * n_zt
    key = (getattr(store, '_version', 0), M, A_max, nx, ny, n_zt, tz)
    cached = getattr(store, '_ids_cache', None)
    if cached is not None and cached[0] == key:
        return cached[1]
    act = _block_activity(store.layout, M, nx, ny, nz, n_zt, tz)
    out = _active_ids(act, A_max, B)
    store._ids_cache = (key, out)
    return out


def _compact_rows(layout, M, cell_idx, zok):
    """Particle index per compacted slot: (A, tz, M) int32, -1 empty."""
    C = layout.slot_to_particle.shape[0] // M
    s2p = layout.slot_to_particle.reshape(C, M)
    p_idx = s2p[cell_idx]                      # (A, tz, M) row gather
    return jnp.where(zok[:, :, None], p_idx, -1)


def _rows_matrix(flat_cols, p_idx):
    """Plane-major rows matrix for pack building.

    ``flat_cols``: list of (cap,) arrays (the plane order);
    ``p_idx``: (A, tz, M) particle index per compacted slot, -1 empty.

    Returns ``(P*A*tz + 1, M)``: row ``(p*A + a)*tz + r`` holds plane
    ``p`` of block ``a``'s z-row ``r``; empty slots hold 0 in every
    plane (sentinel-row gather — pass a ones column to obtain the
    slot mask as a plane); the appended final row is all-zero so
    callers can route invalid row lookups to it.

    Two proven-fast passes: one (rows x P) gather from the flat
    matrix and one barrier-forced linearized transpose (see
    PERF_NOTES.md on XLA:TPU gather and transpose behavior); callers
    finish with a single row gather into their pack layout."""
    A, tz, M = p_idx.shape
    P = len(flat_cols)
    cap = flat_cols[0].shape[0]
    F = jnp.stack(flat_cols, axis=1)           # (cap, P)
    F = jnp.concatenate([F, jnp.zeros((1, P), F.dtype)])
    idx = jnp.where(p_idx >= 0, p_idx, cap).reshape(-1)
    G = F[idx]                                 # (A*tz*M, P) row gather
    Gt = jax.lax.optimization_barrier(G.T.reshape(-1))
    rows = Gt.reshape(P * A * tz, M)
    return jnp.concatenate([rows, jnp.zeros((1, M), rows.dtype)])


def _pack_from_rows(rows, planes, A, tz, M):
    """(A, tz, len(planes) * M) lane-folded pack: plane p of block a's
    z-row r lands in lanes [p*M, (p+1)*M) of row (a, r).  The folded
    layout keeps every DMA block one contiguous wide-row run (plane-
    minor packs moved sub-512B rows and measured ~9 GB/s effective)."""
    ar_a = jnp.arange(A, dtype=jnp.int32)
    ar_p = jnp.asarray(planes, dtype=jnp.int32)
    ar_r = jnp.arange(tz, dtype=jnp.int32)
    ridx = ((ar_p[None, None, :] * A + ar_a[:, None, None]) * tz +
            ar_r[None, :, None])               # (A, tz, P)
    return rows[ridx.reshape(-1)].reshape(A, tz, len(planes) * M)


def _execute_plan_compact(plan, dest_store, spec, write_mask_flat, t,
                          dt, interpret=None, geometry=None):
    """Compact-pack execution of a validated plan: all HBM staging is
    proportional to ACTIVE blocks (geometric occupancy), not the dense
    bounding grid — measured ~9x less staged data at dam_break_3d
    dx=0.02 (11% block activity).

    When ``geometry`` is available and a source's stencil window is
    wide (3D at real cell capacities), the kernel compacts each dest
    cell's candidate window in VMEM before the pair phase (union
    compaction, see _left_pack) — replacing 9 per-offset (tz, Md,
    pad128(3Ms)) pair blocks with one (tz, Md, K) block over the
    distance-pruned window."""
    rec = plan.rec
    dest_consts = set(dest_store.schema.consts)
    C = spec.n_cells
    Md = dest_store.layout.slot_to_particle.shape[0] // C
    Mss = [s.layout.slot_to_particle.shape[0] // C
           for s, _ in plan.phases]

    dep_props = set(_XYZH)
    for _, eqs in plan.phases:
        for eq in eqs:
            for fn_ in (getattr(eq, 'loop', None),
                        getattr(eq, 'loop_all', None)):
                if fn_ is None:
                    continue
                for a_ in _method_args(fn_):
                    if a_ in _SYM_DEPS:
                        dep_props.update(_SYM_DEPS[a_])
    d_prop_set = (rec.d_read | set(rec.out_ops) | dep_props) - \
        dest_consts
    # self-source phases (src is dest) read their base planes straight
    # from the dest pack: fold their props in so every plane exists
    for (src_store_, _eqs_), (s_read_, _sc_, _f_) in zip(plan.phases,
                                                         rec.sources):
        if src_store_ is dest_store:
            d_prop_set |= (s_read_ | dep_props) - \
                set(src_store_.schema.consts)
    d_props = sorted(d_prop_set, key=_pkey)
    out_props = list(rec.out_ops)
    fdt = dest_store.flat['x'].dtype

    nx, ny, nz, kper, tz, n_zt, nz_p = _tiling(spec, Md, max(Mss))
    B = nx * ny * n_zt

    from pysph_tpu.sph.acceleration_eval import FlatView
    fview = FlatView(dest_store)

    # ---- active dest blocks -----------------------------------------
    frac = spec.block_frac_for(dest_store.schema.name)
    A_max = min(B, int(np.ceil(frac * B)) + 8) if frac < 1.0 else B
    ids, inv_d, na, block_ovf = _store_active_ids(
        dest_store, Md, A_max, nx, ny, nz, n_zt, tz)
    bi = ids // (ny * n_zt)
    bj = (ids // n_zt) % ny
    bz = ids % n_zt
    na_pf = na.reshape(1)

    # rows of each active block: cell indices + z validity
    ar_tz = jnp.arange(tz, dtype=jnp.int32)
    zcell = bz[:, None] * tz + ar_tz[None, :]            # (A, tz)
    zok = zcell < nz
    cell_idx = ((bi * ny + bj)[:, None] * nz +
                jnp.minimum(zcell, nz - 1))              # (A, tz)

    p_idx_d = _compact_rows(dest_store.layout, Md, cell_idx, zok)
    wm_flat = jnp.where(write_mask_flat, 1.0, 0.0).astype(fdt)
    ones_d = jnp.ones_like(wm_flat)
    # plane order: write mask, slot mask (a gathered ones column:
    # empty slots read the sentinel zero row), then props
    rows_d = _rows_matrix(
        [wm_flat, ones_d] + [_flat_col(fview, p, fdt)
                             for p in d_props], p_idx_d)
    A_d = p_idx_d.shape[0]
    d_pack = _pack_from_rows(rows_d, range(2 + len(d_props)), A_d,
                             tz, Md)

    d_const_list = sorted(rec.d_consts)
    const_map = lambda a, *refs: (0, 0)  # noqa: E731
    dest_map = lambda a, *refs: (a, 0, 0)  # noqa: E731

    oys = (0,) if ny == 1 else (-1, 0, 1)
    oxs = (0,) if nx == 1 else (-1, 0, 1)

    # ---- union-compaction decision per source -----------------------
    import os
    n_oxy = len(oys) * len(oxs)
    env_u = os.environ.get('PYSPH_TPU_UNION', 'auto')
    dname = dest_store.schema.name
    any_seq = any(bool(f[0]) for (_r, _c, f) in rec.sources)
    Ks = []
    for (src_store_u, _e), Ms, (s_read, _sc, _f) in zip(
            plan.phases, Mss, rec.sources):
        # sequential-semantics phases (read-after-write, assigns,
        # loop_all) are exact only on the union path, where ONE phase
        # sees the full candidate window and sources run in reference
        # order — force it for every source of the fused call
        force = any_seq
        if geometry is None or env_u == '0' or 'h' not in d_props:
            if force:
                raise PallasIneligible(
                    'sequential-semantics phase without union-window '
                    'support (no geometry)')
            Ks.append(None)
            continue
        needed = (s_read | dep_props) - set(src_store_u.schema.consts)
        if not {'x', 'y', 'z', 'h'} <= needed:
            if force:
                raise PallasIneligible(
                    'sequential-semantics phase without x/y/z/h '
                    'source planes')
            Ks.append(None)
            continue
        C_s = n_oxy * 3 * Ms
        sname_u = src_store_u.schema.name
        # per-pair cap first (a wall dest sees a half-space of fluid,
        # so its window is much smaller than fluid<-fluid), then the
        # per-source cap, then the geometric default
        pair_key = '%s<-%s' % (dname, sname_u)
        K = spec.window_cap_for(pair_key)
        if K == 0:
            K = spec.window_cap_for(sname_u)
        if K == 0:
            # geometric default: the Minkowski sum of a cell and the
            # support ball covers ~0.64-0.75 of the full stencil
            # window at typical slack; overflow grows it at runtime
            K = _pad_up(max(128, int(0.72 * C_s)), 128)
        K = min(K, _pad_up(C_s, 128))
        # only worth it when the packed window beats the per-offset
        # lane-padded pair blocks by a clear margin
        if (not force and env_u != '1' and
                n_oxy * _pad_up(3 * Ms, 128) < K + 256):
            Ks.append(None)
            continue
        spec.window_caps.setdefault(pair_key, K)
        Ks.append(K)
    any_union = any(K is not None for K in Ks)
    union = None
    if any_union:
        n_temps = int(os.environ.get('PYSPH_TPU_VMEM_TEMPS', '50'))
        Kmax = max(K for K in Ks if K)
        row_b = (n_temps * _pad_up(Md, 8) * _pad_up(Kmax, 128) *
                 np.dtype(fdt).itemsize)
        cz = max(1, min(tz, int(12e6 // row_b)))
        cz_env = os.environ.get('PYSPH_TPU_UNION_CZ')
        if cz_env:
            cz = max(1, min(tz, int(cz_env)))
        while tz % cz:
            cz -= 1
        union = _UnionMeta(tuple(Ks), cz, spec.dims[2] == 1)

    ins = []
    in_specs = []
    tdt = [jnp.asarray(t, fdt), jnp.asarray(dt, fdt)]
    if any_union:
        origin_g, widths_g = geometry
        if spec.dims[2] == 1:
            gvals = [origin_g[0], jnp.zeros((), fdt), origin_g[1],
                     widths_g[0], jnp.ones((), fdt), widths_g[1]]
        else:
            gvals = [origin_g[0], origin_g[1], origin_g[2],
                     widths_g[0], widths_g[1], widths_g[2]]
        tdt += [jnp.asarray(v, fdt) for v in gvals]
    scal = jnp.stack(tdt).reshape(1, len(tdt))
    ins.append(scal)
    in_specs.append(pl.BlockSpec((1, len(tdt)), const_map))
    ins.append(d_pack)
    in_specs.append(pl.BlockSpec((1, tz, (2 + len(d_props)) * Md),
                                 dest_map))
    for p in d_const_list:
        c = jnp.asarray(dest_store[p]).reshape(1, -1)
        ins.append(c)
        in_specs.append(pl.BlockSpec(c.shape, const_map))

    def smap(a, bi_, bj_, bz_, na_, *invs, ox=0, oy=0, si=0):
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
        flat = (jnp.clip(i2, 0, nx - 1) * ny +
                jnp.clip(j2, 0, ny - 1)) * n_zt + bz_[a]
        e = invs[si][flat]
        if iok is not True:
            e = jnp.where(iok, e, 0)
        if jok is not True:
            e = jnp.where(jok, e, 0)
        return (e, 0, 0)

    # ---- sources -----------------------------------------------------
    inv_srcs = []
    src_metas = []
    eqs_list = []
    for si, ((src_store, eqs), Ms, (s_read, s_consts,
                                    _seq)) in enumerate(
            zip(plan.phases, Mss, rec.sources)):
        src_consts = set(src_store.schema.consts)
        needed = (s_read | dep_props) - src_consts
        s_const_list = sorted(s_consts)
        sname = src_store.schema.name
        cache_key = (Ms, tz, nx, ny, n_zt, str(fdt))
        cached = getattr(src_store, '_spack_cache', None)
        version = getattr(src_store, '_version', 0)
        if (cached is not None and cached[0] == version and
                cached[1] == cache_key and
                set(cached[2]) >= needed):
            # same source already packed this eval (e.g. the fluid
            # array feeding several dest arrays of one group) — reuse
            # wholesale; the kernel indexes the superset plane list
            _v, _k, s_props, inv_s, s_pack, s_ovf = cached
            block_ovf = block_ovf | s_ovf
            inv_srcs.append(inv_s)
            Pp = 1 + len(s_props)
            src_metas.append((s_props, tuple(s_const_list), Ms,
                              tuple(src_store.schema.strides.items())))
            eqs_list.append(eqs)
            spec_blk = (1, tz, Pp * 3 * Ms)
            for oy in oys:
                for ox in oxs:
                    ins.append(s_pack)
                    in_specs.append(pl.BlockSpec(
                        spec_blk,
                        functools.partial(smap, ox=ox, oy=oy,
                                          si=len(inv_srcs) - 1)))
            for p in s_const_list:
                c = jnp.asarray(src_store[p]).reshape(1, -1)
                ins.append(c)
                in_specs.append(pl.BlockSpec(c.shape, const_map))
            continue

        s_props = tuple(sorted(needed, key=_pkey))
        sfrac = spec.block_frac_for(sname)
        A_s = min(B, int(np.ceil(sfrac * B)) + 8) if sfrac < 1.0 \
            else B
        s_ids, inv_s, _ns, s_ovf = _store_active_ids(
            src_store, Ms, A_s, nx, ny, nz, n_zt, tz)
        block_ovf = block_ovf | s_ovf
        inv_srcs.append(inv_s)

        sbi = s_ids // (ny * n_zt)
        sbj = (s_ids // n_zt) % ny
        sbz = s_ids % n_zt
        szcell = sbz[:, None] * tz + ar_tz[None, :]
        szok = szcell < nz
        # z lane-concat straight from a plane-major rows matrix:
        # entry 0 of the final pack is the reserved all-zero block;
        # entries 1..A_s map active source blocks.  For target row
        # (b, r, oz): locate the block holding z-cell zt*tz + r + oz
        # via inv_s; invalid lookups route to the sentinel zero row.
        z3 = szcell[:, :, None] + jnp.asarray([-1, 0, 1])  # (A_s,tz,3)
        if kper[2]:
            z3 = jnp.mod(z3, nz)
            z_in = jnp.ones_like(z3, dtype=bool)
        else:
            z_in = (z3 >= 0) & (z3 < nz)
        zt2 = jnp.clip(z3, 0, nz - 1) // tz
        r2 = jnp.clip(z3, 0, nz - 1) % tz
        nb_flat = ((sbi * ny + sbj)[:, None, None] * n_zt + zt2)
        a2 = inv_s[nb_flat]                    # (A_s, tz, 3); 0=empty
        vmask = z_in & (a2 > 0)

        if src_store is dest_store and A_s == A_max:
            # the dest rows matrix already holds every plane (fold-in
            # above) in the same block order: gather from it directly
            rows_s = rows_d
            A_rows = A_max
            pl_list = [1] + [2 + d_props.index(p) for p in s_props]
        else:
            scell = ((sbi * ny + sbj)[:, None] * nz +
                     jnp.minimum(szcell, nz - 1))
            p_idx_s = _compact_rows(src_store.layout, Ms, scell, szok)
            sfv = FlatView(src_store)
            rows_s = _rows_matrix(
                [jnp.ones((src_store.flat['x'].shape[0],), fdt)] +
                [_flat_col(sfv, p, fdt) for p in s_props], p_idx_s)
            A_rows = A_s
            pl_list = list(range(1 + len(s_props)))

        Pp = 1 + len(s_props)
        sent = rows_s.shape[0] - 1
        ar_p = jnp.asarray(pl_list, dtype=jnp.int32)
        # lane-folded ordering (A_s, tz, Pp, 3): lanes of the pack are
        # (plane, z-offset, slot) so each DMA block is one contiguous
        # (tz, Pp * 3Ms) row run
        ridx = ((ar_p[None, None, :, None] * A_rows +
                 jnp.maximum(a2 - 1, 0)[:, :, None, :]) * tz +
                r2[:, :, None, :])
        ridx = jnp.where(vmask[:, :, None, :], ridx, sent)
        got = rows_s[ridx.reshape(-1)]
        s_pack = got.reshape(A_s, tz, Pp * 3 * Ms)
        s_pack = jnp.concatenate(
            [jnp.zeros((1,) + s_pack.shape[1:], s_pack.dtype),
             s_pack], axis=0)                  # reserved entry 0
        src_store._spack_cache = (version, cache_key, s_props, inv_s,
                                  s_pack, s_ovf)

        spec_blk = (1, tz, Pp * 3 * Ms)
        for oy in oys:
            for ox in oxs:
                ins.append(s_pack)
                in_specs.append(pl.BlockSpec(
                    spec_blk,
                    functools.partial(smap, ox=ox, oy=oy,
                                      si=len(inv_srcs) - 1)))
        for p in s_const_list:
            c = jnp.asarray(src_store[p]).reshape(1, -1)
            ins.append(c)
            in_specs.append(pl.BlockSpec(c.shape, const_map))
        src_metas.append((s_props, tuple(s_const_list), Ms,
                          tuple(src_store.schema.strides.items())))
        eqs_list.append(eqs)

    Po = len(out_props)
    Po_out = Po + 1 if any_union else Po
    out_spec = pl.BlockSpec((1, tz, Po_out * Md), dest_map)
    out_shape = jax.ShapeDtypeStruct((A_max, tz, Po_out * Md), fdt)

    meta = (tz, Md, oys, oxs, tuple(d_props), tuple(d_const_list),
            tuple(src_metas), tuple(out_props), dict(rec.out_ops),
            union, tuple(dest_store.schema.strides.items()))
    kern = functools.partial(_pair_kernel_compact, eqs_list,
                             plan.kernel_obj, plan.domain,
                             plan.radius_scale, meta)
    if interpret is None:
        interpret = jax.default_backend() not in ('tpu', 'axon')
    from jax.experimental.pallas import tpu as pltpu
    n_scratch = Po + (1 if any_union else 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4 + len(inv_srcs), grid=(A_max,),
        in_specs=in_specs, out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((tz, Md), fdt)
                        for _ in range(n_scratch)])
    outp = pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
        **_compiler_kwargs(pltpu))(bi, bj, bz, na_pf, *inv_srcs,
                                   *ins)
    window_ovf = jnp.asarray(False)
    if any_union:
        # blocks beyond na never run _writeback: their planes hold
        # uninitialized garbage/NaN and must be masked out
        act = jnp.arange(A_max, dtype=jnp.int32)[:, None, None] < na
        window_ovf = jnp.max(jnp.where(
            act, outp[:, :, Po * Md:(Po + 1) * Md], 0.0)) > 0.0
        outp = outp[:, :, :Po * Md]

    # ---- fold outputs straight back to flat particle order ----------
    # every active particle's block is dest-active by construction, so
    # its compacted slot exists (unless block_ovf -> step is redone).
    lay = dest_store.layout
    cap = dest_store.flat['x'].shape[0]
    n_slots = C * Md
    s_part = jnp.minimum(lay.particle_to_slot, n_slots - 1)
    has_slot = lay.particle_to_slot < n_slots
    cell_p = s_part // Md
    m_p = s_part % Md
    iz = cell_p % nz
    jy = (cell_p // nz) % ny
    ix = cell_p // (ny * nz)
    a_p = inv_d[(ix * ny + jy) * n_zt + iz // tz] - 1
    ok = has_slot & (a_p >= 0)
    r_p = iz % tz
    # (A_max, tz, Po * Md) lanes are (plane, slot) -> rows of Po per
    # compact slot
    out_rows = jax.lax.optimization_barrier(
        outp.reshape(A_max, tz, Po, Md).transpose(0, 1, 3, 2)
        .reshape(-1))
    row_of = ((jnp.maximum(a_p, 0) * tz + r_p) * Md + m_p)
    vals = out_rows.reshape(A_max * tz * Md, Po)[row_of]  # (cap, Po)
    vals_t = jax.lax.optimization_barrier(vals.T.reshape(-1))
    for po, p in enumerate(out_props):
        col = vals_t[po * cap:(po + 1) * cap]
        if isinstance(p, tuple):
            # strided prop column (delta-SPH gradrho, CRKSPH moment
            # matrices): fold into its column of the (cap, stride)
            # flat array
            base, c = p
            old2 = fview[base]
            fview[base] = old2.at[:, c].set(
                jnp.where(ok, col.astype(old2.dtype), old2[:, c]))
            continue
        old = fview[p]
        fview[p] = jnp.where(ok, col.astype(old.dtype), old)
    return {'block_overflow': block_ovf,
            'window_overflow': window_ovf}
