"""Distributed execution: static spatial blocks over a device mesh.

The TPU-native replacement for the reference's MPI + Zoltan stack
(/root/reference/pysph/parallel/parallel_manager.pyx): instead of dynamic
Zoltan cell partitions with ZComm unstructured sends, the domain is split
into a static 1/2/3-D grid of equal blocks; each device owns the
particles in its block with fixed local capacity, and all communication
is ``jax.lax.ppermute`` of fixed-width packed buffers inside
``shard_map``, dimension-ordered (x, then y, then z) so corner/edge
neighbors are reached through two axis-aligned hops:

- **Migration** (analog of ``lb_exchange_data``, parallel_manager.pyx:100):
  particles that crossed into a neighboring block are packed and ring-
  shifted one hop along each axis in turn; a bounded ``lax.while_loop``
  repeats each axis pass until no stray remains (multi-hop — fast
  particles or small blocks), so ownership is exact after every update.
- **Halo exchange** (analog of ``remote_exchange_data``/ghost layers,
  parallel_manager.pyx:159,1159): particles within the interaction radius
  of a block face are copied to the face neighbor, appended after the
  locals and tagged Remote.  Later axes include the halos already
  received from earlier axes, which populates edge/corner ghosts exactly
  like the reference's cell-based halo export.  ``BlockExchange.update``
  refreshes halos before *every* acceleration evaluation, mirroring
  ``parallel_manager.update()`` in the reference integrator hook
  (sph/integrator.py:274-281).
- Periodic axes wrap the ring and shift coordinates by the box length,
  so the per-device problem is plain non-periodic.
- The adaptive dt is combined with ``lax.pmin`` over the whole mesh
  (analog of ``update_time_steps``, parallel_manager.pyx:454).

Capacity overflows (local block fuller than capacity, more migrants/halo
particles than the exchange buffer width, or an inner-grid overflow) are
detected and reported via diag flags; ``DistributedRunner.step_checked``
mirrors the single-chip Solver's recovery: double the overflowed
capacity, re-jit, and redo the step from the saved pre-step state.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pysph_tpu.base.particle_array import ParticleTAGS

INT_MAX = np.int32(2 ** 31 - 1)

#: every diag dict of a distributed step carries these flags
EXCHANGE_DIAG_KEYS = ('exchange_overflow', 'capacity_overflow',
                      'migration_multihop', 'halo_width_overflow',
                      'halo_drift_overflow')


def _select_idx(cond, capacity):
    """Indices of up to ``capacity`` rows where cond holds; returns
    (idx, count, total)."""
    cap = cond.shape[0]
    key = jnp.where(cond, jnp.arange(cap, dtype=jnp.int32), INT_MAX)
    order = jnp.argsort(key)[:capacity]
    valid = key[order] < INT_MAX
    idx = jnp.where(valid, order, 0)
    total = jnp.sum(cond)
    return idx, jnp.sum(valid).astype(jnp.int32), total


def _gather_rows(state, prop_names, idx, count):
    """Pack the ``idx`` rows (first ``count`` valid, rest zeroed)."""
    valid = jnp.arange(idx.shape[0], dtype=jnp.int32) < count
    packed = {}
    for name in prop_names:
        rows = state[name][idx]
        if rows.ndim == 1:
            rows = jnp.where(valid, rows, 0)
        else:
            rows = jnp.where(valid[:, None], rows, 0)
        packed[name] = rows
    return packed


def _select_rows(state, prop_names, cond, capacity):
    """Pack up to ``capacity`` rows where cond holds; returns
    (packed dict, count, overflow_count)."""
    idx, count, total = _select_idx(cond, capacity)
    return _gather_rows(state, prop_names, idx, count), count, total


def _compact(state, prop_names, keep):
    """Reorder so kept rows come first; returns new state with n_act set."""
    cap = keep.shape[0]
    key = jnp.where(keep, jnp.arange(cap, dtype=jnp.int32), INT_MAX)
    order = jnp.argsort(key)
    n = jnp.sum(keep).astype(jnp.int32)
    out = dict(state)
    for name in prop_names:
        out[name] = state[name][order]
    out['n_act'] = n
    # reset tags of the dead slots to Padding
    alive = jnp.arange(cap, dtype=jnp.int32) < n
    out['tag'] = jnp.where(alive, out['tag'], ParticleTAGS.Padding)
    return out


def _insert_rows(state, prop_names, packed, count, at, tag):
    """Write ``count`` packed rows starting at index ``at``."""
    capacity = packed[next(iter(prop_names))].shape[0]
    valid = jnp.arange(capacity, dtype=jnp.int32) < count
    cap = state['x'].shape[0]
    # invalid lanes go out of bounds and are dropped — a clamp to
    # cap-1 would race the last real slot when at+count == cap (XLA
    # leaves duplicate-index scatter winners undefined)
    slots = jnp.where(valid, at + jnp.arange(capacity, dtype=jnp.int32),
                      cap)
    out = dict(state)
    for name in prop_names:
        out[name] = out[name].at[slots].set(packed[name],
                                            mode='drop')
    out['tag'] = out['tag'].at[slots].set(
        jnp.full((capacity,), tag, out['tag'].dtype), mode='drop')
    out['n_act'] = state['n_act'] + count
    overflow = (at + count) > cap
    return out, overflow


def _overwrite_rows(state, prop_names, packed, count, at):
    """Overwrite ``count`` packed rows starting at ``at`` in place —
    the values-only halo refresh (rows were placed there by the
    cache-building full exchange; tags/n_act are already right)."""
    capacity = packed[next(iter(prop_names))].shape[0]
    valid = jnp.arange(capacity, dtype=jnp.int32) < count
    cap = state['x'].shape[0]
    # invalid lanes out of bounds -> dropped (see _insert_rows)
    slots = jnp.where(valid, at + jnp.arange(capacity, dtype=jnp.int32),
                      cap)
    out = dict(state)
    for name in prop_names:
        out[name] = out[name].at[slots].set(packed[name],
                                            mode='drop')
    return out


def _as_tuple(v, n, cast=float):
    if np.isscalar(v) or isinstance(v, str):
        return (cast(v),) * n
    t = tuple(cast(x) for x in v)
    if len(t) != n:
        raise ValueError('expected %d values, got %r' % (n, v))
    return t


class BlockPartition(object):
    """Static grid of equal blocks over 1, 2 or 3 coordinate axes.

    1-D (backward-compatible)::

        BlockPartition(8, 0.0, 2.0, axis='x')

    multi-axis::

        BlockPartition((4, 2), lo=(0.0, 0.0), hi=(2.0, 1.0),
                       axes=('x', 'y'), periodic=(False, True))

    Block (i, j, k) owns ``[lo + i*w, lo + (i+1)*w)`` per axis; the flat
    block index ravels in C order, matching the device-mesh layout of
    ``DistributedRunner``.
    """

    # halo band = halo_factor * rs * hmax.  The slack over the bare
    # support radius must cover one full step of CFL-limited drift:
    # halo membership is snapshotted once per step (update_cached) and
    # only values are replayed between stages (refresh).
    def __init__(self, shape, lo, hi, axis='x', axes=None,
                 periodic=False, halo_factor=1.25,
                 buffer_capacity=None, edges=None):
        if np.isscalar(shape):
            shape = (int(shape),)
        self.shape = tuple(int(s) for s in shape)
        ndim = len(self.shape)
        if axes is None:
            axes = (axis,) if ndim == 1 else ('x', 'y', 'z')[:ndim]
        self.axes = tuple(axes)
        self.los = _as_tuple(lo, ndim)
        self.his = _as_tuple(hi, ndim)
        self.periodics = _as_tuple(periodic, ndim, cast=bool)
        self.halo_factor = float(halo_factor)
        self.widths = tuple((h - l) / s for l, h, s in
                            zip(self.los, self.his, self.shape))
        # particle-weighted split planes (see ``weighted``): per-axis
        # ascending arrays of shape[a] + 1 coordinates.  None = equal
        # widths (edges derived from lo/hi).
        if edges is not None:
            edges = tuple(np.asarray(e, np.float64) for e in edges)
            for a, e in enumerate(edges):
                if e.shape != (self.shape[a] + 1,):
                    raise ValueError(
                        'edges[%d] needs %d values' %
                        (a, self.shape[a] + 1))
                if np.any(np.diff(e) <= 0):
                    raise ValueError('edges must be increasing')
        self.edges = edges
        self.n_blocks = int(np.prod(self.shape))
        self.buffer_capacity = buffer_capacity
        for s, per in zip(self.shape, self.periodics):
            if per and s == 1:
                raise ValueError(
                    'a periodic partition axis needs >= 2 blocks '
                    '(single-block periodicity belongs to the '
                    'DomainManager, not the partition)')

    @classmethod
    def weighted(cls, shape, coords, axes=None, lo=None, hi=None,
                 pad=1e-6, min_frac=0.05, **kw):
        """Particle-weighted static partition: per-axis split planes
        at the coordinate quantiles, so every slab owns ~equal
        particle counts at setup — the static analog of one Zoltan
        RCB pass over particle-weighted cells (reference
        parallel/parallel_manager.pyx:1245,532-613).  The tensor-
        product edge structure (unlike true RCB's nested cuts) keeps
        the block-neighbor topology a plain grid, so the ppermute
        halo/migration sweeps are unchanged.

        ``coords``: list of per-axis numpy coordinate arrays (all
        particles of all arrays concatenated).  ``min_frac`` floors
        each slab at that fraction of the equal-width slab so empty
        regions cannot produce degenerate (thinner-than-halo)
        blocks."""
        if np.isscalar(shape):
            shape = (int(shape),)
        shape = tuple(int(s) for s in shape)
        ndim = len(shape)
        los = []
        his = []
        edges = []
        for a in range(ndim):
            c = np.asarray(coords[a], np.float64)
            l = float(np.min(c)) - pad if lo is None \
                else _as_tuple(lo, ndim)[a]
            h = float(np.max(c)) + pad if hi is None \
                else _as_tuple(hi, ndim)[a]
            s = shape[a]
            q = np.quantile(c, np.linspace(0.0, 1.0, s + 1))
            e = np.clip(q, l, h)
            e[0], e[-1] = l, h
            # enforce monotone + minimum slab width (halo validity)
            wmin = min_frac * (h - l) / s
            for i in range(1, s + 1):
                e[i] = max(e[i], e[i - 1] + wmin)
            e = np.minimum(e, h)
            for i in range(s - 1, -1, -1):
                e[i] = min(e[i], e[i + 1] - wmin)
            e[0], e[-1] = l, h
            los.append(l)
            his.append(h)
            edges.append(e)
        return cls(shape, tuple(los), tuple(his), axes=axes,
                   edges=tuple(edges), **kw)

    # ---- per-block bounds (weighted-aware) ----------------------------
    def edge_array(self, a):
        """(shape[a] + 1,) split planes for axis ``a``."""
        if self.edges is not None:
            return self.edges[a]
        return self.los[a] + self.widths[a] * np.arange(
            self.shape[a] + 1)

    def block_lo_hi(self, a, me):
        """Traced (lo, hi) of block ``me`` along axis ``a``."""
        e = jnp.asarray(self.edge_array(a))
        return e[me], e[me + 1]

    def min_width(self):
        return min(float(np.min(np.diff(self.edge_array(a))))
                   for a in range(self.ndim))

    def imbalance(self, pa_coords):
        """(max/mean, counts) block occupancy over the given
        particle coordinates — the load-balance quality metric."""
        flat = self.block_of_np(pa_coords)
        counts = np.bincount(flat, minlength=self.n_blocks)
        return float(counts.max() / max(counts.mean(), 1e-12)), counts

    # ---- 1-D backward-compat aliases ---------------------------------
    @property
    def axis(self):
        return self.axes[0]

    @property
    def lo(self):
        return self.los[0]

    @property
    def hi(self):
        return self.his[0]

    @property
    def width(self):
        return self.widths[0]

    @property
    def periodic(self):
        return self.periodics[0]

    @property
    def ndim(self):
        return len(self.shape)

    def block_of_axis(self, a, coord):
        if self.periodics[a]:
            span = self.his[a] - self.los[a]
            coord = self.los[a] + jnp.mod(coord - self.los[a], span)
        if self.edges is not None:
            inner = jnp.asarray(self.edges[a][1:-1], coord.dtype)
            return jnp.searchsorted(
                inner, coord, side='right').astype(jnp.int32)
        b = jnp.floor((coord - self.los[a]) /
                      self.widths[a]).astype(jnp.int32)
        if self.periodics[a]:
            return jnp.mod(b, self.shape[a])
        return jnp.clip(b, 0, self.shape[a] - 1)

    def block_of(self, coord):
        """1-D compat: block index along the first axis."""
        return self.block_of_axis(0, coord)

    def block_of_np(self, pa_coords):
        """Flat (C-order) block index per particle from a list of
        numpy coordinate arrays (host-side, for distribute())."""
        flat = np.zeros(pa_coords[0].shape, dtype=np.int64)
        for a in range(self.ndim):
            c = np.asarray(pa_coords[a])
            if self.periodics[a]:
                span = self.his[a] - self.los[a]
                c = self.los[a] + np.mod(c - self.los[a], span)
            if self.edges is not None:
                b = np.searchsorted(self.edges[a][1:-1], c,
                                    side='right').astype(np.int64)
            else:
                b = np.floor((c - self.los[a]) /
                             self.widths[a]).astype(np.int64)
                b = np.clip(b, 0, self.shape[a] - 1)
            flat = flat * self.shape[a] + b
        return flat


class BlockExchange(object):
    """Per-step migration + halo refresh, run inside shard_map.

    The integrator calls ``update(states)`` before each acceleration
    evaluation (the ``parallel_manager.update()`` hook)."""

    def __init__(self, partition, schemas, axis_names=None,
                 radius_scale=2.0, buffer_capacity=256):
        self.partition = partition
        self.schemas = schemas
        if axis_names is None:
            axis_names = tuple('b%d' % a
                               for a in range(partition.ndim))
        elif isinstance(axis_names, str):
            axis_names = (axis_names,)
        self.axis_names = tuple(axis_names)
        self.radius_scale = radius_scale
        self.buffer_capacity = int(partition.buffer_capacity or
                                   buffer_capacity)
        self._diag = {}

    def pop_diag(self):
        d = self._diag
        self._diag = {}
        return d

    def _merge_diag(self, key, value):
        if key in self._diag:
            self._diag[key] = self._diag[key] | value
        else:
            self._diag[key] = value

    def _pmax_all(self, v):
        """Max over the whole mesh (all block axes)."""
        out = v
        for name in self.axis_names:
            out = jax.lax.pmax(out, name)
        return out

    def _perm(self, a, direction):
        n = self.partition.shape[a]
        if direction == 'right':
            pairs = [(i, (i + 1) % n) for i in range(n)]
        else:
            pairs = [(i, (i - 1) % n) for i in range(n)]
        if not self.partition.periodics[a]:
            if direction == 'right':
                pairs = [p for p in pairs if p[1] != 0]
            else:
                pairs = [p for p in pairs if p[0] != 0]
        return pairs

    def _shift_recv(self, packed, a, direction, me):
        """Fix up coordinates of particles that crossed a periodic
        seam: a packed buffer moving right from block n-1 to block 0
        must be shifted by -L (and vice versa)."""
        part = self.partition
        if not part.periodics[a]:
            return packed
        L = part.his[a] - part.los[a]
        coord = part.axes[a]
        n = part.shape[a]
        if direction == 'right':
            # I received from my left neighbor; if I am block 0 the
            # data came from block n-1 across the seam.
            shift = jnp.where(me == 0, -L, 0.0)
        else:
            shift = jnp.where(me == n - 1, L, 0.0)
        out = dict(packed)
        out[coord] = packed[coord] + shift
        return out

    def _send_recv(self, state, prop_names, cond, a, direction):
        """Pack cond-rows, ppermute them one hop along axis ``a``,
        return (packed, count, send_overflowed, send_idx, send_count)."""
        cap_buf = self.buffer_capacity
        idx, scount, total = _select_idx(cond, cap_buf)
        packed = _gather_rows(state, prop_names, idx, scount)
        ovf = total > cap_buf
        perm = self._perm(a, direction)
        rpacked, rcount = jax.lax.ppermute(
            (packed, scount), self.axis_names[a], perm)
        me = jax.lax.axis_index(self.axis_names[a])
        rpacked = self._shift_recv(rpacked, a, direction, me)
        return rpacked, rcount, ovf, idx, scount

    def _replay_halo(self, state, prop_names, a, direction, idx,
                     scount, at):
        """Values-only halo refresh: re-gather the recorded send rows,
        ppermute, overwrite the recorded receive slots (row layout,
        tags, n_act untouched)."""
        packed = _gather_rows(state, prop_names, idx, scount)
        perm = self._perm(a, direction)
        rpacked, rcount = jax.lax.ppermute(
            (packed, scount), self.axis_names[a], perm)
        me = jax.lax.axis_index(self.axis_names[a])
        rpacked = self._shift_recv(rpacked, a, direction, me)
        return _overwrite_rows(state, prop_names, rpacked, rcount, at)

    # ---- migration ---------------------------------------------------
    def _stray_dirs(self, state, a, me):
        """Per-particle signed block distance along axis ``a``."""
        part = self.partition
        cap = state['x'].shape[0]
        act = jnp.arange(cap, dtype=jnp.int32) < state['n_act']
        b = part.block_of_axis(a, state[part.axes[a]])
        n = part.shape[a]
        if part.periodics[a]:
            d = jnp.mod(b - me + n // 2, n) - n // 2
        else:
            d = b - me
        return act, d

    def _migrate_axis(self, state, props, a):
        """One-hop-at-a-time migration along axis ``a`` inside a
        bounded while_loop, so multi-block jumps (fast particles,
        narrow blocks) land correctly instead of being flagged and
        dropped (reference analog: Zoltan_Point_PP_Assign re-homes
        arbitrary strays, parallel_manager.pyx:1290)."""
        part = self.partition
        me = jax.lax.axis_index(self.axis_names[a])
        n = part.shape[a]
        max_hops = n if part.periodics[a] else n - 1
        if max_hops <= 0:
            return state, jnp.asarray(False), jnp.asarray(False)

        def any_stray(state):
            act, d = self._stray_dirs(state, a, me)
            return self._pmax_all(jnp.any(act & (d != 0)))

        def body(carry):
            state, hops, ovf = carry
            act, d = self._stray_dirs(state, a, me)
            go_right = act & (d > 0)
            go_left = act & (d < 0)
            recv_r, cnt_r, ovf_r, _, _ = self._send_recv(
                state, props, go_right, a, 'right')
            recv_l, cnt_l, ovf_l, _, _ = self._send_recv(
                state, props, go_left, a, 'left')
            state = _compact(state, props, act & ~(go_right | go_left))
            state, iovf1 = _insert_rows(state, props, recv_r, cnt_r,
                                        state['n_act'],
                                        ParticleTAGS.Local)
            state, iovf2 = _insert_rows(state, props, recv_l, cnt_l,
                                        state['n_act'],
                                        ParticleTAGS.Local)
            ovf = ovf | ovf_r | ovf_l | iovf1 | iovf2
            return state, hops + 1, ovf

        def cond(carry):
            state, hops, ovf = carry
            return (hops < max_hops) & any_stray(state) & ~ovf

        init = (state, jnp.asarray(0, jnp.int32), jnp.asarray(False))
        state, hops, ovf = jax.lax.while_loop(cond, body, init)
        unresolved = any_stray(state)
        return state, ovf, unresolved

    # ---- the per-eval update ----------------------------------------
    def update(self, states):
        """Full membership update (see ``update_cached``)."""
        return self.update_cached(states)[0]

    def update_cached(self, states):
        """Drop stale halos, migrate strays (all axes, multi-hop),
        rebuild halos (all axes, corners via the dimension-ordered
        sweep).  Pure.

        Returns ``(states, cache)``: the cache records every halo
        export's (send rows, receive slot) so later evaluations in the
        same step can replay it values-only via ``refresh`` —
        membership drifts at most one CFL displacement per step, well
        inside the halo band, so the full drop/migrate/re-export is
        only needed once per step (the reference instead re-runs its
        whole remote exchange per evaluation,
        parallel_manager.pyx update)."""
        part = self.partition
        ndim = part.ndim

        # interaction radius for halo width (global max h)
        fdt = next(iter(states.values()))['x'].dtype
        hmax = jnp.zeros((), dtype=fdt)
        for s in states.values():
            cap = s['x'].shape[0]
            act = jnp.arange(cap, dtype=jnp.int32) < s['n_act']
            hmax = jnp.maximum(hmax, jnp.max(jnp.where(act, s['h'],
                                                       0.0)))
        hmax = self._pmax_all(hmax)
        halo_w = part.halo_factor * self.radius_scale * hmax
        # a halo wider than a block would need next-nearest-neighbor
        # exchange; surface it rather than silently under-resolving
        min_w = part.min_width()
        self._merge_diag('halo_width_overflow', halo_w > min_w)

        out = {}
        cache = {}
        for name, state in states.items():
            props = [p for p in self.schemas[name].props]
            cap = state['x'].shape[0]
            ar = jnp.arange(cap, dtype=jnp.int32)
            act = ar < state['n_act']

            # 1. drop stale halos
            keep = act & (state['tag'] != ParticleTAGS.Remote)
            state = _compact(state, props, keep)

            # 2. migration, dimension-ordered; bounded multi-hop per
            # axis (a diagonal mover reaches its corner block through
            # one x-pass then one y-pass)
            unresolved = jnp.asarray(False)
            for a in range(ndim):
                state, ovf, unres = self._migrate_axis(state, props, a)
                self._merge_diag('capacity_overflow', ovf)
                self._merge_diag('exchange_overflow', ovf)
                unresolved = unresolved | unres
            self._merge_diag('migration_multihop', unresolved)

            # 3. halo export, dimension-ordered: later axes see the
            # halos already inserted by earlier axes, which fills
            # edge/corner ghost regions (two axis-aligned hops)
            replay = []
            for a in range(ndim):
                me = jax.lax.axis_index(self.axis_names[a])
                my_lo, my_hi = part.block_lo_hi(a, me)
                act = jnp.arange(cap, dtype=jnp.int32) < state['n_act']
                c = state[part.axes[a]]
                near_hi = act & (c >= my_hi - halo_w)
                near_lo = act & (c < my_lo + halo_w)
                at_r = state['n_act']
                halo_r, hcnt_r, ovf_r, idx_r, scnt_r = self._send_recv(
                    state, props, near_hi, a, 'right')
                state, iovf1 = _insert_rows(state, props, halo_r,
                                            hcnt_r, at_r,
                                            ParticleTAGS.Remote)
                at_l = state['n_act']
                halo_l, hcnt_l, ovf_l, idx_l, scnt_l = self._send_recv(
                    state, props, near_lo, a, 'left')
                state, iovf2 = _insert_rows(state, props, halo_l,
                                            hcnt_l, at_l,
                                            ParticleTAGS.Remote)
                replay.append((idx_r, scnt_r, at_r))
                replay.append((idx_l, scnt_l, at_l))
                self._merge_diag('exchange_overflow', ovf_r | ovf_l)
                self._merge_diag('capacity_overflow', iovf1 | iovf2)
            out[name] = state
            # position snapshot: ``refresh`` verifies per-stage drift
            # stays inside the halo slack band (see below)
            cache[name] = {
                'replay': replay,
                'pos0': tuple(state[ax] for ax in part.axes),
            }
        # the values-only replay is only exact while every particle
        # stays within (halo_factor-1)*rs*hmax of its snapshot
        # position: a particle just outside the band at step start
        # that drifts into range mid-step would otherwise be silently
        # missing from neighbor forces (the reference re-runs the full
        # remote exchange before every evaluation instead,
        # parallel_manager.pyx:512)
        cache['_band'] = halo_w - self.radius_scale * hmax
        return out, cache

    def refresh(self, states, cache):
        """Values-only halo refresh between evaluations of one step:
        replay the exports ``update_cached`` recorded (same rows, same
        slots, fresh values) without touching membership.  Row layout
        and n_act are invariant, so a binning carry built after the
        full update stays valid for the whole step."""
        part = self.partition
        # tag stays Remote on the receive slots (the sent rows carry
        # their owner's Local tag; replaying it would turn halos into
        # phantom locals that survive the next step's halo drop)
        props_of = {name: [p for p in self.schemas[name].props
                           if p != 'tag']
                    for name in states}
        out = {}
        band = cache['_band']
        drift_ovf = jnp.asarray(False)
        for name, state in states.items():
            props = props_of[name]
            replay = cache[name]['replay']
            # drift guard: flag when any active particle moved further
            # from its update_cached snapshot than the slack band —
            # halo membership would then be stale and the runner must
            # widen halo_factor and redo (step_checked)
            pos0 = cache[name]['pos0']
            cap = state['x'].shape[0]
            act = jnp.arange(cap, dtype=jnp.int32) < state['n_act']
            for a, ax in enumerate(part.axes):
                d = jnp.abs(state[ax] - pos0[a])
                if part.periodics[a]:
                    L = part.his[a] - part.los[a]
                    d = jnp.minimum(d, L - d)
                drift_ovf = drift_ovf | jnp.any(
                    jnp.where(act, d, 0.0) > band)
            for i in range(part.ndim):
                idx_r, scnt_r, at_r = replay[2 * i]
                idx_l, scnt_l, at_l = replay[2 * i + 1]
                state = self._replay_halo(state, props, i, 'right',
                                          idx_r, scnt_r, at_r)
                state = self._replay_halo(state, props, i, 'left',
                                          idx_l, scnt_l, at_l)
            out[name] = state
        self._merge_diag('halo_drift_overflow',
                         self._pmax_all(drift_ovf))
        return out


class DistributedRunner(object):
    """Runs an Integrator over a device mesh with block decomposition.

    Usage::

        runner = DistributedRunner(integrator, partition, devices,
                                   local_capacity=4096)
        gstates = runner.distribute(particle_arrays)
        gstates, dt_next, diag = runner.step(gstates, t, dt)
        # or, with automatic overflow grow+redo (the Solver path):
        gstates, dt_next, diag = runner.step_checked(gstates, t, dt)
        runner.collect(gstates, particle_arrays)
    """

    MAX_GROWS = 6

    def __init__(self, integrator, partition, devices=None,
                 local_capacity=None, buffer_capacity=256, cfl=0.3,
                 adaptive_timestep=False, rebalance_freq=0):
        self.integrator = integrator
        self.partition = partition
        # re-split the weighted partition every N step_checked calls
        # (0 = never).  The cheap static analog of the reference's
        # lb_freq Zoltan repartition (parallel_manager.pyx:532,615):
        # for a dam break the fluid mass crosses blocks over the run,
        # so a setup-time split drifts out of balance.
        self.rebalance_freq = int(rebalance_freq)
        self._steps_done = 0
        self._pas = None
        devices = devices if devices is not None else \
            jax.devices()[:partition.n_blocks]
        if len(devices) != partition.n_blocks:
            raise ValueError('need %d devices, got %d' %
                             (partition.n_blocks, len(devices)))
        self.axis_names = tuple('b%d' % a
                                for a in range(partition.ndim))
        self.mesh = Mesh(
            np.array(devices).reshape(partition.shape),
            self.axis_names)
        self.local_capacity = local_capacity
        self.buffer_capacity = buffer_capacity
        self.cfl = cfl
        self.adaptive_timestep = adaptive_timestep
        kernel = integrator.acceleration_evals[0].kernel
        self.exchange = BlockExchange(
            partition, integrator.schemas, axis_names=self.axis_names,
            radius_scale=kernel.radius_scale,
            buffer_capacity=buffer_capacity)
        self._step = None
        self._step_c = None
        self._carry = None

    def _invalidate(self):
        """Static sizes changed: drop compiled steps and the carry."""
        self._step = None
        self._step_c = None
        self._carry = None

    # -- host-side data movement ---------------------------------------
    def distribute(self, particle_arrays, local_capacity=None):
        """Partition host particle arrays into per-block padded shards."""
        part = self.partition
        nb = part.n_blocks
        self._pas = list(particle_arrays)
        if local_capacity is not None:
            self.local_capacity = local_capacity
        # the runtime halo band in update_cached uses hmax reduced
        # over ALL arrays — size the import allowance the same way,
        # or a small-h array sharing a domain with a large-h array
        # gets an undersized capacity and churns through overflow
        # redo/recompile cycles
        hmax_all = 0.0
        for pa in particle_arrays:
            h_arr = np.asarray(pa.get('h'))
            if h_arr.size:
                hmax_all = max(hmax_all, float(h_arr.max()))
        gstates = {}
        for pa in particle_arrays:
            coords = [np.asarray(pa.get(ax)) for ax in part.axes]
            b = part.block_of_np(coords)
            counts = np.bincount(b, minlength=nb)
            cap = self.local_capacity
            if cap is None:
                # locals + halo-import allowance: each axis imports a
                # band of halo_w from both faces, so the fullest block
                # holds up to counts.max() * prod(1 + 2*halo_w/w_a)
                # rows (uniform-density estimate; 1.3 safety + redo
                # path handles the rest)
                halo_w = (part.halo_factor *
                          self.exchange.radius_scale * hmax_all)
                factor = 1.0
                for a in range(part.ndim):
                    if part.edges is not None:
                        w_a = float(np.min(np.diff(part.edges[a])))
                    else:
                        w_a = part.widths[a]
                    factor *= 1.0 + min(1.0, 2.0 * halo_w / w_a)
                cap = max(128, int(-(-int(counts.max() * factor * 1.3
                                          + 32) // 128) * 128))
            shards = []
            for blk in range(nb):
                sub = pa.extract_particles(np.where(b == blk)[0])
                state, _ = sub.to_device(capacity=cap)
                shards.append(state)
            # stack shards into global arrays
            gstate = {}
            for key in shards[0]:
                if key == 'n_act':
                    gstate['n_act'] = jnp.stack(
                        [s['n_act'] for s in shards])
                else:
                    gstate[key] = jnp.concatenate(
                        [s[key] for s in shards], axis=0)
            gstates[pa.name] = gstate
        return self._device_put(gstates)

    def _spec(self, gstates):
        blocks = P(self.axis_names if len(self.axis_names) > 1
                   else self.axis_names[0])
        specs = {}
        for name, gstate in gstates.items():
            sp = {}
            consts = set(self.integrator.schemas[name].consts)
            for key, arr in gstate.items():
                if key == 'n_act':
                    sp[key] = blocks
                elif key in consts:
                    sp[key] = P()  # replicated
                else:
                    sp[key] = blocks
            specs[name] = sp
        return specs

    def _device_put(self, gstates):
        specs = self._spec(gstates)
        out = {}
        for name, gstate in gstates.items():
            out[name] = {
                k: jax.device_put(v, NamedSharding(self.mesh,
                                                   specs[name][k]))
                for k, v in gstate.items()}
        return out

    def collect(self, gstates, particle_arrays):
        """Gather owned (tag==Local) particles back into the host arrays."""
        part = self.partition
        nb = part.n_blocks
        for pa in particle_arrays:
            gstate = jax.tree_util.tree_map(np.asarray, gstates[pa.name])
            cap = gstate['x'].shape[0] // nb
            rows = {name: [] for name in pa.properties}
            consts = set(pa.constants.keys())
            for blk in range(nb):
                n = int(gstate['n_act'][blk])
                sl = slice(blk * cap, blk * cap + n)
                owned = gstate['tag'][sl] == ParticleTAGS.Local
                for name in pa.properties:
                    arr = gstate[name][sl][owned]
                    rows[name].append(arr)
            total = sum(len(r) for r in rows['x'])
            cur = pa.get_number_of_particles()
            if total != cur:
                if total > cur:
                    pa.extend(total - cur)
                else:
                    pa.remove_particles(np.arange(total, cur))
            for name in pa.properties:
                data = np.concatenate(rows[name])
                s = pa.stride.get(name, 1)
                pa.properties[name][:] = data.reshape(-1) if s > 1 \
                    else data
            for cname in consts:
                pa.constants[cname] = np.asarray(gstate[cname])
            pa._update_num_real()

    # -- the jitted distributed step -----------------------------------
    def make_step(self, gstates, with_carry=False):
        from jax import shard_map
        integrator = self.integrator
        exchange = self.exchange
        specs = self._spec(gstates)
        blocks = P(self.axis_names if len(self.axis_names) > 1
                   else self.axis_names[0])
        in_specs = ({n: specs[n] for n in gstates}, P(), P())
        if with_carry:
            # the binning carry rides the mesh like the states: every
            # leaf gains a leading block axis inside local_step (a
            # pytree-prefix spec covers the whole subtree)
            in_specs = in_specs + (blocks,)
        diag_spec = {
            'cell_overflow': P(), 'extent_overflow': P(),
            'block_overflow': P(), 'window_overflow': P(),
            'mirror_overflow': P(), 'rebinned': P(),
        }
        diag_spec.update({k: P() for k in EXCHANGE_DIAG_KEYS})
        out_specs = ({n: specs[n] for n in gstates}, P(), diag_spec,
                     blocks)

        def local_step(states, t, dt, carry_blob=None):
            # unwrap the per-shard (1,) n_act to a scalar
            local = {}
            for name, s in states.items():
                s = dict(s)
                s['n_act'] = s['n_act'][0]
                local[name] = s
            nnps_carry = None
            if carry_blob is not None:
                nnps_carry = jax.tree_util.tree_map(
                    lambda l: l[0], carry_blob)
            integrator.parallel_manager = exchange
            new_states, diag, carry = integrator.step(
                local, t, dt, nnps_carry=nnps_carry)
            carry_blob_out = jax.tree_util.tree_map(
                lambda l: l[None], carry)
            if self.adaptive_timestep:
                dt_next = integrator.compute_time_step(
                    new_states, dt, self.cfl)
                for name in self.axis_names:
                    dt_next = jax.lax.pmin(dt_next, name)
            else:
                dt_next = dt
            ex_diag = exchange.pop_diag()
            diag = dict(diag)
            for k in EXCHANGE_DIAG_KEYS:
                diag[k] = ex_diag.get(k, jnp.asarray(False))
            # global-reduce the diag flags
            for k, v in diag.items():
                r = v.astype(jnp.int32) if v.dtype == jnp.bool_ else v
                for name in self.axis_names:
                    r = jax.lax.pmax(r, name)
                diag[k] = r.astype(bool) if v.dtype == jnp.bool_ else r
            out = {}
            for name, s in new_states.items():
                s = dict(s)
                s['n_act'] = s['n_act'][None]
                out[name] = s
            return out, dt_next, diag, carry_blob_out

        if with_carry:
            def entry(gs, t, dt, carry):
                return local_step(gs, t, dt, carry)
        else:
            def entry(gs, t, dt):
                return local_step(gs, t, dt)
        fn = shard_map(entry, mesh=self.mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
        return jax.jit(fn)

    def step(self, gstates, t, dt):
        """One distributed step; threads the binning carry across
        calls Verlet-style (rebinned per-block only when the exchange
        reshuffled that block's rows or something moved past the slack
        margin; ``diag['rebinned']`` reports whether any block did)."""
        t, dt = jnp.asarray(t), jnp.asarray(dt)
        if self._carry is None:
            if self._step is None:
                self._step = self.make_step(gstates, with_carry=False)
            gstates, dt_next, diag, self._carry = \
                self._step(gstates, t, dt)
        else:
            if self._step_c is None:
                self._step_c = self.make_step(gstates, with_carry=True)
            gstates, dt_next, diag, self._carry = \
                self._step_c(gstates, t, dt, self._carry)
        return gstates, dt_next, diag

    # -- overflow management (mirrors Solver._handle_overflow) ---------
    def _grow_local_capacity(self, gstates, factor=2):
        """Pad every per-block shard to factor x capacity (host path —
        overflows are rare; clarity over speed)."""
        nb = self.partition.n_blocks
        out = {}
        for name, gstate in gstates.items():
            consts = set(self.integrator.schemas[name].consts)
            g = {}
            for key, arr in gstate.items():
                if key == 'n_act' or key in consts:
                    g[key] = arr
                    continue
                host = np.asarray(arr)
                cap = host.shape[0] // nb
                new_cap = cap * factor
                shape = (nb, new_cap) + host.shape[1:]
                grown = np.zeros(shape, host.dtype)
                grown[:, :cap] = host.reshape((nb, cap) +
                                              host.shape[1:])
                if key == 'tag':
                    grown[:, cap:] = ParticleTAGS.Padding
                g[key] = jnp.asarray(
                    grown.reshape((nb * new_cap,) + host.shape[2:]))
            out[name] = g
        self.local_capacity = None  # sized by the arrays now
        return self._device_put(out)

    def imbalance(self, gstates):
        """(max/mean, counts) Local-particle occupancy over blocks —
        the load-balance quality metric (host fetch)."""
        nb = self.partition.n_blocks
        counts = np.zeros(nb, np.int64)
        for name, gstate in gstates.items():
            tags = np.asarray(gstate['tag'])
            n_act = np.asarray(gstate['n_act'])
            cap = tags.shape[0] // nb
            for blk in range(nb):
                sl = tags[blk * cap:blk * cap + int(n_act[blk])]
                counts[blk] += int(np.sum(sl == ParticleTAGS.Local))
        return float(counts.max() / max(counts.mean(), 1e-12)), counts

    def rebalance(self, gstates):
        """Re-split the partition planes at the current particle
        quantiles and redistribute — the cheap static analog of the
        reference's periodic Zoltan repartition
        (parallel_manager.pyx:532 update_partition every lb_freq
        steps).  Host-side (runs at output cadence, not per step);
        only meaningful for weighted partitions but valid for any.

        Returns the new gstates."""
        part = self.partition
        self.collect(gstates, self._pas)
        coords = [np.concatenate([np.asarray(pa.get(ax))
                                  for pa in self._pas])
                  for ax in part.axes]
        new = BlockPartition.weighted(
            part.shape, coords, axes=part.axes,
            lo=part.los, hi=part.his, periodic=part.periodics,
            halo_factor=part.halo_factor,
            buffer_capacity=part.buffer_capacity)
        self.partition = new
        self.exchange.partition = new
        self._invalidate()
        self.local_capacity = None   # re-estimate for the new split
        return self.distribute(self._pas)

    def step_checked(self, gstates, t, dt):
        """``step`` + the Solver's overflow recovery: on any overflow
        flag, grow the corresponding static capacity, re-jit, and redo
        the step from the (unmodified) pre-step state.  With
        ``rebalance_freq`` set, periodically re-splits the partition
        at the current particle quantiles first."""
        if (self.rebalance_freq > 0 and self._steps_done > 0 and
                self._steps_done % self.rebalance_freq == 0 and
                self._pas is not None):
            gstates = self.rebalance(gstates)
        self._steps_done += 1
        for attempt in range(self.MAX_GROWS + 1):
            new_gstates, dt_next, diag = self.step(gstates, t, dt)
            flags = {k: bool(v) for k, v in diag.items()
                     if getattr(v, 'dtype', None) == jnp.bool_
                     or isinstance(v, (bool, np.bool_))}
            grid_ovf = (flags.get('cell_overflow', False) or
                        flags.get('extent_overflow', False) or
                        flags.get('block_overflow', False) or
                        flags.get('window_overflow', False))
            buf_ovf = flags.get('exchange_overflow', False)
            cap_ovf = flags.get('capacity_overflow', False)
            drift_ovf = flags.get('halo_drift_overflow', False)
            if not (grid_ovf or buf_ovf or cap_ovf or drift_ovf):
                return new_gstates, dt_next, diag
            if attempt == self.MAX_GROWS:
                raise RuntimeError(
                    'distributed overflow persists after %d grows: %s'
                    % (self.MAX_GROWS, flags))
            if drift_ovf:
                # per-stage drift escaped the halo slack band: widen
                # it (doubling the slack) and redo so no interaction
                # is silently dropped
                part = self.partition
                part.halo_factor = 1.0 + 2.0 * (part.halo_factor - 1.0)
                self._invalidate()
            if grid_ovf:
                spec = self.integrator.acceleration_evals[0].grid_spec
                spec = spec.grow(
                    cells=flags.get('cell_overflow', False),
                    extent=flags.get('extent_overflow', False),
                    blocks=flags.get('block_overflow', False),
                    windows=flags.get('window_overflow', False))
                self.integrator.set_nnps(spec)
                self._invalidate()
            if buf_ovf:
                self.exchange.buffer_capacity *= 2
                self.partition.buffer_capacity = \
                    self.exchange.buffer_capacity
                self._invalidate()
            if cap_ovf:
                gstates = self._grow_local_capacity(gstates)
                self._invalidate()
        raise AssertionError('unreachable')
