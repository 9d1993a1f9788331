"""TPU-native nearest-neighbor particle search (NNPS).

The reference ships 11 CPU + 4 GPU neighbor-search structures
(/root/reference/pysph/base/{linked_list,box_sort,spatial_hash,
cell_indexing,z_order,stratified_*,octree*}_nnps.pyx).  On TPU one
production index covers them all (SURVEY.md section 7):

1. **Build** (per source array): bin particles into a uniform grid with
   cell size ``radius_scale * hmax`` (reference nnps_base.pyx:227), flatten
   cell coords, ``argsort`` particles by cell id (XLA bitonic sort), and
   compute per-cell start offsets with one vectorized ``searchsorted``.
   Grid *capacity* is static; the grid's dynamic extent/cell-count adapts
   to the data each build, so domains may move and grow without recompiles.

2. **Query** (per dest/source pair): gather up to ``cell_capacity``
   candidates from the static 9/27-cell stencil, apply the symmetric
   acceptance criterion ``r^2 < max(rs*hi, rs*hj)^2`` (reference
   linked_list_nnps.pyx:188), and compact to a fixed-width ``(N, K)``
   neighbor matrix by sorting candidate indices.  Neighbor lists are
   therefore index-sorted and deterministic — the reference needs a
   ``--sort-gids`` flag for this (nnps_base.pyx:1577); here it is free.

Periodic domains use modular cell arithmetic + minimum-image displacements
instead of ghost particles (see base/domain.py).

Capacity overflows (more than K true neighbors, or more than
``cell_capacity`` particles in a stencil cell) are *detected* and returned
as diagnostics so the host can enlarge capacities and re-jit.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pysph_tpu.config import get_config

INT_SENTINEL = np.int32(2 ** 31 - 1)


class CellIndex(NamedTuple):
    """Sorted uniform-grid index over one particle array."""
    order: jnp.ndarray      # (cap,) particle ids sorted by cell key
    starts: jnp.ndarray     # (ncell_cap + 1,) first sorted position per cell
    origin: jnp.ndarray     # (3,) grid origin
    widths: jnp.ndarray     # (3,) effective cell widths per dim
    dims: jnp.ndarray       # (3,) dynamic number of cells per dim
    max_occupancy: jnp.ndarray  # () max particles in any cell
    ncells_total: jnp.ndarray   # () dynamic total cell count


class NeighborList(NamedTuple):
    idx: jnp.ndarray        # (cap, K) int32 source indices (0 where invalid)
    mask: jnp.ndarray       # (cap, K) bool
    max_count: jnp.ndarray  # () max true neighbor count over particles


def _stencil(dim):
    rng = (-1, 0, 1)
    if dim == 1:
        return [(o, 0, 0) for o in rng]
    if dim == 2:
        return [(a, b, 0) for a in rng for b in rng]
    return [(a, b, c) for a in rng for b in rng for c in rng]


def active_mask(state):
    cap = state['x'].shape[0]
    return jnp.arange(cap, dtype=jnp.int32) < state['n_act']


class NeighborFinder(object):
    """Builds cell indexes and fixed-width neighbor lists.

    Parameters mirror what matters from the reference NNPS family: ``dim``,
    ``radius_scale`` (kernel support scale) and a ``DomainManager``.
    Capacity knobs (``max_neighbors``, ``cell_capacity``, ``ncell_cap``) are
    static shapes; ``grow()`` enlarges them after an overflow.
    """

    def __init__(self, dim, radius_scale, domain=None, max_neighbors=None,
                 cell_capacity=None, ncell_cap=None, chunk=None):
        cfg = get_config()
        self.dim = int(dim)
        self.radius_scale = float(radius_scale)
        self.domain = domain
        if max_neighbors is None:
            max_neighbors = (128 if dim == 1 else cfg.max_neighbors_2d
                             if dim == 2 else cfg.max_neighbors_3d)
        if cell_capacity is None:
            cell_capacity = (128 if dim == 1 else cfg.cell_capacity_2d
                             if dim == 2 else cfg.cell_capacity_3d)
        self.max_neighbors = int(max_neighbors)
        self.cell_capacity = int(cell_capacity)
        self.ncell_cap = ncell_cap  # resolved per build if None
        self.chunk = int(chunk or cfg.nbr_chunk_size)

    def grow(self, neighbors=False, cells=False, factor=2):
        if neighbors:
            self.max_neighbors = int(self.max_neighbors * factor)
        if cells:
            self.cell_capacity = int(self.cell_capacity * factor)

    # ------------------------------------------------------------------
    # Build
    # ------------------------------------------------------------------
    def _resolve_ncell_cap(self, cap):
        if self.ncell_cap is not None:
            return int(self.ncell_cap)
        return max(4 * cap, 1 << 12)

    def _periodic_flags(self):
        if self.domain is None:
            return (False, False, False)
        return self.domain.periodic

    def _grid_geometry(self, pos, active, hmax, ncell_cap):
        """Compute (origin, widths, dims) for the dynamic grid."""
        fdt = pos[0].dtype
        cell0 = self.radius_scale * hmax
        periodic = self._periodic_flags()
        mins, lens = [], []
        dmins = (None if self.domain is None else self.domain.mins)
        dlens = (None if self.domain is None else self.domain.lengths)
        big = jnp.asarray(jnp.finfo(fdt).max, dtype=fdt)
        for d in range(3):
            c = pos[d]
            if d < self.dim:
                if periodic[d]:
                    mins.append(jnp.asarray(dmins[d], dtype=fdt))
                    lens.append(jnp.asarray(dlens[d], dtype=fdt))
                else:
                    lo = jnp.min(jnp.where(active, c, big))
                    hi = jnp.max(jnp.where(active, c, -big))
                    mins.append(lo - 0.5 * cell0)
                    lens.append(jnp.maximum(hi - lo + cell0, cell0))
            else:
                mins.append(jnp.zeros((), dtype=fdt))
                lens.append(cell0)
        mins = jnp.stack(mins)
        lens = jnp.stack(lens)

        def cells_for(cell):
            out = []
            for d in range(3):
                if d >= self.dim:
                    out.append(jnp.ones((), dtype=jnp.int32))
                elif periodic[d]:
                    out.append(jnp.maximum(
                        jnp.floor(lens[d] / cell), 1.0).astype(jnp.int32))
                else:
                    out.append(jnp.maximum(
                        jnp.ceil(lens[d] / cell), 1.0).astype(jnp.int32))
            return jnp.stack(out)

        nc = cells_for(cell0)
        total = jnp.prod(nc.astype(jnp.float64 if fdt == jnp.float64
                                   else jnp.float32))
        budget = jnp.asarray(0.9 * ncell_cap, dtype=total.dtype)
        scale = jnp.maximum(1.0, (total / budget) ** (1.0 / self.dim))
        cell = cell0 * scale.astype(fdt)
        nc = cells_for(cell)
        widths = []
        for d in range(3):
            if d < self.dim and periodic[d]:
                widths.append(lens[d] / nc[d].astype(fdt))
            else:
                widths.append(cell)
        return mins, jnp.stack(widths), nc

    def _cell_coords(self, pos, origin, widths, dims):
        """Integer cell coords, clipped/wrapped into the grid."""
        periodic = self._periodic_flags()
        coords = []
        for d in range(3):
            if d >= self.dim:
                coords.append(jnp.zeros(pos[d].shape, dtype=jnp.int32))
                continue
            c = jnp.floor((pos[d] - origin[d]) / widths[d]).astype(jnp.int32)
            if periodic[d]:
                c = jnp.mod(c, dims[d])
            else:
                c = jnp.clip(c, 0, dims[d] - 1)
            coords.append(c)
        return coords

    @staticmethod
    def _flatten(coords, dims):
        return (coords[0] * dims[1] + coords[1]) * dims[2] + coords[2]

    def build_index(self, state, hmax, ncell_cap=None):
        """Build a CellIndex over one (padded) particle state."""
        cap = state['x'].shape[0]
        ncell_cap = (self._resolve_ncell_cap(cap) if ncell_cap is None
                     else int(ncell_cap))
        pos = (state['x'], state['y'], state['z'])
        active = active_mask(state)
        origin, widths, dims = self._grid_geometry(
            pos, active, hmax, ncell_cap)
        coords = self._cell_coords(pos, origin, widths, dims)
        flat = self._flatten(coords, dims)
        ncells_total = dims[0] * dims[1] * dims[2]
        flat = jnp.clip(flat, 0, ncell_cap - 1)
        keys = jnp.where(active, flat, INT_SENTINEL)
        order = jnp.argsort(keys).astype(jnp.int32)
        sorted_keys = keys[order]
        starts = jnp.searchsorted(
            sorted_keys, jnp.arange(ncell_cap + 1, dtype=sorted_keys.dtype),
            side='left').astype(jnp.int32)
        max_occ = jnp.max(jnp.diff(starts))
        return CellIndex(order=order, starts=starts, origin=origin,
                         widths=widths, dims=dims, max_occupancy=max_occ,
                         ncells_total=ncells_total)

    # ------------------------------------------------------------------
    # Query
    # ------------------------------------------------------------------
    def query(self, index, src_state, dest_state):
        """Return a NeighborList of src particles around each dest particle.

        Implements the symmetric acceptance criterion of the reference
        (linked_list_nnps.pyx:188): r2 < max(rs*hi, rs*hj)^2.
        """
        cap_d = dest_state['x'].shape[0]
        K = self.max_neighbors
        M = self.cell_capacity
        chunk = min(self.chunk, cap_d)
        nchunks = -(-cap_d // chunk)
        pad = nchunks * chunk - cap_d

        def pad1(a):
            return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

        d_x = pad1(dest_state['x'])
        d_y = pad1(dest_state['y'])
        d_z = pad1(dest_state['z'])
        d_h = pad1(dest_state['h'])
        d_active = pad1(active_mask(dest_state))

        s_x, s_y, s_z, s_h = (src_state['x'], src_state['y'],
                              src_state['z'], src_state['h'])
        cap_s = s_x.shape[0]

        stencil = _stencil(self.dim)
        periodic = self._periodic_flags()
        rs = self.radius_scale
        lens = (None if self.domain is None else self.domain.lengths)
        check_dups = any(periodic[:self.dim])

        def one_chunk(args):
            cx, cy, cz, ch, cactive = args
            pos = (cx, cy, cz)
            coords = self._cell_coords(pos, index.origin, index.widths,
                                       index.dims)
            cand_list, valid_list = [], []
            flat_seen = []
            for off in stencil:
                ncoords = []
                cell_ok = jnp.ones(cx.shape, dtype=bool)
                for d in range(3):
                    nc = coords[d] + off[d]
                    if d < self.dim and off[d] != 0:
                        if periodic[d]:
                            nc = jnp.mod(nc, index.dims[d])
                        else:
                            cell_ok = cell_ok & (nc >= 0) & \
                                (nc < index.dims[d])
                            nc = jnp.clip(nc, 0, index.dims[d] - 1)
                    ncoords.append(nc)
                flat = self._flatten(ncoords, index.dims)
                flat = jnp.clip(flat, 0, index.starts.shape[0] - 2)
                if check_dups:
                    for prev in flat_seen:
                        cell_ok = cell_ok & (flat != prev)
                    flat_seen.append(jnp.where(cell_ok, flat, -1 - len(
                        flat_seen)))
                start = index.starts[flat]
                cnt = index.starts[flat + 1] - start
                cnt = jnp.where(cell_ok, jnp.minimum(cnt, M), 0)
                js = jnp.arange(M, dtype=jnp.int32)
                pos_in_sorted = start[:, None] + js[None, :]
                cand_valid = js[None, :] < cnt[:, None]
                cand = index.order[jnp.clip(pos_in_sorted, 0, cap_s - 1)]
                cand_list.append(cand)
                valid_list.append(cand_valid)
            cand = jnp.concatenate(cand_list, axis=1)
            valid = jnp.concatenate(valid_list, axis=1)

            safe = jnp.where(valid, cand, 0)
            dx = cx[:, None] - s_x[safe]
            dy = cy[:, None] - s_y[safe]
            dz = cz[:, None] - s_z[safe]
            if self.domain is not None and self.domain.is_periodic:
                if periodic[0]:
                    dx = dx - lens[0] * jnp.round(dx / lens[0])
                if periodic[1]:
                    dy = dy - lens[1] * jnp.round(dy / lens[1])
                if periodic[2]:
                    dz = dz - lens[2] * jnp.round(dz / lens[2])
            r2 = dx * dx + dy * dy + dz * dz
            hi = rs * ch[:, None]
            hj = rs * s_h[safe]
            sup = jnp.maximum(hi, hj)
            valid = valid & (r2 < sup * sup) & cactive[:, None]

            count = jnp.sum(valid, axis=1).astype(jnp.int32)
            key = jnp.where(valid, cand, INT_SENTINEL)
            key = jnp.sort(key, axis=1)[:, :K]
            mask = key < INT_SENTINEL
            idx = jnp.where(mask, key, 0).astype(jnp.int32)
            return idx, mask, jnp.max(count)

        if nchunks == 1:
            idx, mask, max_count = one_chunk(
                (d_x, d_y, d_z, d_h, d_active))
        else:
            def reshape(a):
                return a.reshape((nchunks, chunk) + a.shape[1:])
            idxs, masks, counts = jax.lax.map(
                one_chunk, (reshape(d_x), reshape(d_y), reshape(d_z),
                            reshape(d_h), reshape(d_active)))
            idx = idxs.reshape(nchunks * chunk, K)
            mask = masks.reshape(nchunks * chunk, K)
            max_count = jnp.max(counts)
        if pad:
            idx = idx[:cap_d]
            mask = mask[:cap_d]
        return NeighborList(idx=idx, mask=mask, max_count=max_count)

    # ------------------------------------------------------------------
    # Orchestration
    # ------------------------------------------------------------------
    def update(self, states, pairs):
        """Build neighbor lists for the given (dest_name, src_name) pairs.

        ``states``: dict name -> device state.  Returns (lists, diag) where
        ``lists[(dest, src)]`` is a NeighborList and diag carries overflow
        indicators (max neighbor count vs K, max cell occupancy vs M).
        """
        fdt = next(iter(states.values()))['x'].dtype
        hmax = jnp.zeros((), dtype=fdt)
        for s in states.values():
            act = active_mask(s)
            hmax = jnp.maximum(hmax, jnp.max(jnp.where(act, s['h'], 0.0)))
        indexes = {}
        lists = {}
        max_count = jnp.zeros((), jnp.int32)
        max_occ = jnp.zeros((), jnp.int32)
        for dest_name, src_name in pairs:
            if src_name not in indexes:
                indexes[src_name] = self.build_index(states[src_name], hmax)
                max_occ = jnp.maximum(
                    max_occ, indexes[src_name].max_occupancy)
            nl = self.query(indexes[src_name], states[src_name],
                            states[dest_name])
            lists[(dest_name, src_name)] = nl
            max_count = jnp.maximum(max_count, nl.max_count)
        diag = {
            'max_neighbors': max_count,
            'max_occupancy': max_occ,
            'neighbor_overflow': max_count > self.max_neighbors,
            'cell_overflow': max_occ > self.cell_capacity,
        }
        return lists, diag


def brute_force_neighbors(dest_state, src_state, radius_scale, domain=None):
    """O(N^2) oracle (replaces DictBoxSort, reference nnps_base.pyx:1325).

    Returns a list of sorted numpy index arrays, one per active dest
    particle.  Host-side; for tests.
    """
    dn = int(dest_state['n_act'])
    sn = int(src_state['n_act'])
    dx = np.asarray(dest_state['x'])[:dn]
    dy = np.asarray(dest_state['y'])[:dn]
    dz = np.asarray(dest_state['z'])[:dn]
    dh = np.asarray(dest_state['h'])[:dn]
    sx = np.asarray(src_state['x'])[:sn]
    sy = np.asarray(src_state['y'])[:sn]
    sz = np.asarray(src_state['z'])[:sn]
    sh = np.asarray(src_state['h'])[:sn]
    out = []
    for i in range(dn):
        ddx = dx[i] - sx
        ddy = dy[i] - sy
        ddz = dz[i] - sz
        if domain is not None and domain.is_periodic:
            L = domain.lengths
            per = domain.periodic
            if per[0]:
                ddx = ddx - L[0] * np.round(ddx / L[0])
            if per[1]:
                ddy = ddy - L[1] * np.round(ddy / L[1])
            if per[2]:
                ddz = ddz - L[2] * np.round(ddz / L[2])
        r2 = ddx ** 2 + ddy ** 2 + ddz ** 2
        sup = np.maximum(radius_scale * dh[i], radius_scale * sh)
        out.append(np.sort(np.where(r2 < sup * sup)[0]))
    return out
