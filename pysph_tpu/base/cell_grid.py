"""Dense cell-grid particle layout — the TPU-native neighbor structure.

Why: explicit (N, K) neighbor lists make every source access an (N, K)
gather, and XLA:TPU lowers such gathers to near-scalar loads (measured
~40x slower than dense vector ops at equal volume).  Instead, particles
are laid out into a dense grid of cells of size ``radius_scale * hmax``
with a static per-cell capacity M (the TPU analog of the reference's
LinkedListNNPS bins, /root/reference/pysph/base/linked_list_nnps.pyx).
The 9/27-cell stencil is then formed with static ``jnp.roll``s of the
grid — pure, perfectly-vectorized data movement with **zero gathers** on
the pair path: equations evaluate dense (cells, M, S*M) masked pair
blocks that XLA fuses into the final per-particle reductions.

Layout conversion (flat particle order <-> grid slots) costs one N-sized
permutation gather per property per direction — negligible.

Static capacities (grid dims, M) are jit constants; actual occupancy is
dynamic.  Overflows (cell fuller than M, or particles outside the static
grid extent) are detected and reported so the host can grow + re-jit.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _stencil_offsets(dim, dims, periodic):
    """Per-axis stencil offsets.  On periodic axes narrower than 3 cells
    the wrap would visit the same cell twice, so the offset list shrinks
    ((-1, 0) for 2 cells, (0,) for 1); non-periodic axes keep (-1, 0, 1)
    and rely on the edge-validity mask."""
    per_axis = []
    for d in range(3):
        if d >= dim or dims[d] == 1:
            per_axis.append((0,))
        elif periodic[d] and dims[d] == 2:
            per_axis.append((-1, 0))
        else:
            per_axis.append((-1, 0, 1))
    return [(a, b, c) for a in per_axis[0] for b in per_axis[1]
            for c in per_axis[2]]


class GridSpec(object):
    """Static geometry/capacity of the cell grid.

    Parameters
    ----------
    dim : problem dimensionality
    radius_scale : kernel support scale (sets the cell size)
    dims : static cell counts per axis (tuple of 3, trailing ones for
        unused axes)
    cell_capacity : max particles per cell (M)
    domain : optional DomainManager for periodicity (periodic axes use a
        fixed cell width L/G so the stencil roll wraps exactly)
    """

    def __init__(self, dim, radius_scale, dims, cell_capacity,
                 domain=None, cell_slack=1.1, capacities=None,
                 block_fracs=None, window_caps=None, h_cell=None,
                 h_split=None, fine=None, pop_capacities=None):
        self.dim = int(dim)
        self.radius_scale = float(radius_scale)
        # Cells are slightly larger than the support radius so a binning
        # built at step start stays valid for every evaluation within the
        # step (particles move << h per step under CFL).
        self.cell_slack = float(cell_slack)
        dims = tuple(int(d) for d in dims)
        while len(dims) < 3:
            dims = dims + (1,)
        self.dims = dims
        self.cell_capacity = int(cell_capacity)
        # Per-array capacities: sparse arrays (thin walls, small
        # obstacles) get a much smaller M than the bulk fluid, which
        # shrinks every pair block they participate in.
        self.capacities = {k: int(v)
                           for k, v in (capacities or {}).items()}
        # Per-array active-block fraction caps for the sparse pallas
        # dispatch (fraction of (x, y, z-tile) blocks that may contain
        # particles of that array; 1.0 = dense).  Overflow at runtime
        # is surfaced as diag['block_overflow'] -> solver grows+re-jits.
        self.block_fracs = {k: float(v)
                            for k, v in (block_fracs or {}).items()}
        # Per-array union-window capacities for the pallas in-kernel
        # neighbor compaction (max true candidates of one dest cell's
        # stencil window after distance pruning, rounded up to a lane
        # multiple).  None -> geometric default chosen by the engine;
        # runtime overflow is surfaced as diag['window_overflow'] ->
        # solver grows+re-jits, mirroring block_fracs.
        self.window_caps = {k: int(v)
                           for k, v in (window_caps or {}).items()}
        # Per-pair K-cascade sub-levels for the resident kernel's
        # count-gated physics (chunks whose max survivor count fits a
        # sub-level run the pair physics on that many lanes only).
        # Populated by ops/calibrate.py from the measured count
        # distribution; levels >= the pair's cap are ignored.
        self.window_levels = {}
        # Stratified variable-h support (reference capability:
        # stratified_sfc_nnps.pyx:39, z_order_nnps.pyx:579).  When the
        # h range within the arrays is wide, binning everything at
        # global hmax wastes ~(hmax/h)^dim candidates per fine dest.
        # ``h_split`` splits the population: particles with
        # h <= h_split are FINE and also live on the ``fine`` sub-grid
        # (cells sized by h_split instead of hmax); pair phases
        # decompose into dest_all<-src_coarse (coarse grid),
        # dest_coarse<-src_fine (coarse grid) and fine<-fine (fine
        # grid) — each pair covered exactly once under the symmetric
        # max(hi, hj) support criterion.  ``pop_capacities`` holds the
        # coarse-grid cell capacities of the sub-populations, keyed
        # ('c'|'fc', array_name).
        self.h_split = None if h_split is None else float(h_split)
        self.fine = fine
        self.pop_capacities = {k: int(v) for k, v in
                               (pop_capacities or {}).items()}
        # static cell size override: the fine grid's cells derive from
        # the static h_split, not the dynamic population hmax
        self.h_cell = None if h_cell is None else float(h_cell)
        self.domain = domain
        self.n_cells = dims[0] * dims[1] * dims[2]
        self.n_slots = self.n_cells * self.cell_capacity
        self.offsets = _stencil_offsets(self.dim, self.dims,
                                        self.periodic)

    def capacity_for(self, name):
        return self.capacities.get(name, self.cell_capacity)

    def block_frac_for(self, name):
        return self.block_fracs.get(name, 1.0)

    def window_cap_for(self, name):
        """Union-window capacity override for ``name`` (0 = use the
        engine's geometric default)."""
        return self.window_caps.get(name, 0)

    @property
    def stratified(self):
        return self.h_split is not None

    def pop_capacity_for(self, level, name):
        """Coarse-grid capacity of the 'c' (coarse) or 'fc'
        (fine-on-coarse) sub-population of ``name``."""
        return self.pop_capacities.get(
            (level, name), self.capacity_for(name))

    @property
    def periodic(self):
        if self.domain is None:
            return (False, False, False)
        return self.domain.periodic

    @staticmethod
    def _round_cap(occ, capacity_slack):
        """Round a measured max occupancy up to a Mosaic-friendly
        capacity (multiple of 8 when the headroom allows, else 4)."""
        m4 = max(4, int(-(-int(occ * capacity_slack) // 4) * 4))
        if m4 % 8:
            down = (m4 // 8) * 8
            if down >= 8 and down >= occ * 1.15:
                m4 = down
            else:
                m4 = -(-m4 // 8) * 8
        return m4

    @classmethod
    def from_particles(cls, particle_arrays, dim, radius_scale,
                       domain=None, cell_capacity=None, pad=0.03,
                       capacity_slack=1.3, cell_slack=1.1,
                       stratify='auto', stratify_ratio=3.0):
        """Size the static grid from the initial particle distribution.

        ``pad`` adds headroom on non-periodic axes for domain growth;
        ``cell_capacity`` defaults to the measured max cell occupancy
        times ``capacity_slack``.  Overflows at runtime are detected and
        the Solver grows + re-jits.

        ``cell_slack`` scales the runtime cells above the kernel
        support so the binning stays reusable within a step (Verlet
        margin).  Capacity M is deliberately measured at the
        UNSLACKED cell size: runtime cells hold up to cell_slack^3
        more particles than measured, but real occupancy rarely
        reaches the worst case and ``capacity_slack`` plus the
        overflow-grow-redo path absorb it.  This optimistic M keeps
        the pair-block candidate volume (~ 27 * M per dest slot)
        ~cell_slack^3 smaller — measured faster than a consistently
        provisioned M at both bench scales."""
        hmax = 0.0
        los = np.full(3, np.inf)
        his = np.full(3, -np.inf)
        coords = []
        for pa in particle_arrays:
            n = pa.get_number_of_particles()
            if n == 0:
                continue
            hmax = max(hmax, float(np.max(pa.h)))
            xyz = np.stack([np.asarray(pa.x), np.asarray(pa.y),
                            np.asarray(pa.z)])
            coords.append(xyz)
            los = np.minimum(los, xyz.min(axis=1))
            his = np.maximum(his, xyz.max(axis=1))
        if hmax <= 0.0:
            raise ValueError('cannot size a grid: no particles or h==0')
        # occupancy/activity measured at the unslacked support cell
        # (see docstring); dims sized for the larger runtime cell
        cell = radius_scale * hmax
        cell_run = cell_slack * radius_scale * hmax
        per = (domain.periodic if domain is not None
               else (False, False, False))
        if domain is not None and getattr(domain, 'is_mirror', False):
            # mirror-image ghosts live in a band outside the domain
            # faces; size the grid to hold them from the start
            band = domain.n_layers * cell_run
            for d, flag in enumerate((domain.mirror_in_x,
                                      domain.mirror_in_y,
                                      domain.mirror_in_z)):
                if flag and d < dim:
                    los[d] -= band
                    his[d] += band
        dims = []
        for d in range(3):
            if d >= dim:
                dims.append(1)
            elif per[d]:
                L = domain.lengths[d]
                dims.append(max(int(np.floor(L / cell_run)), 1))
            else:
                extent = max(his[d] - los[d], cell_run)
                dims.append(int(np.ceil(
                    extent * (1 + 2 * pad) / cell_run)) + 3)
        names = [pa.name for pa in particle_arrays
                 if pa.get_number_of_particles() > 0]

        def cell_ids(xyz, width, shift, clip_dims):
            cs = []
            for d in range(3):
                if d >= dim:
                    cs.append(np.zeros(xyz.shape[1], np.int64))
                else:
                    ci = np.floor((xyz[d] - los[d] + shift[d])
                                  / width).astype(np.int64)
                    cs.append(np.clip(ci, 0,
                                      clip_dims[d] - 1))
            return cs

        def measure(xyz, cell_m, dims_m, dims_run, cell_r):
            """Worst cell occupancy at the unslacked ``cell_m``
            measurement grid plus active-(x, y, z-tile)-block fraction
            on the runtime grid, over half-cell-shifted alignments
            (the runtime origin is dynamic)."""
            occ = 0
            frac = 0.0
            if xyz.shape[1] == 0:
                return 0, 0.0
            for k in range(2 ** dim):
                shift = np.array([0.5 * cell_m * ((k >> d) & 1)
                                  for d in range(3)])
                cs = cell_ids(xyz, cell_m, shift, dims_m)
                flat = ((cs[0] * dims_m[1] + cs[1]) *
                        dims_m[2] + cs[2])
                occ = max(occ, int(np.bincount(flat).max()))
                # tz=8 matches the usual kernel tile; the engine's
                # 1D/2D axis swap makes the middle axis the tiled one
                # when nz == 1
                cr = cell_ids(xyz, cell_r,
                              shift * (cell_r / cell_m), dims_run)
                # the engine's z-tile height depends on VMEM sizing
                # (pallas_engine tz = 8..nz); the active fraction can
                # differ a lot between granularities (e.g. a box FLOOR
                # makes every full-height pencil active while half the
                # tz=8 tiles stay empty) — measure both extremes and
                # keep the worst
                z_ax = 1 if dims_run[2] == 1 else 2
                for tz in {8, max(dims_run[z_ax], 1)}:
                    if dims_run[2] == 1:
                        blk = cr[0] * (-(-dims_run[1] // tz)) + \
                            cr[1] // tz
                        n_blk = dims_run[0] * -(-dims_run[1] // tz)
                    else:
                        nzt = -(-dims_run[2] // tz)
                        blk = (cr[0] * dims_run[1] + cr[1]) * nzt + \
                            cr[2] // tz
                        n_blk = dims_run[0] * dims_run[1] * nzt
                    frac = max(frac,
                               len(np.unique(blk)) / float(n_blk))
            return occ, frac

        capacities = {}
        dims_meas = [max(1, int(np.ceil(
            max(his[d] - los[d], cell) / cell)) + 1)
            if d < dim else 1 for d in range(3)]
        if cell_capacity is None:
            # Measure the worst initial cell occupancy per array.
            # Capacity M is deliberately measured at the UNSLACKED
            # cell (see docstring); rounded to a Mosaic-friendly
            # multiple (_round_cap).
            block_fracs = {}
            for name, xyz in zip(names, coords):
                occ, frac = measure(xyz, cell, dims_meas, dims,
                                    cell_run)
                capacities[name] = cls._round_cap(occ, capacity_slack)
                # moderate slack: geometry spreads over time, but an
                # overflow just doubles the cap and re-jits (amortized
                # over production-length runs)
                block_fracs[name] = min(1.0, 1.6 * frac + 0.02)
            cell_capacity = max(capacities.values())
        else:
            block_fracs = None

        # -- stratified variable-h decision (reference capability:
        # base/stratified_sfc_nnps.pyx:39, z_order_nnps.pyx:579) ----
        h_split = None
        fine = None
        pop_caps = {}
        hs = [np.asarray(pa.h)[:pa.get_number_of_particles()]
              for pa in particle_arrays
              if pa.get_number_of_particles() > 0]
        hpos = np.concatenate([h[h > 0] for h in hs]) if hs else \
            np.zeros(0)
        hmin = float(hpos.min()) if hpos.size else hmax
        if (stratify in ('auto', True) and block_fracs is not None
                and hmin > 0 and hmax / hmin >= stratify_ratio):
            h_split = float(np.sqrt(hmax * hmin))
            cell_fs = radius_scale * h_split
            cell_fr = cell_slack * cell_fs
            fdims = []
            for d in range(3):
                if d >= dim:
                    fdims.append(1)
                elif per[d]:
                    fdims.append(max(int(np.floor(
                        domain.lengths[d] / cell_fr)), 1))
                else:
                    extent = max(his[d] - los[d], cell_fr)
                    fdims.append(int(np.ceil(
                        extent * (1 + 2 * pad) / cell_fr)) + 3)
            n_total = sum(xyz.shape[1] for xyz in coords)
            if int(np.prod(fdims, dtype=np.int64)) > \
                    max(2_000_000, 64 * n_total):
                # a fine grid this large would dominate memory; stay
                # single-level (the overflow paths remain correct,
                # just slower for the wide-h population)
                h_split = None
            else:
                fdims_meas = [max(1, int(np.ceil(
                    max(his[d] - los[d], cell_fs) / cell_fs)) + 1)
                    if d < dim else 1 for d in range(3)]
                caps_f = {}
                fracs_f = {}
                any_f = any_c = False
                for name, xyz, h in zip(names, coords, hs):
                    fm = h <= h_split
                    xf = xyz[:, fm]
                    xc = xyz[:, ~fm]
                    occ_f, frac_f = measure(xf, cell_fs, fdims_meas,
                                            fdims, cell_fr)
                    caps_f[name] = (cls._round_cap(occ_f,
                                                   capacity_slack)
                                    if occ_f else 8)
                    fracs_f[name] = (min(1.0, 1.6 * frac_f + 0.02)
                                     if occ_f else 0.05)
                    occ_fc, _ = measure(xf, cell, dims_meas, dims,
                                        cell_run)
                    occ_c, _ = measure(xc, cell, dims_meas, dims,
                                       cell_run)
                    pop_caps[('fc', name)] = (
                        cls._round_cap(occ_fc, capacity_slack)
                        if occ_fc else 4)
                    pop_caps[('c', name)] = (
                        cls._round_cap(occ_c, capacity_slack)
                        if occ_c else 4)
                    any_f = any_f or occ_f > 0
                    any_c = any_c or occ_c > 0
                if any_f and any_c:
                    fine = cls(dim, radius_scale, tuple(fdims),
                               max(caps_f.values()), domain,
                               cell_slack=cell_slack,
                               capacities=caps_f,
                               block_fracs=fracs_f, h_cell=h_split)
                else:
                    # degenerate split (all fine or all coarse)
                    h_split = None
                    pop_caps = {}
        return cls(dim, radius_scale, tuple(dims), cell_capacity,
                   domain, cell_slack=cell_slack,
                   capacities=capacities, block_fracs=block_fracs,
                   h_split=h_split, fine=fine,
                   pop_capacities=pop_caps)

    def grow(self, cells=False, extent=False, blocks=False,
             windows=False, factor=2):
        """Return a larger spec after an overflow."""
        dims = self.dims
        if extent:
            dims = tuple(d * factor if i < self.dim and
                         not self.periodic[i] else d
                         for i, d in enumerate(dims))
        M = self.cell_capacity * factor if cells else self.cell_capacity
        caps = {k: v * factor if cells else v
                for k, v in self.capacities.items()}
        fracs = self.block_fracs
        if blocks:
            fracs = {k: min(1.0, v * 2) for k, v in fracs.items()}
        wcaps = self.window_caps
        if windows:
            # the engine recorded its effective capacity per array at
            # plan time; doubling past the full window makes the
            # engine disable compaction for that array
            wcaps = {k: v * 2 for k, v in wcaps.items()}
        if cells:
            # window occupancy scales with cell occupancy
            wcaps = {k: v * factor for k, v in wcaps.items()}
        fine = self.fine
        if fine is not None and (cells or extent or blocks or windows):
            fine = fine.grow(cells=cells, extent=extent, blocks=blocks,
                             windows=windows, factor=factor)
        pop_caps = {k: v * factor if cells else v
                    for k, v in self.pop_capacities.items()}
        new = GridSpec(self.dim, self.radius_scale, dims, M,
                       self.domain, cell_slack=self.cell_slack,
                       capacities=caps, block_fracs=fracs,
                       window_caps=wcaps, h_cell=self.h_cell,
                       h_split=self.h_split, fine=fine,
                       pop_capacities=pop_caps)
        new.window_levels = dict(self.window_levels)
        return new

    # ------------------------------------------------------------------
    def geometry(self, states):
        """Dynamic origin + per-axis cell widths from the current states.

        Shared by all particle arrays (global hmax sets the cell size,
        like reference nnps_base.pyx:1471)."""
        fdt = next(iter(states.values()))['x'].dtype
        big = jnp.asarray(np.finfo(np.float32).max, dtype=fdt)
        hmax = jnp.zeros((), dtype=fdt)
        mins = [big, big, big]
        for s in states.values():
            cap = s['x'].shape[0]
            act = jnp.arange(cap, dtype=jnp.int32) < s['n_act']
            hmax = jnp.maximum(hmax, jnp.max(jnp.where(act, s['h'], 0.0)))
            for d, c in enumerate((s['x'], s['y'], s['z'])):
                mins[d] = jnp.minimum(mins[d], jnp.min(
                    jnp.where(act, c, big)))
        if self.h_cell is not None:
            # static cell size (fine sub-grid: sized by h_split, not
            # the dynamic population hmax — membership guarantees
            # h <= h_split at binning time)
            hmax = jnp.asarray(self.h_cell, fdt)
        cell0 = self.cell_slack * self.radius_scale * hmax
        per = self.periodic
        origin = []
        widths = []
        dlo = None if self.domain is None else self.domain.mins
        dlen = None if self.domain is None else self.domain.lengths
        for d in range(3):
            if d >= self.dim:
                origin.append(jnp.zeros((), fdt))
                widths.append(cell0)
            elif per[d]:
                origin.append(jnp.asarray(dlo[d], fdt))
                widths.append(jnp.asarray(dlen[d], fdt) / self.dims[d])
            else:
                # half-cell pad so boundary particles sit inside
                origin.append(mins[d] - 0.5 * cell0)
                widths.append(cell0)
        return jnp.stack(origin), jnp.stack(widths), cell0


class GridLayout(NamedTuple):
    """One particle array laid out on a GridSpec."""
    slot_to_particle: jnp.ndarray   # (n_slots,) int32; -1 empty
    slot_mask: jnp.ndarray          # (n_slots,) bool
    particle_to_slot: jnp.ndarray   # (cap,) int32 (sentinel for inactive)
    cell_overflow: jnp.ndarray      # () bool — cell fuller than M
    extent_overflow: jnp.ndarray    # () bool — particle outside grid


def build_layout(spec, state, origin, widths, capacity=None,
                 pop_mask=None):
    """Bin one particle state onto the grid.

    Sort-based slot assignment (one argsort of cell keys, like the
    reference's bin+count, then rank-within-cell gives the slot).
    ``capacity`` overrides the spec default M (per-array capacity).
    ``pop_mask`` restricts the layout to a sub-population (stratified
    variable-h): excluded particles are treated as inactive — they get
    no slot and keep their flat values on fold."""
    cap = state['x'].shape[0]
    act = jnp.arange(cap, dtype=jnp.int32) < state['n_act']
    if pop_mask is not None:
        act = act & pop_mask
    per = spec.periodic
    coords = []
    extent_ovf = jnp.asarray(False)
    for d, c in enumerate((state['x'], state['y'], state['z'])):
        if d >= spec.dim:
            coords.append(jnp.zeros(cap, jnp.int32))
            continue
        ci = jnp.floor((c - origin[d]) / widths[d]).astype(jnp.int32)
        if per[d]:
            ci = jnp.mod(ci, spec.dims[d])
        else:
            extent_ovf = extent_ovf | jnp.any(
                act & ((ci < 0) | (ci >= spec.dims[d])))
            ci = jnp.clip(ci, 0, spec.dims[d] - 1)
        coords.append(ci)
    flat = (coords[0] * spec.dims[1] + coords[1]) * spec.dims[2] + \
        coords[2]
    M = spec.cell_capacity if capacity is None else int(capacity)
    n_slots = spec.n_cells * M

    key = jnp.where(act, flat, spec.n_cells)
    order = jnp.argsort(key).astype(jnp.int32)
    sorted_key = key[order]
    # rank within cell = position - start-of-run; the run start is the
    # running max over positions where the key changes (associative scan
    # compiles far faster on TPU than a searchsorted over N).
    pos = jnp.arange(cap, dtype=jnp.int32)
    is_start = jnp.concatenate([
        jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]])
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pos, 0))
    rank = pos - run_start
    cell_ovf = jnp.any((sorted_key < spec.n_cells) & (rank >= M))
    ok = (sorted_key < spec.n_cells) & (rank < M)
    slot = sorted_key * M + jnp.minimum(rank, M - 1)

    # out-of-range scatter indices are dropped (mode='drop')
    write_slot = jnp.where(ok, slot, n_slots)
    slot_to_particle = jnp.full(n_slots, -1, jnp.int32).at[
        write_slot].set(order, mode='drop')
    slot_mask = slot_to_particle >= 0

    particle_to_slot = jnp.full(cap, n_slots, jnp.int32).at[
        jnp.where(ok, order, cap)].set(slot, mode='drop')
    return GridLayout(slot_to_particle=slot_to_particle,
                      slot_mask=slot_mask,
                      particle_to_slot=particle_to_slot,
                      cell_overflow=cell_ovf,
                      extent_overflow=extent_ovf)


def to_slots(layout, flat_arr, fill=0):
    """flat (cap, ...) -> slot (n_slots, ...)."""
    idx = jnp.maximum(layout.slot_to_particle, 0)
    out = flat_arr[idx]
    if out.ndim == 1:
        return jnp.where(layout.slot_mask, out, fill)
    return jnp.where(layout.slot_mask[:, None], out, fill)


def to_slots_many(layout, flat_arrs, fill=0):
    """Batched ``to_slots`` for same-dtype 1D props: one (cap, P) row
    gather instead of P scalar gathers (~7x cheaper on TPU, where 1D
    gathers lower to near-scalar loads — see PERF_NOTES.md)."""
    if len(flat_arrs) == 1:
        return [to_slots(layout, flat_arrs[0], fill)]
    m = jnp.stack(flat_arrs, axis=1)
    idx = jnp.maximum(layout.slot_to_particle, 0)
    out = jnp.where(layout.slot_mask[:, None], m[idx], fill)
    # Extracting the P columns one by one is a stride-P read of the
    # whole matrix each (XLA keeps plain .T logical via layout
    # assignment, so slicing the transpose is just as strided —
    # measured ~21 x 2.2 ms per eval at dam_break_3d dx=0.02).
    # reshape(-1) of the transpose forces ONE physical linearization;
    # the barrier stops XLA from re-fusing it into each slice; the
    # slices themselves are then contiguous bitcasts.
    n = out.shape[0]
    flat_t = jax.lax.optimization_barrier(out.T.reshape(-1))
    return [flat_t[i * n:(i + 1) * n]
            for i in range(len(flat_arrs))]


def from_slots_many(layout, slot_arrs, flat_arrs):
    """Batched ``from_slots`` (same rationale as to_slots_many)."""
    if len(slot_arrs) == 1:
        return [from_slots(layout, slot_arrs[0], flat_arrs[0])]
    s = jnp.stack(slot_arrs, axis=1)
    f = jnp.stack(flat_arrs, axis=1)
    idx = jnp.minimum(layout.particle_to_slot, s.shape[0] - 1)
    ok = layout.particle_to_slot < s.shape[0]
    out = jnp.where(ok[:, None], s[idx], f)
    n = out.shape[0]
    flat_t = jax.lax.optimization_barrier(
        out.T.reshape(-1))  # see to_slots_many
    return [flat_t[i * n:(i + 1) * n]
            for i in range(len(slot_arrs))]


def from_slots(layout, slot_arr, flat_arr):
    """Scatter slot values back to flat particle order; untouched
    (inactive) rows keep their old values."""
    cap = flat_arr.shape[0]
    idx = jnp.minimum(layout.particle_to_slot,
                      slot_arr.shape[0] - 1)
    vals = slot_arr[idx]
    ok = layout.particle_to_slot < slot_arr.shape[0]
    if flat_arr.ndim == 1:
        return jnp.where(ok, vals, flat_arr)
    return jnp.where(ok[:, None], vals, flat_arr)


class StencilView(object):
    """Lazy per-property stencil concatenation for one source layout.

    ``src(prop_slot_array) -> (n_cells, 1, S*M)`` where S = 9 or 27.
    Also provides the stencil candidate mask and candidate slot ids.
    """

    def __init__(self, spec, layout):
        self.spec = spec
        self.layout = layout
        self._mask = None
        self._cand_particles = None

    @property
    def M(self):
        """This layout's per-cell capacity (shape-derived, static)."""
        return self.layout.slot_to_particle.shape[0] // self.spec.n_cells

    def _roll_grid(self, slot_arr):
        spec = self.spec
        M = slot_arr.shape[0] // spec.n_cells
        g = slot_arr.reshape(spec.dims + (M,))
        outs = []
        for off in spec.offsets:
            r = g
            for ax, o in enumerate(off):
                if o != 0:
                    r = jnp.roll(r, -o, axis=ax)
            outs.append(r.reshape(spec.n_cells, M))
        return jnp.concatenate(outs, axis=1)  # (n_cells, S*M)

    def stencil(self, slot_arr):
        return self._roll_grid(slot_arr)[:, None, :]

    def unstencil(self, per_src):
        """Inverse of the stencil map for accumulations into the source.

        ``per_src`` is (n_cells, S*M): per-candidate contributions already
        reduced over dest slots.  Each offset block is rolled back (+o)
        and summed, yielding a (n_slots,) accumulation with no scatter."""
        spec = self.spec
        M = self.M
        acc = None
        for k, off in enumerate(spec.offsets):
            block = per_src[:, k * M:(k + 1) * M].reshape(
                spec.dims + (M,))
            for ax, o in enumerate(off):
                if o != 0:
                    block = jnp.roll(block, o, axis=ax)
            block = block.reshape(spec.n_cells * M)
            acc = block if acc is None else acc + block
        return acc

    def _offset_cell_valid(self):
        """(n_cells, S) validity of each stencil offset per cell (guards
        the roll wraparound on non-periodic axes)."""
        spec = self.spec
        per = spec.periodic
        dims = spec.dims
        cells = jnp.arange(spec.n_cells, dtype=jnp.int32)
        cz = cells % dims[2]
        cy = (cells // dims[2]) % dims[1]
        cx = cells // (dims[1] * dims[2])
        cols = []
        for off in spec.offsets:
            ok = jnp.ones(spec.n_cells, bool)
            for d, (c, o) in enumerate(zip((cx, cy, cz), off)):
                if o != 0 and d < spec.dim and not per[d]:
                    ok = ok & (c + o >= 0) & (c + o < dims[d])
            cols.append(ok)
        return jnp.stack(cols, axis=1)

    def mask(self):
        """(n_cells, 1, S*M) candidate validity."""
        if self._mask is None:
            M = self.M
            sm = self._roll_grid(
                self.layout.slot_mask.astype(jnp.int32)).astype(bool)
            cell_ok = self._offset_cell_valid()
            cell_ok = jnp.repeat(cell_ok, M, axis=1)
            self._mask = (sm & cell_ok)[:, None, :]
        return self._mask

    def candidate_particles(self):
        """(n_cells, S*M) original particle index of each candidate
        (for tests/debug)."""
        if self._cand_particles is None:
            self._cand_particles = self._roll_grid(
                self.layout.slot_to_particle)
        return self._cand_particles
