"""Measured union-window capacities.

The pallas engines compact each dest cell-row's stencil window to a
static per-(dest,src) capacity K (see pallas_engine._union_windows /
resident._union_window).  The geometric default (0.72 * the raw
stencil width) is safe but loose: on dam_break_3d at dx=0.02 the
measured max prune survivor count is 427 of a 640 default for
fluid<-fluid and 155 for boundary<-fluid — pair-physics volume is
proportional to K, so sizing K from the data is a direct speedup.

``calibrate_window_caps`` replays the kernels' exact prune predicate
(distance from each source particle to the dest cell's AABB, against
rs * max(h_row_max, h_src)) in vectorized numpy on the host and
returns a per-pair cap.  The reference analog is the dynamically
sized neighbor arrays of the Cython NNPS (nnps_base.pyx resizes
per-dest arrays to the true count); here sizes must be static, so we
measure once at setup and let the engine's window_overflow ->
recalibrate path handle later growth (solver._handle_overflow).
"""
import numpy as np


def _pad128(n):
    return max(128, -(-int(n) // 128) * 128)


def pair_keys(a_evals):
    """All (dest, src) pair-phase keys across the evals' groups."""
    keys = []
    seen = set()
    for a_eval in a_evals:
        for eq in a_eval._iter_equations():
            if getattr(eq, 'loop', None) is None and \
                    getattr(eq, 'loop_all', None) is None:
                continue
            for src in (eq.sources or ()):
                k = (eq.dest, src)
                if k not in seen:
                    seen.add(k)
                    keys.append(k)
    return keys


def calibrate_window_caps(a_evals, states, spec, origin, widths,
                          slack=1.1, margin=32, levels_out=None):
    """Measured per-(dest,src) window caps for the current states.

    ``origin``/``widths``: the grid geometry (host floats, physical
    axes).  Returns {'dest<-src': K} with K = pad128(max_count * slack
    + margin); pairs whose arrays are empty get the 128 floor.
    Periodic axes use the minimum image like the in-kernel prune.

    ``levels_out``: optional dict filled with per-pair K-cascade
    sub-levels (lane counts below the cap that a large fraction of
    row chunks fit under) measured from the chunk-max distribution —
    the resident kernel's count-gated physics uses them to skip
    padded lanes on sparse chunks (e.g. dam_break_3d fluid<-boundary:
    most chunks hold < 128 of the 384-cap candidates).
    """
    dim = spec.dim
    dims = spec.dims
    rs = spec.radius_scale
    dom = spec.domain
    per = [False, False, False]
    lengths = [0.0, 0.0, 0.0]
    if dom is not None and dom.is_periodic:
        per = list(dom.periodic)
        lengths = [float(v) for v in dom.lengths]

    # fetch once per array
    cols = {}
    for name, s in states.items():
        n = int(np.asarray(s['n_act']))
        pos = [np.asarray(s[c])[:n] for c in ('x', 'y', 'z')[:dim]]
        h = np.asarray(s['h'])[:n]
        cell = []
        for a2 in range(dim):
            c = ((pos[a2] - origin[a2]) / widths[a2]).astype(np.int64)
            cell.append(np.clip(c, 0, dims[a2] - 1))
        flat = cell[0]
        for a2 in range(1, dim):
            flat = flat * dims[a2] + cell[a2]
        cols[name] = (pos, h, flat)

    n_cells = 1
    for a2 in range(dim):
        n_cells *= dims[a2]

    # per-dest-array: occupied cells and their max h (the kernel's
    # hrow = max h over the row's slots)
    dinfo = {}
    for name, (pos, h, flat) in cols.items():
        if h.size == 0:
            dinfo[name] = None
            continue
        hmax_c = np.zeros(n_cells, h.dtype)
        np.maximum.at(hmax_c, flat, h)
        occ = np.zeros(n_cells, bool)
        occ[flat] = True
        dinfo[name] = (occ, hmax_c)

    import itertools
    offsets = list(itertools.product(*([(-1, 0, 1)] * dim)))

    caps = {}
    for dname, sname in pair_keys(a_evals):
        if dname not in cols or sname not in cols:
            continue
        dcell = dinfo[dname]
        spos, sh, sflat = cols[sname]
        key = '%s<-%s' % (dname, sname)
        if dcell is None or sh.size == 0:
            caps[key] = 128
            continue
        occ, hmax_c = dcell
        scell = []
        for a2 in range(dim):
            c = ((spos[a2] - origin[a2]) / widths[a2]) \
                .astype(np.int64)
            scell.append(np.clip(c, 0, dims[a2] - 1))
        counts = np.zeros(n_cells, np.int64)
        for off in offsets:
            # dest cell = src cell - offset (src sits at stencil
            # offset ``off`` of the dest)
            dc = []
            valid = np.ones(sh.shape, bool)
            for a2 in range(dim):
                c = scell[a2] - off[a2]
                if per[a2]:
                    c = np.mod(c, dims[a2])
                else:
                    valid &= (c >= 0) & (c < dims[a2])
                dc.append(np.clip(c, 0, dims[a2] - 1))
            flat_d = dc[0]
            for a2 in range(1, dim):
                flat_d = flat_d * dims[a2] + dc[a2]
            valid &= occ[flat_d]
            d2 = np.zeros(sh.shape, sh.dtype)
            for a2 in range(dim):
                lo = origin[a2] + dc[a2] * widths[a2]
                dd = spos[a2] - (lo + 0.5 * widths[a2])
                if per[a2]:
                    L = lengths[a2]
                    dd = dd - L * np.round(dd / L)
                d2 += np.maximum(np.abs(dd) - 0.5 * widths[a2],
                                 0.0) ** 2
            sup = rs * np.maximum(hmax_c[flat_d], sh)
            valid &= d2 <= sup * sup
            counts += np.bincount(flat_d[valid], minlength=n_cells)
        mc = int(counts.max()) if counts.size else 0
        caps[key] = _pad128(int(mc * slack) + margin)
        if levels_out is not None:
            # chunk-max distribution over nominal 8-row pencil chunks
            # (mirrors the kernel's cz gating granularity)
            dn = dims[2] if dim == 3 else dims[1]
            nzc = max(1, dn)
            cells = np.where(counts > 0)[0]
            if cells.size == 0:
                levels_out[key] = ()
                continue
            pen = cells // nzc
            chk = (cells % nzc) // 8
            ckey = pen * 256 + chk
            uk, inv = np.unique(ckey, return_inverse=True)
            cmax = np.zeros(uk.shape[0], np.int64)
            np.maximum.at(cmax, inv, counts[cells])
            lv = set()
            for q in (40.0, 75.0):
                l = _pad128(int(np.percentile(cmax, q) * slack))
                if 128 <= l < caps[key]:
                    lv.add(l)
            levels_out[key] = tuple(sorted(lv)[-2:])
    return caps
