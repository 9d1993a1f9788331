"""Exact per-row union-window counts for every (dest,src) phase of
dam_break_3d: how big does K actually need to be?

Counts = per (dest pencil, z-row): number of src particles whose
AABB-distance to the dest cell is within rs*max(h_row, h_src) —
exactly the kernel's prune predicate.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.argv = ['probe']


def main(dx=0.02):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from pysph_tpu.config import get_config
    get_config().use_pallas = False
    from pysph_tpu.examples.dam_break_3d import DamBreak3D

    app = DamBreak3D()
    app.setup(['--dx', str(dx), '--max-steps', '0',
               '--disable-output'])
    solver = app.solver
    states = solver.states
    a_eval = solver.integrator.acceleration_evals[0]
    spec = a_eval.grid_spec
    handle, _ = jax.jit(a_eval.prepare)(states)
    nx, ny, nz = spec.dims
    rs = spec.radius_scale
    origin = np.asarray(handle.origin)
    widths = np.asarray(handle.widths)

    # per-array particle cell coords + positions
    data = {}
    for name, s in states.items():
        n = int(np.asarray(s['n_act']))
        x = np.asarray(s['x'])[:n]
        y = np.asarray(s['y'])[:n]
        z = np.asarray(s['z'])[:n]
        h = np.asarray(s['h'])[:n]
        ci = np.clip(((x - origin[0]) / widths[0]).astype(int), 0,
                     nx - 1)
        cj = np.clip(((y - origin[1]) / widths[1]).astype(int), 0,
                     ny - 1)
        ck = np.clip(((z - origin[2]) / widths[2]).astype(int), 0,
                     nz - 1)
        data[name] = (x, y, z, h, ci, cj, ck)

    pairs = [('fluid', 'fluid'), ('fluid', 'boundary'),
             ('fluid', 'obstacle'), ('boundary', 'fluid'),
             ('obstacle', 'fluid')]
    for dname, sname in pairs:
        dxp, dyp, dzp, dh, di, dj, dk = data[dname]
        sx, sy, sz, sh, si, sj, sk = data[sname]
        # occupied dest cells + their max h
        cell_id = (di * ny + dj) * nz + dk
        occ = np.unique(cell_id)
        hmax_row = np.zeros(occ.shape[0])
        np.maximum.at(
            hmax_row,
            np.searchsorted(occ, cell_id), dh)
        # src candidates per dest cell via sorted cell buckets
        s_cell = (si * ny + sj) * nz + sk
        order = np.argsort(s_cell)
        s_cell_s = s_cell[order]
        sxs, sys_, szs, shs = (sx[order], sy[order], sz[order],
                               sh[order])
        counts = []
        for oi, cid in enumerate(occ):
            i, rem = divmod(cid, ny * nz)
            j, k = divmod(rem, nz)
            lo = origin[:3] + np.array([i, j, k]) * widths[:3]
            hi = lo + widths[:3]
            cnt = 0
            for ii in range(max(0, i - 1), min(nx, i + 2)):
                for jj in range(max(0, j - 1), min(ny, j + 2)):
                    for kk in range(max(0, k - 1), min(nz, k + 2)):
                        c2 = (ii * ny + jj) * nz + kk
                        a = np.searchsorted(s_cell_s, c2)
                        b = np.searchsorted(s_cell_s, c2 + 1)
                        if a == b:
                            continue
                        ddx = np.maximum(
                            np.abs(sxs[a:b] - 0.5 * (lo[0] + hi[0]))
                            - 0.5 * widths[0], 0)
                        ddy = np.maximum(
                            np.abs(sys_[a:b] - 0.5 * (lo[1] + hi[1]))
                            - 0.5 * widths[1], 0)
                        ddz = np.maximum(
                            np.abs(szs[a:b] - 0.5 * (lo[2] + hi[2]))
                            - 0.5 * widths[2], 0)
                        d2 = ddx ** 2 + ddy ** 2 + ddz ** 2
                        sup = rs * np.maximum(hmax_row[oi], shs[a:b])
                        cnt += int(np.sum(d2 <= sup * sup))
            counts.append(cnt)
        counts = np.array(counts)
        print('%-22s rows=%6d  mean=%7.1f  p99=%7.1f  max=%6d' %
              ('%s<-%s' % (dname, sname), counts.size, counts.mean(),
               np.percentile(counts, 99), counts.max()))


if __name__ == '__main__':
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.02)
