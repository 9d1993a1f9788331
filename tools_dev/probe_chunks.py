"""Chunk-level union-window count distribution for dam_break_3d.

The resident kernel runs physics per (pencil, cz-row chunk) on
(cz, Md, K) blocks.  A count-gated K cascade (run K/4 or K/2 lanes
when the chunk's max prune-survivor count allows) would cut VPU work
by the ratio reported here.  Counts replicate the kernel's exact
prune (AABB distance vs rs*max(h_row, h_src)).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.argv = ['probe']

CZ = 8


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
    print('dims', spec.dims, 'window caps', spec.window_caps)

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
        K = spec.window_caps.get('%s<-%s' % (dname, sname), 512)
        cell_id = (di * ny + dj) * nz + dk
        occ = np.unique(cell_id)
        hmax_row = np.zeros(occ.shape[0])
        np.maximum.at(hmax_row, np.searchsorted(occ, cell_id), dh)
        s_cell = (si * ny + sj) * nz + sk
        order = np.argsort(s_cell)
        s_cell_s = s_cell[order]
        sxs, sys_, szs, shs = (sx[order], sy[order], sz[order],
                               sh[order])
        counts = np.zeros(occ.shape[0], np.int64)
        for oi, cid in enumerate(occ):
            i, rem = divmod(cid, ny * nz)
            j, k = divmod(rem, nz)
            lo = origin[:3] + np.array([i, j, k]) * widths[:3]
            cnt = 0
            for ii in range(max(0, i - 1), min(nx, i + 2)):
                for jj in range(max(0, j - 1), min(ny, j + 2)):
                    for kk in range(max(0, k - 1), min(nz, k + 2)):
                        c2 = (ii * ny + jj) * nz + kk
                        a = np.searchsorted(s_cell_s, c2)
                        b = np.searchsorted(s_cell_s, c2 + 1)
                        if a == b:
                            continue
                        ddx = np.maximum(np.abs(
                            sxs[a:b] - lo[0] - 0.5 * widths[0])
                            - 0.5 * widths[0], 0)
                        ddy = np.maximum(np.abs(
                            sys_[a:b] - lo[1] - 0.5 * widths[1])
                            - 0.5 * widths[1], 0)
                        ddz = np.maximum(np.abs(
                            szs[a:b] - lo[2] - 0.5 * widths[2])
                            - 0.5 * widths[2], 0)
                        d2 = ddx ** 2 + ddy ** 2 + ddz ** 2
                        sup = rs * np.maximum(hmax_row[oi], shs[a:b])
                        cnt += int(np.sum(d2 <= sup * sup))
            counts[oi] = cnt

        # chunk = (pencil, k // CZ); counts over SOURCE-nonempty
        # chunks of ACTIVE dest pencils (gating skips the rest).
        # a chunk runs when any dest row is occupied AND the strip
        # has sources; its K-level = max row count in the chunk
        pen = occ // nz
        chunk = (occ % nz) // CZ
        key = pen * 64 + chunk
        uk = np.unique(key)
        cmax = np.zeros(uk.shape[0], np.int64)
        np.maximum.at(cmax, np.searchsorted(uk, key), counts)
        levels = [K // 4, K // 2, K]
        levels = sorted({max(128, -(-l // 128) * 128) for l in levels})
        cost_now = uk.size * K
        cost_cascade = 0
        frac = []
        for li, L in enumerate(levels):
            lo_l = 0 if li == 0 else levels[li - 1]
            m = (cmax > lo_l) & (cmax <= L) if li else (cmax <= L)
            cost_cascade += int(np.sum(m)) * L
            frac.append((L, int(np.sum(m))))
        over = cmax > levels[-1]
        cost_cascade += int(np.sum(over)) * levels[-1]
        print('%-20s K=%4d chunks=%5d  levels %s  physics x%.2f' %
              ('%s<-%s' % (dname, sname), K, uk.size,
               ' '.join('%d:%d' % f for f in frac),
               cost_now / max(cost_cascade, 1)))


if __name__ == '__main__':
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.02)
