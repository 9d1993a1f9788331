"""Layout + padding statistics for dam_break_3d at dx.

Prints grid dims, per-array capacities/occupancy, active block
fractions, window caps, true-neighbor counts, and the padded vs true
pair-candidate volume — the utilization denominator.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.argv = ['stats']


def main(dx=0.02):
    import jax
    import jax.numpy as jnp
    from pysph_tpu.config import get_config
    get_config().use_pallas = True
    from pysph_tpu.examples.dam_break_3d import DamBreak3D

    app = DamBreak3D()
    app.setup(['--dx', str(dx), '--max-steps', '0', '--disable-output'])
    solver = app.solver
    integ = solver.integrator
    states = solver.states
    a_eval = integ.acceleration_evals[0]
    spec = a_eval.grid_spec
    print('dims:', spec.dims, 'n_cells:', spec.n_cells)
    print('cell_capacity:', spec.cell_capacity)
    print('capacities:', spec.capacities)
    print('block_fracs:', spec.block_fracs)
    print('radius_scale:', spec.radius_scale, 'cell_slack:',
          spec.cell_slack)

    handle, diag = jax.jit(a_eval.prepare)(states)
    # trigger planning to fill window_caps
    dt = float(solver.dt)
    _ = jax.jit(lambda s: a_eval.compute(0.0, dt, s, handle))(states)
    print('window_caps:', spec.window_caps)

    for name in a_eval.arrays_used:
        lay = handle.layouts[name]
        M = lay.slot_to_particle.shape[0] // spec.n_cells
        sm = np.asarray(lay.slot_mask).reshape(spec.n_cells, M)
        occ = sm.sum(axis=1)
        nz = occ[occ > 0]
        n = int(np.asarray(states[name]['n_act']))
        print('%-9s M=%3d cells_occupied=%6d mean_occ=%6.2f '
              'max_occ=%3d slot_fill_in_occupied=%.2f' %
              (name, M, len(nz), nz.mean() if len(nz) else 0,
               nz.max() if len(nz) else 0,
               nz.sum() / (len(nz) * M) if len(nz) else 0))

    # true neighbor counts for fluid (sample): brute force on a subset
    s = states['fluid']
    n = int(np.asarray(s['n_act']))
    x = np.asarray(s['x'])[:n]
    y = np.asarray(s['y'])[:n]
    z = np.asarray(s['z'])[:n]
    h = np.asarray(s['h'])[:n]
    rs = spec.radius_scale
    idx = np.random.RandomState(0).choice(n, size=200, replace=False)
    cnts = []
    for i in idx:
        r2 = (x - x[i]) ** 2 + (y - y[i]) ** 2 + (z - z[i]) ** 2
        sup = rs * np.maximum(h[i], h)
        cnts.append(int(np.sum(r2 < sup * sup)))
    cnts = np.array(cnts)
    print('fluid true nbrs (fluid src only): mean=%.1f max=%d' %
          (cnts.mean(), cnts.max()))

    # padded candidate volume per eval for the fluid<-fluid phase
    Md = spec.capacities.get('fluid', spec.cell_capacity)
    K = spec.window_caps.get('fluid', 0)
    lay = handle.layouts['fluid']
    sm = np.asarray(lay.slot_mask).reshape(spec.n_cells, Md)
    occ_cells = int((sm.sum(axis=1) > 0).sum())
    nx, ny, nzc = spec.dims
    tz = 8
    n_zt = -(-nzc // tz)
    g = sm.reshape(nx, ny, nzc, Md).any(axis=3)
    gp = np.zeros((nx, ny, n_zt * tz), bool)
    gp[:, :, :nzc] = g
    act_blocks = int(gp.reshape(nx, ny, n_zt, tz).any(axis=3).sum())
    print('fluid: occupied cells=%d active blocks=%d of %d' %
          (occ_cells, act_blocks, nx * ny * n_zt))
    Md_pad = -(-Md // 8) * 8
    K_pad = -(-K // 128) * 128 if K else 0
    padded = act_blocks * tz * Md_pad * K_pad
    true_pairs = n * cnts.mean()
    print('padded pair-candidates/eval (fluid<-fluid): %.3g  '
          'true pairs: %.3g  padding multiple: %.1fx' %
          (padded, true_pairs, padded / true_pairs))


if __name__ == '__main__':
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.02)
