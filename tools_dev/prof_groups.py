"""Per-group timing of the dam_break_3d eval (fixed handle)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.argv = ['prof']


def force(x):
    import jax
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, 'shape')]
    return np.asarray(leaves[0].reshape(-1)[:1])


def main(dx=0.02):
    import jax
    import jax.numpy as jnp
    from pysph_tpu.config import get_config
    get_config().use_pallas = True
    from pysph_tpu.examples.dam_break_3d import DamBreak3D
    from pysph_tpu.utils.packing import make_packer

    app = DamBreak3D()
    app.setup(['--dx', str(dx), '--max-steps', '0', '--disable-output'])
    solver = app.solver
    integ = solver.integrator
    states = solver.states
    dt = float(solver.dt)
    a_eval = integ.acceleration_evals[0]
    handle, _ = jax.jit(a_eval.prepare)(states)

    for gi, g in enumerate(a_eval.groups):
        names = [e.__class__.__name__ + '->' + e.dest +
                 '<-' + ','.join(e.sources or [])
                 for e in a_eval._iter_equations([g])]
        print('group %d: %s' % (gi, '; '.join(names)))

    packe, unpacke = make_packer((states,))
    K = 10
    all_groups = a_eval.groups

    def time_groups(groups, label):
        a_eval.groups = groups

        @jax.jit
        def run(blob):
            def body(s, _):
                s = a_eval.compute(0.0, dt, s, handle)
                return s, 0
            c, _ = jax.lax.scan(body, unpacke(blob)[0], None, length=K)
            return packe((c,))

        blob = packe((states,))
        out = run(blob)
        force(out)
        t0 = time.time()
        for _ in range(3):
            out = run(blob)
        force(out)
        t = (time.time() - t0) / 3 / K * 1e3
        print('%-28s %7.2f ms' % (label, t))
        a_eval.groups = all_groups
        return t

    t_all = time_groups(all_groups, 'all groups')
    ts = []
    for gi, g in enumerate(all_groups):
        ts.append(time_groups([g], 'group %d' % gi))
    print('sum of singles: %.2f  all: %.2f' % (sum(ts), t_all))


if __name__ == '__main__':
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.02)
