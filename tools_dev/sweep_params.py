"""A/B sweep of Mosaic compiler knobs on the dam_break_3d eval.

All variants are timed intra-process (verify skill: never compare
across processes through the tunnel).
Run: python tools_dev/sweep_params.py [dx]
"""
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
    packe, unpacke = make_packer((states,))
    K = 10

    configs = [
        ('baseline', {}),
        ('parallel', {'PYSPH_TPU_DIMSEM': 'parallel'}),
        ('arbitrary', {'PYSPH_TPU_DIMSEM': 'arbitrary'}),
        ('vmem=100MB', {'PYSPH_TPU_VMEM_MB': '100'}),
        ('par+vmem100', {'PYSPH_TPU_DIMSEM': 'parallel',
                         'PYSPH_TPU_VMEM_MB': '100'}),
    ]
    keys = ['PYSPH_TPU_DIMSEM', 'PYSPH_TPU_VMEM_MB']
    runs = []
    for label, env in configs:
        for k in keys:
            os.environ.pop(k, None)
        os.environ.update(env)

        def make_run():
            @jax.jit
            def run(blob):
                def body(s, _):
                    s = a_eval.compute(0.0, dt, s, handle)
                    return s, 0
                c, _ = jax.lax.scan(body, unpacke(blob)[0], None,
                                    length=K)
                return packe((c,))
            return run

        runs.append((label, make_run()))

    blob = packe((states,))
    # compile + warm all variants first, then interleave timing
    for label, run in runs:
        t0 = time.time()
        force(run(blob))
        print('%-14s compiled+warm in %5.1f s'
              % (label, time.time() - t0))
    times = {label: [] for label, _ in runs}
    for rep in range(3):
        for label, run in runs:
            t0 = time.time()
            force(run(blob))
            times[label].append((time.time() - t0) / K * 1e3)
    for label, _ in runs:
        ts = times[label]
        print('%-14s eval %7.2f ms (min %7.2f)'
              % (label, sum(ts) / len(ts), min(ts)))


if __name__ == '__main__':
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.02)
