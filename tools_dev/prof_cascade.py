"""Interleaved A/B of the count-gated K cascade (PYSPH_TPU_CASCADE)
on dam_break_3d, one process (PERF_NOTES "Measurement traps").

Run: python tools_dev/prof_cascade.py [dx]
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
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(__file__), '..',
                                   '.jax_cache_tpu'))
    from pysph_tpu.examples.dam_break_3d import DamBreak3D
    from pysph_tpu.ops.resident import PackStore, make_runner
    from pysph_tpu.utils.packing import make_packer

    app = DamBreak3D()
    app.setup(['--dx', str(dx), '--max-steps', '0',
               '--disable-output'])
    solver = app.solver
    integ = solver.integrator
    states = solver.states
    dt = float(solver.dt)
    a_eval = integ.acceleration_evals[0]
    print('levels:', a_eval.grid_spec.window_levels, flush=True)

    runner = make_runner(a_eval, integ.steppers, states)
    assert runner is not None
    handle, packs, _diag = jax.jit(runner.prepare)(states)
    packer, unpacker = make_packer((packs,))
    N = 8

    def build(cascade):
        os.environ['PYSPH_TPU_CASCADE'] = '1' if cascade else '0'

        @jax.jit
        def run(blob):
            def body(pk, _):
                stores = {
                    name: PackStore(runner.plan, name, ps,
                                    dict(states[name]))
                    for name, ps in pk.items()}
                runner.compute(0.0, dt, stores, handle)
                return {n: s.finalize_pack()
                        for n, s in stores.items()}, 0
            pk, _ = jax.lax.scan(body, unpacker(blob)[0], None,
                                 length=N)
            return packer((pk,))

        blob = packer((packs,))
        t0 = time.time()
        force(run(blob))
        print('compiled cascade=%s in %.1fs' % (cascade,
                                                time.time() - t0),
              flush=True)
        os.environ['PYSPH_TPU_CASCADE'] = '1'
        return run, blob

    run_on, blob = build(True)
    run_off, _ = build(False)
    outs = {}
    for rep in range(4):
        for label, fn in (('cascade ON ', run_on),
                          ('cascade OFF', run_off)):
            t0 = time.time()
            b = blob
            for _ in range(3):
                b = fn(b)
            force(b)
            t = (time.time() - t0) / 3 / N * 1e3
            outs.setdefault(label, []).append(t)
            print('rep%d %s %7.2f ms/eval' % (rep, label, t),
                  flush=True)
    for label, ts in outs.items():
        print('%s median %7.2f ms/eval'
              % (label, sorted(ts)[len(ts) // 2]))


if __name__ == '__main__':
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.02)
