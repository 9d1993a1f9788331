"""Round-5 fresh eval decomposition on dam_break_3d (resident engine):
interleaved same-process A/B of _DEBUG = '' / 'window' / 'floor' plus
pure elementwise (no pair kernels at all).

Run: python tools_dev/prof_r5.py [dx]
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
    from pysph_tpu.ops import resident as res_mod
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

    runner = make_runner(a_eval, integ.steppers, states)
    assert runner is not None, 'resident ineligible'
    handle, packs, _diag = jax.jit(runner.prepare)(states)
    packer, unpacker = make_packer((packs,))
    N = 8

    def build(debug):
        res_mod._DEBUG = debug

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
        force(run(blob))  # compile while _DEBUG is active
        print('compiled %-8r in %.1fs' % (debug, time.time() - t0),
              flush=True)
        res_mod._DEBUG = ''
        return run, blob

    variants = [('full  ', ''), ('window', 'window'),
                ('floor ', 'floor')]
    runs = {}
    blob = None
    for label, dbg in variants:
        runs[label], blob = build(dbg)
    outs = {}
    for rep in range(4):
        for label, _ in variants:
            fn = runs[label]
            t0 = time.time()
            b = blob
            for _ in range(3):
                b = fn(b)
            force(b)
            t = (time.time() - t0) / 3 / N * 1e3
            outs.setdefault(label, []).append(t)
            print('rep%d %s %7.2f ms/eval' % (rep, label, t),
                  flush=True)
    print()
    med = {}
    for label, ts in outs.items():
        med[label] = sorted(ts)[len(ts) // 2]
        print('%s median %7.2f ms/eval' % (label, med[label]))
    print('physics (full-window)  %7.2f' %
          (med['full  '] - med['window']))
    print('window  (window-floor) %7.2f' %
          (med['window'] - med['floor ']))


if __name__ == '__main__':
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.02)
