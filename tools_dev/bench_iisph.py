"""IISPH dam-break throughput on the chip (VERDICT r4 missing #3:
'no measurement exists of IISPH throughput at all'), with an
interleaved resident-ON vs resident-OFF A/B of the new
iterated-group fast path.

Run: python tools_dev/bench_iisph.py [dx]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.argv = ['bench_iisph']


def force(x):
    import jax
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, 'shape')]
    return np.asarray(leaves[0].reshape(-1)[:1])


def setup(dx, resident):
    from pysph_tpu.examples.dam_break_2d import DamBreak2D
    os.environ['PYSPH_TPU_RESIDENT'] = '1' if resident else '0'
    app = DamBreak2D()
    app.setup(['--dx', str(dx), '--scheme', 'iisph',
               '--max-steps', '0', '--disable-output'])
    return app


def main(dx=0.01):
    import jax
    from pysph_tpu.config import get_config
    get_config().use_pallas = True
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(__file__), '..',
                                   '.jax_cache_tpu'))

    runs = {}
    n = None
    for label, resident in (('resident', True), ('slotstore', False)):
        app = setup(dx, resident)
        solver = app.solver
        integ = solver.integrator
        states = solver.states
        dt = float(solver.dt)
        n = sum(int(np.asarray(s['n_act'])) for s in states.values())
        states, _d, carry0 = jax.jit(
            lambda s: integ.initial_acceleration(s, 0.0, dt))(states)
        if resident:
            # the whole point: the iterated pressure group must be ON
            # the resident path
            assert integ._res_runner not in (None, False), \
                'IISPH did not engage the resident path'

        K = 5

        @jax.jit
        def run(states, carry):
            def body(c, _):
                s, t, nn = c
                s, _diag, nn = integ.step(s, t, dt, nn)
                return (s, t + dt, nn), 0
            c, _ = jax.lax.scan(body, (states, 0.0, carry), None,
                                length=K)
            return c[0], c[2]

        t0 = time.time()
        s2, c2 = run(states, carry0)
        force(s2)
        print('%s compiled+first in %.1fs' % (label,
                                              time.time() - t0),
              flush=True)
        runs[label] = (run, states, carry0, K)

    outs = {}
    for rep in range(3):
        for label, (run, states, carry0, K) in runs.items():
            t0 = time.time()
            s2, c2 = run(states, carry0)
            for _ in range(2):
                s2, c2 = run(s2, c2)
            force(s2)
            t = (time.time() - t0) / (3 * K)
            outs.setdefault(label, []).append(t)
            print('rep%d %-10s %7.1f ms/step  %.3g ps/s' %
                  (rep, label, t * 1e3, n / t), flush=True)
    print()
    for label, ts in outs.items():
        med = sorted(ts)[len(ts) // 2]
        print('%-10s median %7.1f ms/step = %.3g particle-steps/s '
              '(n=%d)' % (label, med * 1e3, n / med, n))


if __name__ == '__main__':
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.01)
