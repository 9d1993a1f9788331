"""Bisect the resident-engine eval on dam_break_3d: floor (DMA +
launch + writeback), window (strips + prune + left-pack), and full
physics, plus K / cz sweeps — all interleaved in one process so
tenant contention cancels out of comparisons.

Run: python tools_dev/prof_resident.py [dx]
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
    import jax.numpy as jnp
    from pysph_tpu.config import get_config
    get_config().use_pallas = True
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
    spec = a_eval.grid_spec

    runner = make_runner(a_eval, integ.steppers, states)
    assert runner is not None, 'resident ineligible'
    handle, packs, _diag = jax.jit(runner.prepare)(states)

    packer, unpacker = make_packer((packs,))
    N = 8

    def time_cfg(label, debug='', caps=None, env=None):
        saved_env = {}
        for k, v in (env or {}).items():
            saved_env[k] = os.environ.get(k)
            os.environ[k] = str(v)
        saved_caps = dict(spec.window_caps)
        if caps is not None:
            for k in list(spec.window_caps):
                spec.window_caps[k] = caps
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

        try:
            blob = packer((packs,))
            out = run(blob)
            force(out)
            t0 = time.time()
            for _ in range(3):
                out = run(blob)
            force(out)
            t = (time.time() - t0) / 3 / N * 1e3
            print('%-36s %7.2f ms/eval' % (label, t), flush=True)
            return t
        except Exception as e:
            print('%-36s FAILED: %s' % (label, str(e)[:160]),
                  flush=True)
            return None
        finally:
            res_mod._DEBUG = ''
            spec.window_caps.clear()
            spec.window_caps.update(saved_caps)
            for k, v in saved_env.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    print('window_caps:', spec.window_caps)
    time_cfg('full (default)')
    time_cfg('floor (DMA+launch+writeback)', debug='floor')
    time_cfg('window (strips+prune+pack)', debug='window')
    time_cfg('full K=512', caps=512)
    time_cfg('full K=448', caps=448)
    time_cfg('window K=448', debug='window', caps=448)
    time_cfg('full cz=1', env={'PYSPH_TPU_UNION_CZ': 1})
    time_cfg('full cz=4', env={'PYSPH_TPU_UNION_CZ': 4})
    time_cfg('full K=448 cz=1', caps=448,
             env={'PYSPH_TPU_UNION_CZ': 1})
    time_cfg('full (default, re-run)')


if __name__ == '__main__':
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.02)
