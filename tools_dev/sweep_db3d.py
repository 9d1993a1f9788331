"""Sweep engine tuning knobs on the dam_break_3d eval."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.argv = ['sweep']


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
    spec = a_eval.grid_spec

    packe, unpacke = make_packer((states,))
    K = 10

    def time_eval(label, window_caps=None, env=None):
        saved_env = {}
        for k, v in (env or {}).items():
            saved_env[k] = os.environ.get(k)
            os.environ[k] = str(v)
        saved_caps = dict(spec.window_caps)
        if window_caps is not None:
            spec.window_caps.clear()
            spec.window_caps.update(window_caps)

        @jax.jit
        def run(blob):
            def body(s, _):
                s = a_eval.compute(0.0, dt, s, handle)
                return s, 0
            c, _ = jax.lax.scan(body, unpacke(blob)[0], None, length=K)
            return packe((c,))

        try:
            blob = packe((states,))
            out = run(blob)
            force(out)
            t0 = time.time()
            for _ in range(3):
                out = run(blob)
            force(out)
            t = (time.time() - t0) / 3 / K * 1e3
            print('%-40s %7.2f ms' % (label, t), flush=True)
        except Exception as e:
            print('%-40s FAILED: %s' % (label, str(e)[:120]), flush=True)
        finally:
            spec.window_caps.clear()
            spec.window_caps.update(saved_caps)
            for k, v in saved_env.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    time_eval('baseline (K=640)')
    caps512 = {'fluid': 512, 'boundary': 512, 'obstacle': 512}
    time_eval('K=512', window_caps=caps512)
    caps448 = {'fluid': 448, 'boundary': 448, 'obstacle': 448}
    time_eval('K=448', window_caps=caps448)
    time_eval('K=512 cz=4', window_caps=caps512,
              env={'PYSPH_TPU_UNION_CZ': 4, 'PYSPH_TPU_VMEM_TEMPS': 25})
    time_eval('K=512 temps=30', window_caps=caps512,
              env={'PYSPH_TPU_VMEM_TEMPS': 30})
    time_eval('cz=1', env={'PYSPH_TPU_UNION_CZ': 1})
    time_eval('no union', env={'PYSPH_TPU_UNION': '0'})


if __name__ == '__main__':
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.02)
