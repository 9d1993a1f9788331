"""Decompose the dam_break_3d step time on the attached chip.

Times (all as K-iteration lax.scan blocks with a fetch barrier):
  step      : full integrator.step
  eval      : one AccelerationEval.compute with a fixed handle
  prepare   : binning (GridHandle build)
  stages    : the step with compute_accelerations stubbed out
Run: python tools_dev/prof_db3d.py [dx]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.argv = ['prof']


def force(x):
    leaves = [l for l in __import__('jax').tree_util.tree_leaves(x)
              if hasattr(l, 'shape')]
    return np.asarray(leaves[0].reshape(-1)[:1])


def timeit(fn, arg, n_calls=3):
    out = fn(arg)
    force(out)
    t0 = time.time()
    for _ in range(n_calls):
        out = fn(arg)
    force(out)
    return (time.time() - t0) / n_calls, out


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
    n = sum(int(np.asarray(s['n_act'])) for s in states.values())
    print('n particles:', n)

    a_eval = integ.acceleration_evals[0]
    fdt = states['fluid']['x'].dtype
    t0 = jnp.asarray(0.0, dtype=fdt)

    # warm state + carry
    _, _, carry0 = jax.jit(
        lambda s: integ.initial_acceleration(s, 0.0, dt))(states)
    pack, unpack = make_packer((states, t0, carry0))
    K = 10

    @jax.jit
    def run_step(blob):
        def body(c, _):
            s, t, nnps = c
            s, _d, nnps = integ.step(s, t, dt, nnps)
            return (s, t + dt, nnps), 0
        c, _ = jax.lax.scan(body, unpack(blob), None, length=K)
        return pack(c)

    blob0 = pack((states, t0, carry0))
    tstep, blob1 = timeit(run_step, blob0)
    print('step      : %7.2f ms' % (tstep / K * 1e3))

    # fixed-handle eval
    states1, _, carry1 = unpack(blob1)
    handle = carry1[0]
    packe, unpacke = make_packer((states1,))

    @jax.jit
    def run_eval(blob):
        def body(c, _):
            (s,) = unpacke(packe((c,)))  # keep pytree struct
            s = a_eval.compute(0.0, dt, s, handle)
            return s, 0
        c, _ = jax.lax.scan(body, unpacke(blob)[0], None, length=K)
        return packe((c,))

    teval, _ = timeit(run_eval, packe((states1,)))
    print('eval      : %7.2f ms' % (teval / K * 1e3))

    @jax.jit
    def run_prepare(blob):
        (s,) = unpacke(blob)
        def body(c, _):
            h, _d = a_eval.prepare(s)
            return c + h.origin[0], 0
        c, _ = jax.lax.scan(body, jnp.asarray(0.0, fdt), None, length=K)
        return c

    tprep, _ = timeit(run_prepare, packe((states1,)))
    print('prepare   : %7.2f ms' % (tprep / K * 1e3))

    # stages only: stub out compute_accelerations
    orig = integ.compute_accelerations
    integ.compute_accelerations = lambda *a, **k: None

    @jax.jit
    def run_stages(blob):
        def body(c, _):
            s, t, nnps = c
            s, _d, nnps = integ.step(s, t, dt, nnps)
            return (s, t + dt, nnps), 0
        c, _ = jax.lax.scan(body, unpack(blob), None, length=K)
        return pack(c)

    tstg, _ = timeit(run_stages, blob0)
    integ.compute_accelerations = orig
    print('stages    : %7.2f ms' % (tstg / K * 1e3))
    print('2*eval+stages+reuse-check accounted: %7.2f ms'
          % ((2 * teval + tstg) / K * 1e3))


if __name__ == '__main__':
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.02)
