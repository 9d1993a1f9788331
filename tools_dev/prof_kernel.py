"""Split in-kernel cost: prune+leftpack+mask vs equation arithmetic.

Patches _run_eqs so that inside the kernel (KernelRunner) it only
computes the pair mask and accumulates its sum — keeping the window
prune, left-pack, DMA and framework identical while removing the
equation arithmetic.
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
    import pysph_tpu.ops.pallas_engine as pe
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

    def time_eval(label):
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
        print('%-40s %7.2f ms' % (label, t), flush=True)

    time_eval('real')

    orig = pe._run_eqs

    def stub_eqs(eqs, ctx, t, dt, written=None):
        r = ctx.runner
        if isinstance(r, pe._KernelRunner):
            # keep pair-mask computation (prune already happened in
            # _union_windows); accumulate its sum into every out prop
            # the recorder found
            m = ctx.pair_maskf
            contrib = jnp.sum(m, axis=2)
            for eq in eqs:
                for arg in pe._method_args(eq.loop):
                    if arg.startswith('d_a') or arg in ('d_arho',):
                        r.accumulate(arg[2:], 'sum', contrib)
            if not r.acc:
                r.accumulate('arho', 'sum', contrib)
            return set()
        return orig(eqs, ctx, t, dt, written)

    pe._run_eqs = stub_eqs
    try:
        time_eval('eqs stubbed (mask-sum only)')
    finally:
        pe._run_eqs = orig

    # and also without the union pack: how much is leftpack?
    def stub_eqs2(eqs, ctx, t, dt, written=None):
        r = ctx.runner
        if isinstance(r, pe._KernelRunner):
            contrib = jnp.sum(r.smaskf_cat, axis=1, keepdims=True) * \
                jnp.ones_like(r.dmaskf)
            r.accumulate('arho', 'sum', contrib)
            return set()
        return orig(eqs, ctx, t, dt, written)

    pe._run_eqs = stub_eqs2
    try:
        time_eval('eqs + pairmask stubbed')
    finally:
        pe._run_eqs = orig


if __name__ == '__main__':
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.02)
