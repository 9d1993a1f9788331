"""Isolate the source-view DMA cost in the real engine.

Variants (all with the kernel body stubbed to zeros):
  stub            : full grid spec (all inputs DMA'd)
  stub-no-views   : source-view inputs dropped from the call
  stub-dest-only  : views + consts dropped
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
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

    orig_call = pl.pallas_call

    def make_stub(drop_views=False, drop_all=False):
        def stub_call(kern, *a, **kw):
            gs = kw['grid_spec']
            out_shape = kw['out_shape']
            n_pf = gs.num_scalar_prefetch
            in_specs = list(gs.in_specs)
            scratch = list(gs.scratch_shapes or [])
            oi = -1 - len(scratch)

            def wrapper(*args):
                pf = args[:n_pf]
                ins = list(args[n_pf:])
                keep = []
                keep_specs = []
                vi = 0
                for x, s in zip(ins, in_specs):
                    is_view = (hasattr(s, 'block_shape') and
                               s.block_shape is not None and
                               len(s.block_shape) == 3 and
                               s.block_shape[0] == 1 and
                               s.block_shape[-1] >= 512)
                    if is_view:
                        vi += 1
                    if drop_all and x.ndim >= 2 and x.size > 64:
                        drop = True
                    elif drop_views is True and is_view:
                        drop = True
                    elif drop_views == '6of9' and is_view and \
                            (vi % 9) % 3 != 1:
                        drop = True
                    else:
                        drop = False
                    if not drop:
                        keep.append(x)
                        keep_specs.append(s)

                def stub_kern(*refs):
                    refs[oi][...] = jnp.zeros(refs[oi].shape,
                                              refs[oi].dtype)

                gs2 = pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=n_pf, grid=gs.grid,
                    in_specs=keep_specs, out_specs=gs.out_specs,
                    scratch_shapes=scratch)
                return orig_call(stub_kern, grid_spec=gs2,
                                 out_shape=out_shape,
                                 interpret=kw.get('interpret', False))(
                                     *pf, *keep)
            return wrapper
        return stub_call

    pe.pl.pallas_call = make_stub()
    time_eval('stub (all inputs)')
    pe.pl.pallas_call = make_stub(drop_views=True)
    time_eval('stub (views dropped)')
    pe.pl.pallas_call = make_stub(drop_views='6of9')
    time_eval('stub (6 of 9 views dropped)')
    pe.pl.pallas_call = make_stub(drop_all=True)
    time_eval('stub (dest+views dropped)')
    pe.pl.pallas_call = orig_call
    time_eval('real')


if __name__ == '__main__':
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.02)
