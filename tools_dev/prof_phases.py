"""Split dam_break_3d group-1 timing by dest phase, and separate
pack-build from kernel compute via a pallas stub."""
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
    from pysph_tpu.sph.equation import Group
    from pysph_tpu.utils.packing import make_packer

    app = DamBreak3D()
    app.setup(['--dx', str(dx), '--max-steps', '0', '--disable-output'])
    solver = app.solver
    integ = solver.integrator
    states = solver.states
    dt = float(solver.dt)
    a_eval = integ.acceleration_evals[0]
    handle, _ = jax.jit(a_eval.prepare)(states)

    g1 = a_eval.groups[1]
    eqs = list(g1.equations)
    by_dest = {}
    for e in eqs:
        by_dest.setdefault(e.dest, []).append(e)

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
        print('%-34s %7.2f ms' % (label, t))
        a_eval.groups = all_groups
        return t

    for dest, des in by_dest.items():
        time_groups([Group(equations=des)], 'g1[%s]' % dest)

    # stub the pallas kernel: same inputs/outputs, no compute
    import pysph_tpu.ops.pallas_engine as pe
    import jax.experimental.pallas as pl
    orig_call = pl.pallas_call

    def stub_call(kern, *a, **kw):
        grid_spec = kw.get('grid_spec')
        out_shape = kw['out_shape']

        n_scratch = len(getattr(grid_spec, 'scratch_shapes', ()) or ())
        oi = -1 - n_scratch

        def stub_kern(*refs):
            refs[oi][...] = jnp.zeros(refs[oi].shape, refs[oi].dtype)

        return orig_call(stub_kern, grid_spec=grid_spec,
                         out_shape=out_shape,
                         interpret=kw.get('interpret', False))

    def skip_call(kern, *a, **kw):
        out_shape = kw['out_shape']

        def run(*args):
            return jnp.zeros(out_shape.shape, out_shape.dtype)

        return run

    pe.pl.pallas_call = stub_call
    time_groups(all_groups, 'all (kernel stubbed, DMA paid)')
    pe.pl.pallas_call = skip_call
    time_groups(all_groups, 'all (no pallas at all)')
    pe.pl.pallas_call = orig_call
    time_groups(all_groups, 'all (real)')


if __name__ == '__main__':
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.02)
