"""Round-5 STEP-level decomposition on dam_break_3d (resident mode):
where do the ~11 ms/step outside the two evals go?

Interleaved same-process variants (fresh jit per variant, compiled
while its monkeypatch is active — see PERF_NOTES "Measurement traps"):

- full    : normal EPEC step
- nofresh : ensure_fresh stubbed to identity (Verlet check cost)
- noeval  : compute_accelerations stubbed out (stages+domain only)
- onlyeval: stages stubbed out (evals + ensure_fresh only)

Run: python tools_dev/prof_step.py [dx]
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
    from pysph_tpu.ops.resident import ResidentRunner
    from pysph_tpu.sph.integrator import Integrator
    from pysph_tpu.utils.packing import make_packer

    app = DamBreak3D()
    app.setup(['--dx', str(dx), '--max-steps', '0',
               '--disable-output'])
    solver = app.solver
    integ = solver.integrator
    states = solver.states
    dt = float(solver.dt)
    fdt = next(iter(states.values()))['x'].dtype

    import jax.numpy as jnp
    _, _, carry0 = jax.jit(
        lambda s: integ.initial_acceleration(s, 0.0, dt))(states)
    t0a = jnp.asarray(0.0, dtype=fdt)
    pack, unpack = make_packer((states, t0a, carry0))
    N = 10

    orig_compute = Integrator.compute_accelerations
    orig_stage = Integrator._run_stage
    orig_fresh = ResidentRunner.ensure_fresh

    def patched(variant):
        if variant == 'nofresh':
            def nf(self, states, handle, packs):
                from pysph_tpu.sph.acceleration_eval import empty_diag
                return states, handle, packs, empty_diag()
            ResidentRunner.ensure_fresh = nf
        elif variant == 'noeval':
            Integrator.compute_accelerations = \
                lambda self, index=0, update_nnps=True: None
        elif variant == 'onlyeval':
            Integrator._run_stage = lambda self, name: None

    def restore():
        Integrator.compute_accelerations = orig_compute
        Integrator._run_stage = orig_stage
        ResidentRunner.ensure_fresh = orig_fresh

    def build(variant):
        patched(variant)

        @jax.jit
        def run(blob):
            def body(carry, _):
                s, t, nnps = carry
                s, _d, nnps = integ.step(s, t, dt, nnps)
                return (s, t + dt, nnps), 0
            carry, _ = jax.lax.scan(body, unpack(blob), None,
                                    length=N)
            return pack(carry)

        blob = pack((states, t0a, carry0))
        t0 = time.time()
        force(run(blob))  # compile while the patch is active
        print('compiled %-9s in %.1fs' % (variant, time.time() - t0),
              flush=True)
        restore()
        return run, blob

    variants = ['full', 'nofresh', 'noeval', 'onlyeval']
    runs = {}
    blob = None
    for v in variants:
        runs[v], blob = build(v)
    outs = {}
    for rep in range(4):
        for v in variants:
            fn = runs[v]
            b = blob
            t0 = time.time()
            for _ in range(2):
                b = fn(b)
            force(b)
            t = (time.time() - t0) / 2 / N * 1e3
            outs.setdefault(v, []).append(t)
            print('rep%d %-9s %7.2f ms/step' % (rep, v, t),
                  flush=True)
    print()
    med = {v: sorted(ts)[len(ts) // 2] for v, ts in outs.items()}
    for v in variants:
        print('%-9s median %7.2f ms/step' % (v, med[v]))
    print('ensure_fresh  (full-nofresh)   %7.2f' %
          (med['full'] - med['nofresh']))
    print('stages        (full-onlyeval)  %7.2f' %
          (med['full'] - med['onlyeval']))
    print('evals+fresh   (full-noeval)    %7.2f' %
          (med['full'] - med['noeval']))


if __name__ == '__main__':
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.02)
