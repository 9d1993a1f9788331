"""Interleaved K x {full, mask} matrix for the fluid resident phase
(single process, alternating reps to cancel tunnel noise)."""
import os, sys, time
import numpy as np
os.environ['PYSPH_TPU_RESIDENT'] = '1'
import jax, jax.numpy as jnp
from pysph_tpu.config import get_config
get_config().use_pallas = True
from pysph_tpu.examples.dam_break_3d import DamBreak3D
argv = sys.argv; sys.argv = ['bench']
app = DamBreak3D()
app.setup(['--dx', '0.02', '--max-steps', '0', '--disable-output'])
sys.argv = argv
solver = app.solver; integ = solver.integrator; states = solver.states
dt = float(solver.dt)
_, _, carry0 = jax.jit(lambda s: integ.initial_acceleration(s, 0.0, dt))(states)
runner = integ._res_runner
plan = runner.plan
packs0 = carry0[-1]; handle0 = carry0[0]
a_eval = runner.a_eval
spec = a_eval.grid_spec

from pysph_tpu.ops.resident import PackStore, execute_resident
import pysph_tpu.ops.resident as RES

def force(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])

target = None
for gi, (group, dest, eqs_by_src) in enumerate(runner._walk_groups()):
    rec = runner._recs.get((id(group), dest))
    if rec is None or not rec.out_ops:
        continue
    if dest == 'fluid':
        target = (group, dest, eqs_by_src, rec)
group, dest, eqs_by_src, rec = target
geometry = (handle0.origin, handle0.widths)

def run_phase(packs):
    stores = {n_: PackStore(plan, n_, ps, dict(states[n_]))
              for n_, ps in packs.items()}
    execute_resident(plan, eqs_by_src, dest, stores, rec,
                     a_eval.kernel, a_eval.domain, spec.radius_scale,
                     group.real, 0.0, dt, geometry)
    return stores[dest].finalize_pack().pack

real_run = RES._run_eqs
def mask_only(eqs, ctx, t, dt):
    pm = ctx.pair_maskf
    ctx.runner.accumulate('arho', 'sum', jnp.sum(pm, axis=-1))

base_caps = dict(spec.window_caps)
fns = {}
for K in (384, 768):
    for m in ('full', 'mask'):
        spec.window_caps = {k: K for k in base_caps}
        RES._run_eqs = mask_only if m == 'mask' else real_run
        f = jax.jit(run_phase)
        force(f(packs0))  # compile under the right monkeypatch
        fns[(K, m)] = f
RES._run_eqs = real_run
spec.window_caps = dict(base_caps)

# interleave 8 rounds
acc = {k: 0.0 for k in fns}
for r in range(6):
    for k, f in fns.items():
        t0 = time.time()
        for _ in range(5):
            out = f(packs0)
        force(out)
        acc[k] += time.time() - t0
for k in sorted(acc):
    print('K=%4d %-5s %7.2f ms' % (k[0], k[1], acc[k]/30*1000),
          flush=True)
