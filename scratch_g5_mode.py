"""Measure ONE variant of the fluid resident phase (fresh process per
variant; cross-trace equation-object caches make in-process sweeps of
structural knobs unreliable).  Usage:
    python scratch_g5_mode.py full|mask|union0|nophys [K]
"""
import os, sys, time
import numpy as np
os.environ['PYSPH_TPU_RESIDENT'] = '1'
mode = sys.argv[1] if len(sys.argv) > 1 else 'full'
K_override = int(sys.argv[2]) if len(sys.argv) > 2 else 0
if mode == 'union0':
    os.environ['PYSPH_TPU_UNION'] = '0'
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
if K_override:
    spec.window_caps = {k: K_override for k in spec.window_caps}

from pysph_tpu.ops.resident import PackStore, execute_resident
import pysph_tpu.ops.resident as RES

if mode == 'mask':
    def mask_only(eqs, ctx, t, dt):
        pm = ctx.pair_maskf
        ctx.runner.accumulate('arho', 'sum', jnp.sum(pm, axis=-1))
    RES._run_eqs = mask_only

def force(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])

def timeit(fn, *args, reps=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    return (time.time() - t0)/reps*1000

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

ms = timeit(jax.jit(run_phase), packs0)
print('%s K=%s: %7.2f ms' % (mode, K_override or 'default', ms),
      flush=True)
