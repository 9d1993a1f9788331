"""Sweep the dominant fluid<-fluid,boundary,obstacle resident phase
at dam_break_3d dx=0.02: K caps, union on/off, and a mask-only body
to split window-build cost from pair-compute cost."""
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
print('dims=%s caps=%s fracs=%s wcaps=%s' % (
    spec.dims, spec.capacities or spec.cell_capacity, spec.block_fracs,
    spec.window_caps), flush=True)
for name, ap in plan.arrays.items():
    print('  %-9s M=%d A=%d planes=%d n_src=%d' %
          (name, ap.M, ap.A, len(ap.planes), ap.n_src), flush=True)

from pysph_tpu.ops.resident import PackStore, execute_resident
import pysph_tpu.ops.resident as RES

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

# locate the fluid phase
target = None
for gi, (group, dest, eqs_by_src) in enumerate(runner._walk_groups()):
    rec = runner._recs.get((id(group), dest))
    if rec is None or not rec.out_ops:
        continue
    if dest == 'fluid':
        target = (group, dest, eqs_by_src, rec)
print('fluid phase outs:', list(target[3].out_ops), flush=True)
group, dest, eqs_by_src, rec = target
geometry = (handle0.origin, handle0.widths)

def run_phase(packs):
    stores = {n_: PackStore(plan, n_, ps, dict(states[n_]))
              for n_, ps in packs.items()}
    execute_resident(plan, eqs_by_src, dest, stores, rec,
                     a_eval.kernel, a_eval.domain, spec.radius_scale,
                     group.real, 0.0, dt, geometry)
    return stores[dest].finalize_pack().pack

base_caps = dict(spec.window_caps)
for K in (384, 512, 640, 768):
    spec.window_caps = {k: K for k in base_caps}
    ms = timeit(jax.jit(run_phase), packs0)
    print('K=%4d   %7.2f ms' % (K, ms), flush=True)
spec.window_caps = dict(base_caps)

os.environ['PYSPH_TPU_UNION'] = '0'
ms = timeit(jax.jit(lambda p: run_phase(p)), packs0)
print('union=0  %7.2f ms' % ms, flush=True)
os.environ['PYSPH_TPU_UNION'] = 'auto'

# mask-only: stub _run_eqs to accumulate just the pair mask into arho
real_run = RES._run_eqs
def mask_only(eqs, ctx, t, dt):
    pm = ctx.pair_maskf
    ctx.runner.accumulate('arho', 'sum', jnp.sum(pm, axis=-1))
RES._run_eqs = mask_only
ms = timeit(jax.jit(lambda p: run_phase(p)), packs0)
print('mask-only (window build + R2IJ + reduce)  %7.2f ms' % ms,
      flush=True)
RES._run_eqs = real_run
