"""Fine-grained: where do the 34 ms of elementwise pack phases go?"""
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
for name, ap in plan.arrays.items():
    ps = packs0[name]
    print('%-9s A=%4d n_a=%4d R=%3d M=%3d P=%2d pack=%s (%.1f MB) slots/particle=%.1f'
          % (name, ap.A, int(np.asarray(ps.n_a)), ps.pack.shape[1], ap.M,
             len(ap.planes), ps.pack.shape,
             np.prod(ps.pack.shape)*4/1e6,
             np.prod(ps.pack.shape[:2])*ap.M / max(1, int(np.asarray(states[name]['n_act'])))),
          flush=True)

from pysph_tpu.ops.resident import PackStore

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

# 1: finalize_pack after dirtying ONE plane (fluid)
def one_dirty(packs):
    st = PackStore(plan, 'fluid', packs['fluid'], dict(states['fluid']))
    st['p'] = st['p'] * 1.0001
    return st.finalize_pack().pack
print('finalize 1-dirty      %7.2f ms' % timeit(jax.jit(one_dirty), packs0), flush=True)

# 2: read all planes + sum (pure read traffic)
def read_all(packs):
    st = PackStore(plan, 'fluid', packs['fluid'], dict(states['fluid']))
    tot = 0.0
    for p in plan.arrays['fluid'].planes:
        tot = tot + jnp.sum(st[p])
    return tot
print('read-all-planes       %7.2f ms' % timeit(jax.jit(read_all), packs0), flush=True)

# 3: per-group elementwise: run runner.compute with pair AND post_loop skipped vs full elementwise
import pysph_tpu.ops.resident as R
real_exec = R.execute_resident
R.execute_resident = lambda *a, **k: {'block_overflow': jnp.asarray(False), 'window_overflow': jnp.asarray(False)}

def eval_elem(packs):
    stores = {n_: PackStore(plan, n_, ps, dict(states[n_])) for n_, ps in packs.items()}
    runner.compute(0.0, dt, stores, handle0)
    return {n_: s.finalize_pack().pack for n_, s in stores.items()}
print('eval elementwise      %7.2f ms' % timeit(jax.jit(eval_elem), packs0), flush=True)

# 4: initialize-only (skip post_loop too)
import pysph_tpu.sph.acceleration_eval as AE
real_bind = AE._bind_particle_phase
count = {'n': 0}
def count_bind(fn, *a, **k):
    count['n'] += 1
    return real_bind(fn, *a, **k)
AE._bind_particle_phase = count_bind
R_bind = R  # resident imports _bind_particle_phase inside compute from AE
out = jax.jit(eval_elem)(packs0); force(out)
print('bind calls per eval: ~%d' % count['n'], flush=True)
AE._bind_particle_phase = real_bind
R.execute_resident = real_exec
