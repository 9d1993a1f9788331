"""Breakdown of the resident step at dx=0.02 on the chip."""
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
n = sum(int(np.asarray(s['n_act'])) for s in states.values())
fdt = next(iter(states.values()))['x'].dtype
_, _, carry0 = jax.jit(lambda s: integ.initial_acceleration(s, 0.0, dt))(states)
runner = integ._res_runner
print('resident engaged:', runner not in (None, False), flush=True)

from pysph_tpu.ops.resident import PackStore, materialize

def force(x):
    leaves = jax.tree_util.tree_leaves(x)
    return np.asarray(leaves[0].reshape(-1)[:1])

def timeit(fn, *args, reps=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    return (time.time() - t0) / reps * 1000, out

packs0 = carry0[integ.PACKS_KEY] if hasattr(integ, 'PACKS_KEY') else carry0[-1]
handle0 = carry0[0]

# A: full step
step = jax.jit(lambda s, c: integ.step(s, 0.0, dt, c))
msA, _ = timeit(step, states, carry0)
print('A full step          %7.2f ms' % msA, flush=True)

# B: one full eval (pair + elementwise) on packs
def eval_once(states_, packs_, handle_):
    stores = {name: PackStore(runner.plan, name, ps, dict(states_[name]))
              for name, ps in packs_.items()}
    diag = runner.compute(0.0, dt, stores, handle_)
    return {n_: s.finalize_pack() for n_, s in stores.items()}, diag
evalj = jax.jit(eval_once)
msB, _ = timeit(evalj, states, packs0, handle0)
print('B eval (pair+elem)    %7.2f ms' % msB, flush=True)

# C: eval with pair kernels skipped (elementwise only)
import pysph_tpu.ops.resident as R
real_exec = R.execute_resident
def no_pair(plan, phases, dest, stores, rec, *a, **k):
    return {'block_overflow': jnp.asarray(False), 'window_overflow': jnp.asarray(False)}
R.execute_resident = no_pair
import importlib
evalj2 = jax.jit(eval_once)
msC, _ = timeit(evalj2, states, packs0, handle0)
R.execute_resident = real_exec
print('C eval elementwise    %7.2f ms' % msC, flush=True)

# D: ensure_fresh alone
freshj = jax.jit(lambda s, h, p: runner.ensure_fresh(s, h, p))
msD, _ = timeit(freshj, states, handle0, packs0)
print('D ensure_fresh        %7.2f ms' % msD, flush=True)

# E: prepare (bin + pack from flat)
prepj = jax.jit(lambda s: runner.prepare(s))
msE, _ = timeit(prepj, states)
print('E bin+pack (rebuild)  %7.2f ms' % msE, flush=True)

# F: materialize (fold to flat)
matj = jax.jit(lambda s, p: materialize(runner.plan, s, p))
msF, _ = timeit(matj, states, packs0)
print('F materialize         %7.2f ms' % msF, flush=True)
print('n=%d  step=%.1f  2*eval=%.1f  fresh=%.1f  rest(steppers+wrap)=%.1f'
      % (n, msA, 2*msB, msD, msA - 2*msB - msD), flush=True)
