"""Per-phase pair-kernel cost + K scaling at dx=0.02 (on chip)."""
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
print('window_caps:', spec.window_caps, flush=True)

from pysph_tpu.ops.resident import PackStore, execute_resident

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

geometry = (handle0.origin, handle0.widths)
phase_list = list(runner._walk_groups())
for gi, (group, dest, eqs_by_src) in enumerate(phase_list):
    rec = runner._recs.get((id(group), dest))
    if rec is None or not rec.out_ops:
        continue
    srcs = [s for s, _ in eqs_by_src]
    def run_phase(packs, group=group, dest=dest, eqs_by_src=eqs_by_src, rec=rec):
        stores = {n_: PackStore(plan, n_, ps, dict(states[n_])) for n_, ps in packs.items()}
        execute_resident(plan, eqs_by_src, dest, stores, rec,
                         a_eval.kernel, a_eval.domain, spec.radius_scale,
                         group.real, 0.0, dt, geometry)
        return stores[dest].finalize_pack().pack
    ms = timeit(jax.jit(run_phase), packs0)
    print('phase g%d dest=%-9s srcs=%-28s out=%s  %7.2f ms'
          % (gi, dest, ','.join(srcs), ','.join(rec.out_ops), ms), flush=True)
