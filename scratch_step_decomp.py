"""Same-process chained decomposition of the resident dam_break_3d
step at dx=0.02: full step, per-pair-phase, elementwise-only eval,
ensure_fresh, steppers."""
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
plan = runner.plan
packs0 = carry0[-1]; handle0 = carry0[0]
a_eval = runner.a_eval
spec = a_eval.grid_spec
from pysph_tpu.ops.resident import PackStore, execute_resident
import pysph_tpu.ops.resident as RES

def force(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])

def chain_time(f, x0, label, reps=15):
    x = x0
    f(x) and None
    x = f(x)          # warm twice
    force(x)
    t0 = time.time()
    x = x0
    for _ in range(reps):
        x = f(x)
    force(x)
    ms = (time.time() - t0) / reps * 1000
    print('%-28s %8.2f ms' % (label, ms), flush=True)
    return ms

# 1) full step (chained on its own carry)
step = jax.jit(lambda sc: integ.step(sc[0], 0.0, dt, sc[1])[0::2])
ms_step = chain_time(lambda sc: tuple(step(sc)), (states, carry0),
                     'full step')

# 2) full eval on packs (pair + elementwise), chained
geometry = (handle0.origin, handle0.widths)

def eval_chain(packs):
    stores = {n_: PackStore(plan, n_, ps, dict(states[n_]))
              for n_, ps in packs.items()}
    runner.compute(0.0, dt, stores, handle0)
    out = {}
    for n_, st in stores.items():
        ps = st.finalize_pack()
        out[n_] = packs[n_]._replace(
            pack=packs[n_].pack + 1e-30 * ps.pack)
    return out
ms_eval = chain_time(jax.jit(eval_chain), packs0, 'eval (pair+elem)')

# 3) per pair phase, chained
for gi, (group, dest, eqs_by_src) in enumerate(runner._walk_groups()):
    rec = runner._recs.get((id(group), dest))
    if rec is None or not rec.out_ops:
        continue
    def phase_chain(packs, group=group, dest=dest,
                    eqs_by_src=eqs_by_src, rec=rec):
        stores = {n_: PackStore(plan, n_, ps, dict(states[n_]))
                  for n_, ps in packs.items()}
        execute_resident(plan, eqs_by_src, dest, stores, rec,
                         a_eval.kernel, a_eval.domain,
                         spec.radius_scale, group.real, 0.0, dt,
                         geometry)
        ps = stores[dest].finalize_pack()
        out = dict(packs)
        out[dest] = packs[dest]._replace(
            pack=packs[dest].pack + 1e-30 * ps.pack)
        return out
    chain_time(jax.jit(phase_chain), packs0,
               'phase g%d %s<-%s' % (gi, dest,
                                     ','.join(s for s, _ in eqs_by_src)))

# 4) elementwise-only eval (pair kernels stubbed)
real_exec = RES.execute_resident
RES.execute_resident = lambda *a, **k: {
    'block_overflow': jnp.asarray(False),
    'window_overflow': jnp.asarray(False)}
ms_elem = chain_time(jax.jit(eval_chain), packs0, 'eval elementwise only')
RES.execute_resident = real_exec

# 5) ensure_fresh chained
def fresh_chain(arg):
    st, h, p = arg
    st2, h2, p2, diag = runner.ensure_fresh(st, h, p)
    return (st2, h2, p2)
ms_fresh = chain_time(jax.jit(fresh_chain), (states, handle0, packs0),
                      'ensure_fresh')
print('n=%d  step=%.1f  2*eval=%.1f  fresh=%.1f  rest=%.1f'
      % (n, ms_step, 2*ms_eval, ms_fresh,
         ms_step - 2*ms_eval - ms_fresh), flush=True)
