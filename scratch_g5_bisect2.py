"""Kernel-internal bisection with CHAINED inputs (each call consumes
the previous call's output so the axon server can't serve cached
results): floor / window / full / nopack variants of the fluid
resident phase, interleaved."""
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

def phase_step(packs):
    """Run the phase and CHAIN: perturb the dest pack into the input
    of the next call (nonzero work every call)."""
    stores = {n_: PackStore(plan, n_, ps, dict(states[n_]))
              for n_, ps in packs.items()}
    execute_resident(plan, eqs_by_src, dest, stores, rec,
                     a_eval.kernel, a_eval.domain, spec.radius_scale,
                     group.real, 0.0, dt, geometry)
    ps = stores[dest].finalize_pack()
    out = dict(packs)
    # fold the accumulated outputs back in but keep positions bounded:
    # scale the whole pack toward the original by 1e-30 of the result
    newpack = packs[dest].pack + 1e-30 * ps.pack
    out[dest] = packs[dest]._replace(pack=newpack)
    return out

base_caps = dict(spec.window_caps)
fns = {}
for label, dbg, K in (('floor', 'floor', 0), ('window', 'window', 0),
                      ('full', '', 0), ('nopack', '', 896)):
    RES._DEBUG = dbg
    if K:
        spec.window_caps = {k: K for k in base_caps}
    f = jax.jit(phase_step)
    force(f(packs0))
    fns[label] = f
    spec.window_caps = dict(base_caps)
RES._DEBUG = ''

acc = {k: 0.0 for k in fns}
for r in range(6):
    for k, f in fns.items():
        p = packs0
        t0 = time.time()
        for _ in range(5):
            p = f(p)
        force(p)
        acc[k] += time.time() - t0
for k in ('floor', 'window', 'full', 'nopack'):
    print('%-7s %7.2f ms' % (k, acc[k]/30*1000), flush=True)
