"""Smoke: one resident step on the chip, with stage timing."""
import os, sys, time
import numpy as np
os.environ['PYSPH_TPU_RESIDENT'] = '1'
import jax, jax.numpy as jnp
from pysph_tpu.config import get_config
get_config().use_pallas = True
from pysph_tpu.examples.dam_break_3d import DamBreak3D
argv = sys.argv; sys.argv = ['bench']
t0 = time.time()
app = DamBreak3D()
app.setup(['--dx', str(float(os.environ.get('DX', '0.04'))), '--max-steps', '0', '--disable-output'])
sys.argv = argv
print('setup %.1fs' % (time.time() - t0), flush=True)
solver = app.solver; integ = solver.integrator; states = solver.states
dt = float(solver.dt)
n = sum(int(np.asarray(s['n_act'])) for s in states.values())
print('n=%d' % n, flush=True)
t0 = time.time()
_, _, carry0 = jax.jit(lambda s: integ.initial_acceleration(s, 0.0, dt))(states)
np.asarray(carry0[0].origin[:1]) if hasattr(carry0.get(0, None), 'origin') else None
print('init_accel compile+run %.1fs; resident=%s' % (time.time() - t0, integ._res_runner not in (None, False)), flush=True)
fdt = next(iter(states.values()))['x'].dtype
step = jax.jit(lambda s, t, c: integ.step(s, t, dt, c))
t0 = time.time()
s1, d1, c1 = step(states, jnp.asarray(0.0, fdt), carry0)
np.asarray(s1['fluid']['x'][:1])
print('step compile+run %.1fs' % (time.time() - t0), flush=True)
# timed: 20 steps
t = jnp.asarray(0.0, fdt)
s, c = s1, c1
start = time.time()
N = 20
for i in range(N):
    s, d, c = step(s, t, c)
    t = t + dt
np.asarray(s['fluid']['x'][:1])
wall = time.time() - start
print('eager-loop %.1f ms/step  %.3g psps' % (1000*wall/N, n*N/wall), flush=True)
sm = jax.jit(lambda s, c: integ.materialize_states(s, c))(s, c)
assert np.all(np.isfinite(np.asarray(sm['fluid']['x'])))
print('finite ok', flush=True)
