"""A/B pallas vs XLA on taylor_green (periodic, ghosts) on TPU."""
import sys
import numpy as np
import jax

sys.argv = ['taylor_green', '--max-steps', '0', '--disable-output']
from pysph_tpu.config import get_config
from pysph_tpu.examples.taylor_green import TaylorGreen


def run(use_pallas, steps=30):
    get_config().use_pallas = use_pallas
    app = TaylorGreen()
    app.setup(sys.argv[1:])
    solver = app.solver
    integ = solver.integrator
    states = solver.states
    t, dt = 0.0, float(solver.dt)
    s2, diag, carry = jax.jit(integ.step)(states, t, dt)
    stepj = jax.jit(lambda s, c: integ.step(s, t, dt, c)[::2])
    s, c = s2, carry
    for _ in range(steps - 1):
        s, c = stepj(s, c)
    return {k: np.asarray(s['fluid'][k]) for k in
            ('x', 'y', 'u', 'rho', 'p')}


a = run(True)
b = run(False)
for k in a:
    scale = max(1e-30, float(np.max(np.abs(b[k]))))
    rel = float(np.max(np.abs(a[k] - b[k]))) / scale
    print('%-4s relLinf %.3g' % (k, rel))
