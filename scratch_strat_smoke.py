"""CPU smoke: stratified vs single-level vs brute-force oracle on a
wide-h cloud (SummationDensity)."""
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

from pysph_tpu.base.cell_grid import GridSpec
from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.sph.acceleration_eval import AccelerationEval
from pysph_tpu.sph.basic_equations import SummationDensity
from pysph_tpu.config import get_config
get_config().use_double = True
get_config().use_pallas = True

rng = np.random.RandomState(7)
n = 400
dim = 2
x = rng.uniform(0, 1, n)
y = rng.uniform(0, 1, n)
# wide h: dense fine cluster + sparse coarse background (ratio 8)
h = np.where(rng.uniform(size=n) < 0.7, 0.02, 0.16)
m = rng.uniform(0.5, 1.5, n)
pa = get_particle_array(name='fluid', x=x, y=y, h=h, m=m,
                        rho=np.ones(n))
kernel = CubicSpline(dim=dim)

def run(stratify):
    a_eval = AccelerationEval([pa], [SummationDensity('fluid',
                                                      ['fluid'])],
                              kernel)
    spec = GridSpec.from_particles([pa], dim=dim,
                                   radius_scale=kernel.radius_scale,
                                   stratify=stratify)
    print('stratify=%s: dims=%s M=%s h_split=%s fine_dims=%s fine_M=%s'
          % (stratify, spec.dims, spec.capacities, spec.h_split,
             None if spec.fine is None else spec.fine.dims,
             None if spec.fine is None else spec.fine.capacities),
          flush=True)
    a_eval.set_nnps(spec)
    states = {'fluid': pa.to_device()[0]}
    out, diag = jax.jit(lambda s: a_eval.update_and_compute(
        0.0, 0.1, s))(states)
    for k in ('cell_overflow', 'extent_overflow'):
        assert not bool(diag[k]), (k, diag)
    return np.asarray(out['fluid']['rho'])[:n]

rho_strat = run('auto')
rho_flat = run(False)

# brute force oracle
rs = kernel.radius_scale
rho_ref = np.zeros(n)
for i in range(n):
    dx = x[i] - x
    dy = y[i] - y
    r = np.sqrt(dx * dx + dy * dy)
    sup = rs * np.maximum(h[i], h)
    sel = r < sup
    for j in np.where(sel)[0]:
        rho_ref[i] += m[j] * float(kernel.kernel(rij=r[j],
                                                 h=0.5 * (h[i] + h[j])))

err_s = np.abs(rho_strat - rho_ref).max()
err_f = np.abs(rho_flat - rho_ref).max()
err_sf = np.abs(rho_strat - rho_flat).max()
print('max|strat-oracle| = %.3e' % err_s)
print('max|flat -oracle| = %.3e' % err_f)
print('max|strat-flat  | = %.3e' % err_sf)
assert err_s < 1e-10 and err_f < 1e-10 and err_sf < 1e-12
print('OK')
