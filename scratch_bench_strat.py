"""On-chip measurement of the stratified variable-h win.

A 3D cloud with h-ratio 8 (70% fine particles in a dense ball, 30%
coarse background — the sedov/ADKE shape), SummationDensity, eval
time stratified vs single-level.  Distinct jit function objects per
variant (jax.jit's trace cache keys on function identity)."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from pysph_tpu.base.cell_grid import GridSpec
from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.sph.acceleration_eval import AccelerationEval
from pysph_tpu.sph.basic_equations import SummationDensity


def build(n=100_000, ratio=8.0, seed=3):
    rng = np.random.RandomState(seed)
    n_f = int(0.7 * n)
    n_c = n - n_f
    # fine ball of radius 0.25 at the center, coarse background in
    # the unit cube
    u = rng.normal(size=(3, n_f))
    u /= np.linalg.norm(u, axis=0)
    r = 0.25 * rng.uniform(size=n_f) ** (1 / 3)
    xf = 0.5 + u * r
    xc = rng.uniform(0, 1, size=(3, n_c))
    x = np.concatenate([xf, xc], axis=1)
    dx_f = 0.25 / (3 * n_f / (4 * np.pi)) ** (1 / 3) * 1.6
    h = np.concatenate([np.full(n_f, 1.2 * dx_f),
                        np.full(n_c, 1.2 * dx_f * ratio)])
    return get_particle_array(name='fluid', x=x[0], y=x[1], z=x[2],
                              h=h, m=np.ones(n), rho=np.ones(n))


def measure(pa, stratify, reps=10):
    kernel = CubicSpline(dim=3)
    a_eval = AccelerationEval(
        [pa], [SummationDensity('fluid', ['fluid'])], kernel)
    spec = GridSpec.from_particles(
        [pa], dim=3, radius_scale=kernel.radius_scale,
        stratify=stratify)
    a_eval.set_nnps(spec)
    states = {'fluid': pa.to_device()[0]}

    def run(s):
        out, diag = a_eval.update_and_compute(0.0, 1e-4, s)
        for k in ('cell_overflow', 'extent_overflow'):
            out['fluid']['rho'] = jnp.where(
                diag[k], jnp.nan, out['fluid']['rho'])
        return out
    f = jax.jit(run)
    out = f(states)
    rho = np.asarray(out['fluid']['rho'][:8])
    assert np.all(np.isfinite(rho)), 'overflow or nan'
    t0 = time.time()
    s = states
    for _ in range(reps):
        s = f(s)
    np.asarray(s['fluid']['rho'][:1])
    ms = (time.time() - t0) / reps * 1000
    info = dict(stratified=spec.stratified, dims=spec.dims,
                M=spec.capacities, ms=ms)
    if spec.stratified:
        info['fine_dims'] = spec.fine.dims
        info['fine_M'] = spec.fine.capacities
        info['pop_M'] = dict(spec.pop_capacities)
    return ms, info, np.asarray(out['fluid']['rho'])


if __name__ == '__main__':
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    pa = build(n=n)
    ms_f, info_f, rho_f = measure(pa, False)
    print('single-level:', info_f, flush=True)
    ms_s, info_s, rho_s = measure(pa, 'auto')
    print('stratified:  ', info_s, flush=True)
    n_act = pa.get_number_of_particles()
    rel = np.max(np.abs(rho_s[:n_act] - rho_f[:n_act]) /
                 np.maximum(1e-30, np.abs(rho_f[:n_act])))
    print('rel diff %.2e   speedup %.2fx (%.1f -> %.1f ms/eval)'
          % (rel, ms_f / ms_s, ms_f, ms_s), flush=True)
