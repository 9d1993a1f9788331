"""Stratified variable-h engine tests (reference capability:
base/stratified_sfc_nnps.pyx, base/z_order_nnps.pyx ExtendedZOrder).

Wide-h populations split at h_split into fine/coarse sub-grids; pair
phases decompose into three launches that partition the pairs.  The
result must match both the brute-force oracle and the single-level
engine bit-for-bit in f64."""

import jax
import numpy as np
import pytest

from pysph_tpu.base.cell_grid import GridSpec
from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.config import get_config
from pysph_tpu.sph.acceleration_eval import AccelerationEval
from pysph_tpu.sph.basic_equations import SummationDensity


def _wide_h_cloud(n=400, dim=2, ratio=8.0, seed=7):
    rng = np.random.RandomState(seed)
    x = rng.uniform(0, 1, n)
    y = rng.uniform(0, 1, n) if dim >= 2 else np.zeros(n)
    z = rng.uniform(0, 1, n) if dim >= 3 else np.zeros(n)
    h = np.where(rng.uniform(size=n) < 0.7, 0.02, 0.02 * ratio)
    m = rng.uniform(0.5, 1.5, n)
    return get_particle_array(name='fluid', x=x, y=y, z=z, h=h, m=m,
                              rho=np.ones(n))


def _oracle_rho(pa, kernel):
    n = pa.get_number_of_particles()
    x, y, z = (np.asarray(pa.x), np.asarray(pa.y), np.asarray(pa.z))
    h, m = np.asarray(pa.h), np.asarray(pa.m)
    rs = kernel.radius_scale
    rho = np.zeros(n)
    for i in range(n):
        r = np.sqrt((x[i] - x) ** 2 + (y[i] - y) ** 2 +
                    (z[i] - z) ** 2)
        sup = rs * np.maximum(h[i], h)
        for j in np.where(r < sup)[0]:
            rho[i] += m[j] * float(kernel.kernel(
                rij=r[j], h=0.5 * (h[i] + h[j])))
    return rho


def _run_summation(pa, dim, stratify, use_pallas=False):
    kernel = CubicSpline(dim=dim)
    cfg = get_config()
    old = cfg._use_pallas
    try:
        if use_pallas:
            cfg.use_pallas = True
        a_eval = AccelerationEval(
            [pa], [SummationDensity('fluid', ['fluid'])], kernel)
        spec = GridSpec.from_particles(
            [pa], dim=dim, radius_scale=kernel.radius_scale,
            stratify=stratify)
        a_eval.set_nnps(spec)
        states = {'fluid': pa.to_device()[0]}
        out, diag = jax.jit(lambda s: a_eval.update_and_compute(
            0.0, 0.1, s))(states)
        assert not bool(diag['cell_overflow'])
        assert not bool(diag['extent_overflow'])
        n = pa.get_number_of_particles()
        return np.asarray(out['fluid']['rho'])[:n], spec
    finally:
        cfg._use_pallas = old


@pytest.mark.parametrize('dim', [2, 3])
def test_stratified_matches_oracle(dim):
    pa = _wide_h_cloud(n=300 if dim == 3 else 400, dim=dim)
    kernel = CubicSpline(dim=dim)
    rho_s, spec = _run_summation(pa, dim, stratify='auto')
    assert spec.stratified, 'wide-h cloud must stratify'
    rho_ref = _oracle_rho(pa, kernel)
    np.testing.assert_allclose(rho_s, rho_ref, rtol=1e-10, atol=1e-12)


def test_stratified_matches_single_level():
    pa = _wide_h_cloud()
    rho_s, spec_s = _run_summation(pa, 2, stratify='auto')
    rho_f, spec_f = _run_summation(pa, 2, stratify=False)
    assert spec_s.stratified and not spec_f.stratified
    np.testing.assert_allclose(rho_s, rho_f, rtol=1e-12, atol=1e-14)


def test_stratified_pallas_path():
    """The pallas engine (interpret mode on CPU) over population
    layouts must agree with the oracle."""
    pa = _wide_h_cloud()
    kernel = CubicSpline(dim=2)
    rho_s, spec = _run_summation(pa, 2, stratify='auto',
                                 use_pallas=True)
    assert spec.stratified
    rho_ref = _oracle_rho(pa, kernel)
    np.testing.assert_allclose(rho_s, rho_ref, rtol=1e-10, atol=1e-12)


def test_uniform_h_does_not_stratify():
    """L=1: narrow h range keeps today's single-level grid."""
    rng = np.random.RandomState(3)
    n = 100
    pa = get_particle_array(
        name='fluid', x=rng.uniform(0, 1, n), y=rng.uniform(0, 1, n),
        h=np.full(n, 0.05), m=np.ones(n), rho=np.ones(n))
    _rho, spec = _run_summation(pa, 2, stratify='auto')
    assert not spec.stratified


@pytest.mark.slow
def test_two_array_cross_sources():
    """dest<-other-array pair phases decompose correctly too."""
    rng = np.random.RandomState(11)
    n = 200
    kernel = CubicSpline(dim=2)
    pa1 = _wide_h_cloud(n=n, seed=11)
    pa2 = get_particle_array(
        name='solid', x=rng.uniform(0, 1, n), y=rng.uniform(0, 1, n),
        h=np.where(rng.uniform(size=n) < 0.5, 0.02, 0.16),
        m=np.ones(n), rho=np.ones(n))

    def run(stratify):
        a_eval = AccelerationEval(
            [pa1, pa2],
            [SummationDensity('fluid', ['fluid', 'solid'])], kernel)
        spec = GridSpec.from_particles(
            [pa1, pa2], dim=2, radius_scale=kernel.radius_scale,
            stratify=stratify)
        a_eval.set_nnps(spec)
        states = {'fluid': pa1.to_device()[0],
                  'solid': pa2.to_device()[0]}
        out, diag = jax.jit(lambda s: a_eval.update_and_compute(
            0.0, 0.1, s))(states)
        assert not bool(diag['cell_overflow'])
        return np.asarray(out['fluid']['rho'])[:n], spec

    rho_s, spec = run('auto')
    assert spec.stratified
    rho_f, _ = run(False)
    np.testing.assert_allclose(rho_s, rho_f, rtol=1e-12, atol=1e-14)


@pytest.mark.slow
def test_reuse_goes_stale_when_h_crosses_split():
    """A fine-population particle whose h grows past h_split must
    invalidate the binning (its support no longer fits the fine
    stencil)."""
    pa = _wide_h_cloud()
    kernel = CubicSpline(dim=2)
    a_eval = AccelerationEval(
        [pa], [SummationDensity('fluid', ['fluid'])], kernel)
    spec = GridSpec.from_particles(
        [pa], dim=2, radius_scale=kernel.radius_scale)
    assert spec.stratified
    a_eval.set_nnps(spec)
    states = {'fluid': pa.to_device()[0]}
    handle, diag = a_eval.prepare(states)

    # untouched states: reuse keeps the handle (same object structure,
    # traced cond -> compare a layout leaf)
    h2, _ = a_eval.prepare_reuse(states, handle)
    assert np.array_equal(
        np.asarray(h2.layouts['fluid'].slot_to_particle),
        np.asarray(handle.layouts['fluid'].slot_to_particle))

    # grow one fine particle's h past h_split: the rebuilt binning
    # must classify it as coarse
    import jax.numpy as jnp
    s = dict(states['fluid'])
    h = np.asarray(s['h']).copy()
    fine_idx = int(np.argmin(h))
    h[fine_idx] = spec.h_split * 1.5
    s['h'] = jnp.asarray(h)
    states2 = {'fluid': s}
    h3, _ = a_eval.prepare_reuse(states2, handle)
    lf = h3.strata['fluid']['f']
    n_fs = lf.slot_to_particle.shape[0]
    assert int(np.asarray(lf.particle_to_slot)[fine_idx]) >= n_fs, \
        'particle with h > h_split still in the fine layout'
