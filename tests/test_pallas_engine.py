"""Parity tests for the pallas pair-phase executor
(ops/pallas_engine.py): the same AccelerationEval must produce the
same accelerations with the pallas kernel (interpret mode) as with
the XLA roll engine."""

import numpy as np
import pytest

from pysph_tpu.config import get_config


def _make_eval(dim, pas, equations, kernel, domain=None):
    from pysph_tpu.base.cell_grid import GridSpec
    from pysph_tpu.sph.acceleration_eval import AccelerationEval
    a_eval = AccelerationEval(pas, equations, kernel, domain=domain)
    a_eval.set_nnps(GridSpec.from_particles(
        pas, dim=dim, radius_scale=kernel.radius_scale,
        domain=domain))
    return a_eval


def _run(a_eval, states):
    import jax
    out, _ = jax.jit(
        lambda s: a_eval.update_and_compute(0.1, 1e-4, s))(states)
    return out


def _compare(dim, pas, equations, kernel, props, domain=None):
    states = {}
    for pa in pas:
        state, _ = pa.to_device()
        states[pa.name] = state
    cfg = get_config()
    a_eval = _make_eval(dim, pas, equations, kernel, domain)
    assert not cfg.use_pallas
    ref = _run(a_eval, states)
    cfg.use_pallas = True
    try:
        got = _run(_make_eval(dim, pas, equations, kernel, domain),
                   states)
    finally:
        cfg.use_pallas = False
    for name in ref:
        for p in props:
            if p not in ref[name]:
                continue
            a = np.asarray(ref[name][p])
            b = np.asarray(got[name][p])
            scale = max(np.abs(a).max(), 1e-12)
            err = np.abs(a - b).max() / scale
            assert err < 5e-5, (name, p, err)


def _wcsph_fluid(dim, n=200, seed=3, name='fluid'):
    from pysph_tpu.base.utils import get_particle_array_wcsph
    rng = np.random.RandomState(seed)
    dx = 0.1
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    if dim < 3:
        pts[:, 2] = 0.0
    if dim < 2:
        pts[:, 1] = 0.0
    pa = get_particle_array_wcsph(
        name=name, x=pts[:, 0], y=pts[:, 1], z=pts[:, 2],
        u=0.1 * rng.randn(n), v=0.1 * rng.randn(n),
        w=0.1 * rng.randn(n) * (dim == 3),
        m=np.full(n, dx ** dim), rho=1 + 0.01 * rng.randn(n),
        h=np.full(n, 1.3 * dx), cs=np.full(n, 10.0))
    pa.p[:] = 1 + 0.1 * rng.randn(n)
    return pa


@pytest.mark.parametrize('dim', [2, 3])
def test_wcsph_group_parity(dim):
    from pysph_tpu.base.kernels import CubicSpline
    from pysph_tpu.sph.basic_equations import (
        ContinuityEquation, XSPHCorrection)
    from pysph_tpu.sph.equation import Group
    from pysph_tpu.sph.wc.basic import MomentumEquation

    pa = _wcsph_fluid(dim)
    equations = [Group(equations=[
        ContinuityEquation('fluid', ['fluid']),
        MomentumEquation('fluid', ['fluid'], c0=10.0, alpha=0.1,
                         beta=0.0),
        XSPHCorrection('fluid', ['fluid']),
    ])]
    _compare(dim, [pa], equations, CubicSpline(dim=dim),
             ('arho', 'au', 'av', 'aw', 'ax', 'ay', 'az'))


@pytest.mark.slow
def test_multi_array_parity():
    """fluid + boundary sources (the dam-break structure)."""
    from pysph_tpu.base.kernels import CubicSpline
    from pysph_tpu.sph.basic_equations import ContinuityEquation
    from pysph_tpu.sph.equation import Group
    from pysph_tpu.sph.wc.basic import MomentumEquation

    fluid = _wcsph_fluid(3, n=150, seed=1)
    solid = _wcsph_fluid(3, n=100, seed=2, name='boundary')
    equations = [Group(equations=[
        ContinuityEquation('fluid', ['fluid', 'boundary']),
        MomentumEquation('fluid', ['fluid', 'boundary'], c0=10.0,
                         alpha=0.1, beta=0.0),
    ])]
    _compare(3, [fluid, solid], equations, CubicSpline(dim=3),
             ('arho', 'au', 'av', 'aw'))


def test_summation_density_parity():
    from pysph_tpu.base.kernels import CubicSpline
    from pysph_tpu.sph.basic_equations import SummationDensity
    from pysph_tpu.sph.equation import Group

    pa = _wcsph_fluid(2)
    equations = [Group(equations=[SummationDensity('fluid',
                                                   ['fluid'])])]
    _compare(2, [pa], equations, CubicSpline(dim=2), ('rho',))


@pytest.mark.parametrize('dim', [2, 3])
def test_periodic_parity(dim):
    """Periodic domains: wrapped stencil index maps + minimum-image
    displacements must match the XLA roll engine."""
    from pysph_tpu.base.domain import DomainManager
    from pysph_tpu.base.kernels import CubicSpline
    from pysph_tpu.sph.basic_equations import ContinuityEquation
    from pysph_tpu.sph.equation import Group
    from pysph_tpu.sph.wc.basic import MomentumEquation

    pa = _wcsph_fluid(dim)
    domain = DomainManager(
        xmin=0.0, xmax=1.0, ymin=0.0, ymax=1.0,
        zmin=0.0, zmax=1.0 if dim == 3 else 0.0,
        periodic_in_x=True, periodic_in_y=True,
        periodic_in_z=(dim == 3))
    equations = [Group(equations=[
        ContinuityEquation('fluid', ['fluid']),
        MomentumEquation('fluid', ['fluid'], c0=10.0, alpha=0.1,
                         beta=0.0),
    ])]
    _compare(dim, [pa], equations, CubicSpline(dim=dim),
             ('arho', 'au', 'av', 'aw'), domain=domain)


def test_max_accumulation_parity():
    """MAX-marker accumulation (dt_cfl) goes through the min/max
    combine path."""
    from pysph_tpu.base.kernels import CubicSpline
    from pysph_tpu.sph.equation import Group
    from pysph_tpu.sph.wc.basic import (
        MomentumEquation, TaitEOS)

    pa = _wcsph_fluid(2)
    equations = [
        Group(equations=[TaitEOS('fluid', None, rho0=1.0, c0=10.0,
                                 gamma=7.0)], real=False),
        Group(equations=[MomentumEquation(
            'fluid', ['fluid'], c0=10.0, alpha=0.1, beta=0.0,
            tensile_correction=True)]),
    ]
    _compare(2, [pa], equations, CubicSpline(dim=2),
             ('au', 'av', 'dt_cfl'))


def test_unwritable_block_keeps_values():
    """A visited block whose write mask is all-zero (e.g. every
    particle in it is a ghost during a real group) must flush the
    identity output, not uninitialized VMEM."""
    import jax
    from pysph_tpu.base.kernels import CubicSpline
    from pysph_tpu.base.particle_array import ParticleTAGS
    from pysph_tpu.sph.basic_equations import ContinuityEquation
    from pysph_tpu.sph.equation import Group

    pa = _wcsph_fluid(2, n=150)
    # everything on the right half is a ghost: whole blocks become
    # active-but-unwritable for the real group
    tag = np.where(np.asarray(pa.x) > 0.5, ParticleTAGS.Ghost,
                   ParticleTAGS.Local)
    pa.tag[:] = tag
    pa.arho[:] = 7.5  # sentinel pre-phase value
    kernel = CubicSpline(dim=2)
    eqs = [Group(equations=[ContinuityEquation('fluid', ['fluid'])],
                 real=True)]
    states = {'fluid': pa.to_device()[0]}
    cfg = get_config()
    cfg.use_pallas = True
    try:
        out = _run(_make_eval(2, [pa], eqs, kernel), states)
    finally:
        cfg.use_pallas = False
    n = pa.get_number_of_particles()
    arho = np.asarray(out['fluid']['arho'])[:n]
    ghosts = tag == ParticleTAGS.Ghost
    assert np.all(arho[ghosts] == 7.5), \
        arho[ghosts][arho[ghosts] != 7.5][:5]
    assert np.all(np.isfinite(arho))


@pytest.mark.slow
def test_union_window_overflow_grows():
    """A deliberately tiny union-window capacity must raise
    diag['window_overflow']; growing the spec must clear it and
    reproduce the classic-kernel accelerations."""
    import os

    import jax

    from pysph_tpu.base.cell_grid import GridSpec
    from pysph_tpu.base.kernels import CubicSpline
    from pysph_tpu.sph.acceleration_eval import AccelerationEval
    from pysph_tpu.sph.basic_equations import ContinuityEquation
    from pysph_tpu.sph.equation import Group

    pa = _wcsph_fluid(3, n=400)
    kernel = CubicSpline(dim=3)
    eqs = [Group(equations=[ContinuityEquation('fluid', ['fluid'])])]
    states = {'fluid': pa.to_device()[0]}
    cfg = get_config()

    def run_with(spec):
        a_eval = AccelerationEval([pa], eqs, kernel)
        a_eval.set_nnps(spec)

        out, diag = jax.jit(
            lambda s: a_eval.update_and_compute(0.1, 1e-4, s))(states)
        return out, diag

    cfg.use_pallas = False
    base = GridSpec.from_particles([pa], dim=3,
                                   radius_scale=kernel.radius_scale)
    ref, _ = run_with(base)

    cfg.use_pallas = True
    os.environ['PYSPH_TPU_UNION'] = '1'
    try:
        # K=128 is far below the true union occupancy of a dense
        # 400-particle cube -> must overflow
        small = GridSpec.from_particles(
            [pa], dim=3, radius_scale=kernel.radius_scale)
        small.window_caps['fluid'] = 128
        _, diag = run_with(small)
        assert bool(diag['window_overflow'])

        grown = small.grow(windows=True)
        for _ in range(4):
            out, diag = run_with(grown)
            if not bool(diag['window_overflow']):
                break
            grown = grown.grow(windows=True)
        assert not bool(diag['window_overflow'])
    finally:
        cfg.use_pallas = False
        os.environ.pop('PYSPH_TPU_UNION', None)

    a = np.asarray(ref['fluid']['arho'])
    b = np.asarray(out['fluid']['arho'])
    err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-12)
    assert err < 5e-5, err
