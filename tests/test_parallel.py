"""Distributed (shard_map block decomposition) tests on the virtual
8-device CPU mesh — the analog of the reference's mpiexec tests
(SURVEY.md section 4.7): physics invariance under partitioning, i.e.
serial vs N-block runs must agree."""

import jax
import numpy as np
import pytest

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.cell_grid import GridSpec
from pysph_tpu.base.utils import get_particle_array_wcsph
from pysph_tpu.parallel.domain_decomp import (
    BlockPartition, DistributedRunner)
from pysph_tpu.sph.acceleration_eval import AccelerationEval
from pysph_tpu.sph.basic_equations import (
    ContinuityEquation, XSPHCorrection)
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.integrator import EPECIntegrator
from pysph_tpu.sph.integrator_step import WCSPHStep
from pysph_tpu.sph.wc.basic import MomentumEquation, TaitEOS


def _make_particles(n=400, seed=3):
    rng = np.random.RandomState(seed)
    x = rng.uniform(0, 2.0, n)
    y = rng.uniform(0, 0.5, n)
    dx = np.sqrt(2.0 * 0.5 / n)
    pa = get_particle_array_wcsph(
        name='fluid', x=x, y=y, h=np.full(n, 1.3 * dx),
        m=np.full(n, dx * dx), rho=np.ones(n),
        u=0.1 * np.sin(np.pi * x), v=0.05 * np.cos(np.pi * y))
    return pa


def _equations():
    return [
        Group(equations=[
            TaitEOS('fluid', None, rho0=1.0, c0=20.0, gamma=7.0)],
            real=False),
        Group(equations=[
            ContinuityEquation('fluid', ['fluid']),
            MomentumEquation('fluid', ['fluid'], c0=20.0, alpha=0.1,
                             beta=0.0),
            XSPHCorrection('fluid', ['fluid']),
        ]),
    ]


def _make_integrator(pa):
    kernel = CubicSpline(dim=2)
    a_eval = AccelerationEval([pa], _equations(), kernel)
    integ = EPECIntegrator(fluid=WCSPHStep())
    integ.set_acceleration_evals([a_eval])
    integ.set_nnps(GridSpec.from_particles([pa], dim=2,
                                           radius_scale=2.0))
    return integ


def _run_serial(pa, n_steps, dt):
    integ = _make_integrator(pa)
    states = {'fluid': pa.to_device()[0]}
    t = 0.0
    step = jax.jit(lambda s, t, dt: integ.step(s, t, dt)[0])

    for i in range(n_steps):
        states = step(states, t, dt)
        t += dt
    return states


def _sorted_by_gid(x, y, gid):
    order = np.argsort(gid)
    return x[order], y[order]


@pytest.mark.parametrize('n_blocks', [2, 4])
def test_serial_vs_sharded_equality(n_blocks):
    if len(jax.devices()) < n_blocks:
        pytest.skip('not enough devices')
    n_steps, dt = 3, 1e-4

    pa_serial = _make_particles()
    serial = _run_serial(pa_serial, n_steps, dt)
    n = int(serial['fluid']['n_act'])
    sx, sy = _sorted_by_gid(np.asarray(serial['fluid']['x'])[:n],
                            np.asarray(serial['fluid']['y'])[:n],
                            np.asarray(serial['fluid']['gid'])[:n])
    srho = np.asarray(serial['fluid']['rho'])[:n][
        np.argsort(np.asarray(serial['fluid']['gid'])[:n])]

    pa_dist = _make_particles()
    integ = _make_integrator(pa_dist)
    partition = BlockPartition(n_blocks, 0.0, 2.0, axis='x')
    runner = DistributedRunner(integ, partition,
                               devices=jax.devices()[:n_blocks],
                               buffer_capacity=512)
    gstates = runner.distribute([pa_dist])
    t = 0.0
    for i in range(n_steps):
        gstates, dt_next, diag = runner.step(gstates, t, dt)
        assert not bool(diag['cell_overflow'])
        assert not bool(diag['extent_overflow'])
        assert not bool(diag['exchange_overflow'])
        assert not bool(diag['capacity_overflow'])
        assert not bool(diag['migration_multihop'])
        t += dt
    runner.collect(gstates, [pa_dist])

    assert pa_dist.get_number_of_particles() == n
    dx_, dy_ = _sorted_by_gid(pa_dist.x, pa_dist.y, pa_dist.gid)
    drho = pa_dist.rho[np.argsort(pa_dist.gid)]
    np.testing.assert_allclose(dx_, sx, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(dy_, sy, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(drho, srho, rtol=1e-9)


def test_adaptive_dt_pmin():
    if len(jax.devices()) < 2:
        pytest.skip('not enough devices')
    pa = _make_particles()
    integ = _make_integrator(pa)
    partition = BlockPartition(2, 0.0, 2.0, axis='x')
    runner = DistributedRunner(integ, partition,
                               devices=jax.devices()[:2],
                               buffer_capacity=512,
                               adaptive_timestep=True, cfl=0.3)
    gstates = runner.distribute([pa])
    gstates, dt_next, diag = runner.step(gstates, 0.0, 1e-4)
    assert float(dt_next) > 0
    assert np.isfinite(float(dt_next))
