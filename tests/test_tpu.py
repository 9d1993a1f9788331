"""Real-chip tier: Mosaic-compiled pallas on the attached TPU.

Run with ``PYSPH_TPU_TEST_TPU=1 python -m pytest tests/test_tpu.py -m
tpu -x`` from the repo root (the axon plugin needs an unmodified
PYTHONPATH).  Every test here exercises behavior invisible to the CPU
interpret-mode tiers: Mosaic block-shape rules (last two dims 8/128-
divisible), VMEM limits, captured-constant rejection, and real
compile/execute of the resident + compact pallas engines at non-tiny,
non-128-aligned shapes (exactly the shapes that crashed round 3's
default-on resident engine after its CPU tests all passed).

These are smoke + parity gates, not perf gates: first compiles take
minutes; wall-clock through the shared tunnel is meaningless.
No ops/ change may ship without a green run of this file on the chip
(reference analog: tests always execute real codegen + compile,
SURVEY.md section 4 item 8)."""

import os
import shutil
import sys
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

import jax  # noqa: E402

on_chip = jax.default_backend() in ('tpu', 'axon')
requires_tpu = pytest.mark.skipif(
    not on_chip, reason='needs the attached TPU (PYSPH_TPU_TEST_TPU=1)')


def _run_app(app_cls, argv, env=None):
    """Run an example Application in-process with temporary env
    knobs; returns the finished app (particles synced to host)."""
    old_argv = sys.argv
    old_env = {}
    tmpdir = tempfile.mkdtemp()
    try:
        for k, v in (env or {}).items():
            old_env[k] = os.environ.get(k)
            os.environ[k] = v
        sys.argv = ['test']
        app = app_cls()
        app.run(['-d', tmpdir, '-q', '--disable-output'] + argv)
        return app
    finally:
        sys.argv = old_argv
        for k, v in old_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        shutil.rmtree(tmpdir, ignore_errors=True)


def _positions(app, name='fluid'):
    pa = next(p for p in app.particles if p.name == name)
    tag = np.asarray(pa.tag)
    real = tag == 0
    return (np.asarray(pa.x)[real], np.asarray(pa.y)[real],
            np.asarray(pa.z)[real], np.asarray(pa.rho)[real])


@requires_tpu
def test_elliptical_drop_resident_nx40():
    """Round-3 regression: nx=40 has M=72 cell capacity (non-128-
    aligned planes) and crashed the resident kernel two ways on
    Mosaic.  10 real steps, resident default-on."""
    from pysph_tpu.examples.elliptical_drop import EllipticalDrop
    app = _run_app(EllipticalDrop, ['--nx', '40', '--max-steps', '10'],
                   env={'PYSPH_TPU_RESIDENT': '1'})
    x, y, z, rho = _positions(app)
    assert np.isfinite(x).all() and np.isfinite(rho).all()
    assert 0.5 < rho.mean() < 2.0     # rho0 = 1.0 in this example


@requires_tpu
def test_dam_break_3d_dx012_resident():
    """Round-3 regression: dx=0.12 gives a source segment whose lane
    width is not 128-divisible (Mosaic rejected block (1, 8, 96) of
    array (., 8, 232)).  3 steps through the full WCSPH/EPEC stack
    with boundary + obstacle source phases."""
    from pysph_tpu.examples.dam_break_3d import DamBreak3D
    app = _run_app(DamBreak3D, ['--dx', '0.12', '--max-steps', '3'],
                   env={'PYSPH_TPU_RESIDENT': '1'})
    x, y, z, rho = _positions(app)
    assert np.isfinite(x).all() and np.isfinite(z).all()
    assert np.isfinite(rho).all()


@requires_tpu
def test_resident_vs_flat_parity_on_chip():
    """Mosaic-compiled resident packs vs the SlotStore/compact path:
    identical physics to f32 reassociation noise over 10 steps
    (bar from PERF_NOTES: > 1e-3 relative on positions is a real
    bug, not noise)."""
    from pysph_tpu.examples.elliptical_drop import EllipticalDrop
    args = ['--nx', '25', '--max-steps', '10']
    a_res = _run_app(EllipticalDrop, args,
                     env={'PYSPH_TPU_RESIDENT': '1'})
    a_flat = _run_app(EllipticalDrop, args,
                      env={'PYSPH_TPU_RESIDENT': '0'})
    xr, yr, _, rr = _positions(a_res)
    xf, yf, _, rf = _positions(a_flat)
    scale = max(np.abs(xf).max(), np.abs(yf).max())
    assert np.max(np.abs(xr - xf)) < 1e-3 * scale
    assert np.max(np.abs(yr - yf)) < 1e-3 * scale
    assert np.max(np.abs(rr - rf) / rf.max()) < 1e-3


@requires_tpu
def test_pallas_vs_xla_parity_on_chip():
    """Compact pallas engine vs the XLA roll engine on the chip."""
    from pysph_tpu.examples.elliptical_drop import EllipticalDrop
    args = ['--nx', '25', '--max-steps', '10']
    a_pl = _run_app(EllipticalDrop, args,
                    env={'PYSPH_TPU_RESIDENT': '0',
                         'PYSPH_TPU_PALLAS': '1'})
    a_xla = _run_app(EllipticalDrop, args,
                     env={'PYSPH_TPU_RESIDENT': '0',
                          'PYSPH_TPU_PALLAS': '0'})
    xp, yp, _, rp = _positions(a_pl)
    xx, yx, _, rx = _positions(a_xla)
    scale = max(np.abs(xx).max(), np.abs(yx).max())
    assert np.max(np.abs(xp - xx)) < 1e-3 * scale
    assert np.max(np.abs(rp - rx) / rx.max()) < 1e-3


@requires_tpu
def test_stratified_on_chip():
    """Stratified variable-h pair dispatch compiled by Mosaic: a
    wide-h cloud (ratio 8, auto-stratifies) vs the brute-force oracle
    in f32."""
    from pysph_tpu.base.cell_grid import GridSpec
    from pysph_tpu.base.kernels import CubicSpline
    from pysph_tpu.base.utils import get_particle_array
    from pysph_tpu.sph.acceleration_eval import AccelerationEval
    from pysph_tpu.sph.basic_equations import SummationDensity

    rng = np.random.RandomState(7)
    n = 400
    x = rng.uniform(0, 1, n)
    y = rng.uniform(0, 1, n)
    h = np.where(rng.uniform(size=n) < 0.7, 0.02, 0.16)
    m = rng.uniform(0.5, 1.5, n)
    pa = get_particle_array(name='fluid', x=x, y=y, h=h, m=m,
                            rho=np.ones(n))
    kernel = CubicSpline(dim=2)
    a_eval = AccelerationEval(
        [pa], [SummationDensity('fluid', ['fluid'])], kernel)
    spec = GridSpec.from_particles(
        [pa], dim=2, radius_scale=kernel.radius_scale,
        stratify='auto')
    assert spec.stratified
    a_eval.set_nnps(spec)
    states = {'fluid': pa.to_device()[0]}
    out, diag = jax.jit(lambda s: a_eval.update_and_compute(
        0.0, 0.1, s))(states)
    rho = np.asarray(out['fluid']['rho'])[:n]
    # oracle
    rho_ref = np.zeros(n)
    rs = kernel.radius_scale
    for i in range(n):
        r = np.sqrt((x[i] - x) ** 2 + (y[i] - y) ** 2)
        sup = rs * np.maximum(h[i], h)
        for j in np.where(r < sup)[0]:
            rho_ref[i] += m[j] * float(kernel.kernel(
                rij=r[j], h=0.5 * (h[i] + h[j])))
    np.testing.assert_allclose(rho, rho_ref, rtol=5e-5, atol=1e-6)


@requires_tpu
def test_dam_break_3d_union_cascade_on_chip():
    """Union-window path with calibrated caps + K-cascade levels +
    the xy-concat source views, Mosaic-compiled at a size where the
    windows genuinely compact (dx=0.06: K < C for fluid<-fluid).
    Also the permanent stand-in for the BENCH_r03 captured-constants
    crash shape (strips must be materialized at phase trace level;
    ops/resident.py _union_strips)."""
    from pysph_tpu.examples.dam_break_3d import DamBreak3D
    app = _run_app(DamBreak3D, ['--dx', '0.06', '--max-steps', '3'],
                   env={'PYSPH_TPU_RESIDENT': '1'})
    spec = app.solver.nnps
    assert spec.window_caps, 'calibration did not run'
    x, y, z, rho = _positions(app)
    assert np.isfinite(x).all() and np.isfinite(z).all()
    assert np.isfinite(rho).all()


@requires_tpu
def test_delta_sph_strided_resident_on_chip():
    """Strided per-column pack planes (delta-SPH gradrho + m_mat,
    r5) Mosaic-compiled: 3 steps of the delta-SPH dam break through
    the resident path."""
    from pysph_tpu.examples.dam_break_3d import DamBreak3D
    app = _run_app(DamBreak3D,
                   ['--dx', '0.12', '--max-steps', '3',
                    '--delta-sph'],
                   env={'PYSPH_TPU_RESIDENT': '1'})
    runner = app.solver.integrator._res_runner
    assert runner not in (None, False), \
        'delta-SPH did not engage the resident path'
    x, y, z, rho = _positions(app)
    assert np.isfinite(x).all() and np.isfinite(rho).all()
