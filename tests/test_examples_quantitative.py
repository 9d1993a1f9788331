"""Quantitative example checks (slow tier): full runs compared
against exact solutions, the analog of the validation plots the
reference documents for its examples."""

import shutil
import sys
import tempfile

import numpy as np
import pytest


def _run_app(app, argv):
    old = sys.argv
    tmpdir = tempfile.mkdtemp()
    try:
        sys.argv = ['test']
        app.run(['-d', tmpdir, '-q', '--disable-output'] + argv)
    finally:
        sys.argv = old
        shutil.rmtree(tmpdir, ignore_errors=True)
    return app


@pytest.mark.slow
@pytest.mark.parametrize('scheme', ['adke', 'crk'])
def test_sod_shocktube_matches_exact_riemann(scheme):
    """Sod tube (mirror boundaries) vs the exact Riemann solution at
    tf=0.1: the L1 density error must be at the documented SPH
    resolution level.  The crk case also guards the CRKSPHSymmetric
    corrected-gradient sign fix."""
    from pysph_tpu.examples.gas_dynamics import riemann_solver as rs
    from pysph_tpu.examples.gas_dynamics.sod_shocktube import (
        SodShockTube)

    app = _run_app(SodShockTube(),
                   ['--nl', '200', '--tf', '0.1', '--scheme', scheme])
    pa = app.particles[0]
    x = np.asarray(pa.x)
    rho = np.asarray(pa.rho)
    tag = np.asarray(pa.tag)
    real = tag == 0
    x, rho = x[real], rho[real]

    rs.set_gamma(1.4)
    # sample the exact solution at the particle positions
    rho_e, u_e, p_e, e_e, xs = rs.solve(
        x_min=-0.5, x_max=0.5, x_0=0.0, t=0.1, N=2001)
    rho_exact = np.interp(x, xs, rho_e)
    sel = (x > -0.4) & (x < 0.4)
    l1 = np.mean(np.abs(rho[sel] - rho_exact[sel]))
    # typical SPH smearing at nl=200 gives L1 ~ 0.01; 0.03 is the
    # generous failure bar
    # adke measured ~0.012, crk ~0.024 at nl=200
    assert l1 < 0.035, 'L1(rho) vs exact Riemann = %g' % l1
    # the star-left plateau (between fan tail ~ -0.007 and the
    # contact at 0.093) must be present
    star_l = rho[(x > 0.01) & (x < 0.07)].mean()
    assert abs(star_l - 0.42632) < 0.05


@pytest.mark.slow
def test_taylor_green_decay_rate():
    """Taylor-Green (EDAC) velocity decay follows
    exp(-8 pi^2 t / Re) closely — the regression guard for the
    ComputeAveragePressure neighbor-count fix."""
    from pysph_tpu.examples.taylor_green import TaylorGreen

    app = _run_app(TaylorGreen(),
                   ['--nx', '25', '--re', '100', '--tf', '0.25',
                    '--scheme', 'edac'])
    pa = app.particles[0]
    u = np.asarray(pa.u)
    v = np.asarray(pa.v)
    vmax = float(np.sqrt(u * u + v * v).max())
    exact = np.exp(-8 * np.pi ** 2 / 100 * app.solver.t)
    assert abs(vmax / exact - 1.0) < 0.05, (
        'max|v| %g vs exact %g' % (vmax, exact))


@pytest.mark.slow
def test_accuracy_test_2d_advection():
    """Constant-pressure advection (GSPH): the density field must
    return to the exact advected profile with a small L1 error."""
    from pysph_tpu.examples.gas_dynamics.accuracy_test_2d import (
        AccuracyTest2D)

    app = AccuracyTest2D()
    old = sys.argv
    tmpdir = tempfile.mkdtemp()
    try:
        sys.argv = ['test']
        app.run(['-d', tmpdir, '-q', '--nparticles', '50',
                 '--tf', '0.1', '--pfreq', '1000'])
        l1 = app.post_process()
    finally:
        sys.argv = old
        shutil.rmtree(tmpdir, ignore_errors=True)
    # the kernel smoothing of the sine at this resolution bounds the
    # achievable L1; 0.08 is the blow-up bar
    assert l1 is not None and l1 < 0.08, 'L1 = %r' % l1
