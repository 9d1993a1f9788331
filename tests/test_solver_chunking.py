"""The chunked solve loop (K steps per device dispatch,
solver.py chunk_steps) must march the same trajectory as the
per-step loop."""

import shutil
import sys
import tempfile

import numpy as np
import pytest


def _run(chunk_steps, steps=25, output_at=()):
    from pysph_tpu.examples.elliptical_drop import EllipticalDrop
    tmpdir = tempfile.mkdtemp()
    old_argv = sys.argv
    try:
        sys.argv = ['elliptical_drop']
        app = EllipticalDrop()
        app.setup(['--nx', '20', '--max-steps', str(steps), '-q',
                   '--disable-output', '-d', tmpdir])
        app.solver.chunk_steps = chunk_steps
        # keep every chunk inside max_steps so the chunked path runs
        app.solver.set_max_steps(steps)
        app.solver.set_output_at_times(list(output_at))
        app.solve()
        pa = app.particles[0]
        return (app.solver.t, app.solver.count, np.asarray(pa.x),
                np.asarray(pa.u), np.asarray(pa.rho))
    finally:
        sys.argv = old_argv
        shutil.rmtree(tmpdir, ignore_errors=True)


@pytest.mark.slow
def test_chunked_matches_per_step():
    t1, c1, x1, u1, r1 = _run(chunk_steps=1)
    t5, c5, x5, u5, r5 = _run(chunk_steps=5)
    assert c1 == c5 == 25
    assert abs(t1 - t5) < 1e-9 * max(t1, 1e-30)
    assert np.allclose(x1, x5, rtol=1e-5, atol=1e-7)
    assert np.allclose(u1, u5, rtol=1e-4, atol=1e-5)
    assert np.allclose(r1, r5, rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_chunked_lands_on_output_times():
    # an output time mid-run: the chunk must stop there exactly and
    # resume, marching the same physics as the per-step dt-landing
    t_out = 1.1e-5
    t1, c1, x1, u1, r1 = _run(chunk_steps=1, output_at=(t_out,))
    t5, c5, x5, u5, r5 = _run(chunk_steps=8, output_at=(t_out,))
    assert abs(t1 - t5) < 1e-8 * max(t1, 1e-30)
    assert np.allclose(x1, x5, rtol=1e-4, atol=1e-6)
    assert np.allclose(u1, u5, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_block_overflow_grows_and_recovers():
    """An undersized active-block cap must raise
    diag['block_overflow'], double the caps, re-jit and redo — the
    trajectory must match an amply-capped run.  (Pallas interpret
    mode exercises the sparse dispatch on CPU.)"""
    from pysph_tpu.config import get_config

    def run(tighten):
        from pysph_tpu.examples.elliptical_drop import EllipticalDrop
        tmpdir = tempfile.mkdtemp()
        old_argv = sys.argv
        cfg = get_config()
        try:
            sys.argv = ['elliptical_drop']
            app = EllipticalDrop()
            cfg.use_pallas = True
            app.setup(['--nx', '30', '--max-steps', '6', '-q',
                       '--disable-output', '-d', tmpdir])
            spec = app.solver.nnps
            if tighten:
                # far below the real activity -> guaranteed overflow
                spec.block_fracs = {k: 0.01
                                    for k in spec.block_fracs} or \
                    {'fluid': 0.01}
                app.solver.integrator.set_nnps(spec)
                app.solver._make_jits()
            app.solve()
            pa = app.particles[0]
            grown = app.solver.nnps.block_fracs
            return np.asarray(pa.x), np.asarray(pa.rho), grown
        finally:
            cfg.use_pallas = False
            sys.argv = old_argv
            shutil.rmtree(tmpdir, ignore_errors=True)

    x_ref, r_ref, _ = run(tighten=False)
    x_t, r_t, grown = run(tighten=True)
    # the caps must have grown past the artificial 0.01
    assert all(v > 0.01 for v in grown.values())
    assert np.allclose(x_ref, x_t, rtol=1e-6, atol=1e-9)
    assert np.allclose(r_ref, r_t, rtol=1e-6, atol=1e-9)
