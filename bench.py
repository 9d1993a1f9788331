"""Benchmark: the north-star dam_break_3d throughput on one chip.

Config: SPHERIC Test 2 geometry at dx=0.02 (~143k particles), WCSPH
(Tait EOS + continuity + Monaghan momentum w/ artificial viscosity +
XSPH), WendlandQuintic kernel, EPEC integration, NNPS rebuilt/reused
Verlet-style per step — the same per-step work the reference performs
(/root/reference/pysph/examples/dam_break_3d.py:19-71).

Baseline derivation (reference publishes wall-clock in the example
docstring, not a benchmark suite): ~14 h serial CPU for tf=6.0 at
dx=0.02 -> with adaptive dt ~1.8e-4 that is ~33k steps of ~143k
particles ~= 9.4e4 particle-steps/s serial; PySPH's OpenMP speedup on
a desktop CPU is ~5-6x -> ~5e5 particle-steps/s OpenMP, the
vs_baseline denominator here.  The BASELINE.json target is >=10x
OpenMP, i.e. vs_baseline >= 10.

Prints ONE JSON line per completed milestone (the last line is the
most complete; all lines carry the same metric key).  The north-star
line is printed and flushed IMMEDIATELY after the dam-break
measurement; the secondary elliptical_drop measurement runs only if
the time budget allows and re-prints a combined line.

Robustness (rounds 3 and 4 produced no driver-parseable number — r3
crashed, r4 timed out inside cold compiles):
- a persistent XLA compilation cache (.jax_cache_tpu/) makes repeat
  runs skip device compiles entirely (verified to work through the
  axon remote-TPU plugin);
- a watchdog thread prints a best-so-far JSON line shortly before the
  assumed driver deadline so even a hung compile leaves a parseable
  record;
- per-phase wall-clock goes to stderr for post-mortems.
"""

import json
import os
import sys
import threading
import time

import numpy as np

OPENMP_BASELINE = 5.0e5     # particle-steps/s (derivation above)
ELLIPTICAL_BASELINE = 1.2e5  # serial CPU, examples/elliptical_drop.py:1

T0 = time.time()
# Conservative estimate of the driver's bench window: r4 hit rc=124
# so a timeout exists, but its length is unrecorded — assume ~20 min
# so the watchdog/deadline paths fire well inside a 30-min window
# too.  A cache-warm successful run takes well under 10 min.
# Override via env for local runs.
BUDGET_S = float(os.environ.get('PYSPH_BENCH_BUDGET_S', '1140'))

_result_lock = threading.Lock()
_result = {'printed_real': False, 'best': None}


def _elapsed():
    return time.time() - T0


def _phase(msg):
    sys.stderr.write('[bench %7.1fs] %s\n' % (_elapsed(), msg))
    sys.stderr.flush()


def _emit(payload):
    with _result_lock:
        _result['printed_real'] = True
        print(json.dumps(payload))
        sys.stdout.flush()


def _north_star(db3d, n_db3d, extra=None):
    payload = {
        'metric': 'dam_break_3d_particle_steps_per_sec_per_chip',
        'value': float('%.4g' % db3d),
        'unit': 'particle-steps/s',
        'vs_baseline': float('%.4g' % (db3d / OPENMP_BASELINE)),
        'baseline': 'PySPH OpenMP ~5e5 ps/s (14h serial at dx=0.02 '
                    '~= 9.4e4 ps/s x ~5.3 OpenMP; target >= 10x)',
        'n_particles': n_db3d,
        'elapsed_s': round(_elapsed(), 1),
    }
    if extra:
        payload['extra'] = extra
    return payload


def _watchdog():
    """Print a best-so-far line shortly before the assumed deadline if
    nothing real has been printed (a hung compile leaves no output
    otherwise; see BENCH_r04.json)."""
    wake = BUDGET_S - 90.0
    while _elapsed() < wake:
        time.sleep(5.0)
        with _result_lock:
            if _result['printed_real']:
                return
    with _result_lock:
        if _result['printed_real']:
            return
        best = _result['best']
        if best is not None:
            payload = _north_star(*best)
            payload['note'] = 'watchdog: partial result at deadline'
        else:
            payload = {
                'metric': 'dam_break_3d_particle_steps_per_sec_per_chip',
                'value': 0.0, 'unit': 'particle-steps/s',
                'vs_baseline': 0.0,
                'error': 'watchdog: no measurement completed in %.0fs '
                         '(cold compile + tenant contention?)'
                         % _elapsed(),
            }
        print(json.dumps(payload))
        sys.stdout.flush()
        _result['printed_real'] = True


def _measure_integrator(integ, states, dt, steps_per_call=10,
                        n_calls=4):
    """Throughput of integrator.step with the packed-blob transport
    (the runtime charges ~5 ms per jit output buffer through the
    remote-dispatch tunnel; see utils/packing.py)."""
    import jax
    import jax.numpy as jnp
    from pysph_tpu.utils.packing import make_packer

    fdt = next(iter(states.values()))['x'].dtype
    _phase('compiling initial_acceleration')
    _, _, carry0 = jax.jit(
        lambda s: integ.initial_acceleration(s, 0.0, dt))(states)
    t0 = jnp.asarray(0.0, dtype=fdt)
    pack, unpack = make_packer((states, t0, carry0))

    @jax.jit
    def run_block(blob):
        def body(carry, _):
            s, t, nnps = carry
            s, _diag, nnps = integ.step(s, t, dt, nnps)
            return (s, t + dt, nnps), 0
        carry, _ = jax.lax.scan(
            body, unpack(blob), None, length=steps_per_call)
        return pack(carry)

    def _force(blob):
        # block_until_ready is a no-op through the axon tunnel; a
        # small host fetch is the only reliable barrier
        return np.asarray(next(iter(blob.values()))[:1])

    blob = pack((states, t0, carry0))
    _phase('compiling run_block (%d-step scan)' % steps_per_call)
    blob = run_block(blob)
    _force(blob)
    _phase('measuring (%d calls x %d steps)' % (n_calls, steps_per_call))
    # median PER CALL, not total wall: the shared chip's tenant
    # contention is bursty (3-7x spikes, see the verify skill); one
    # bad call would otherwise dominate a 40-step total.  Chained
    # inputs (each call consumes the previous output) keep the device
    # honestly busy end to end.
    per_call = []
    for _ in range(n_calls):
        start = time.time()
        blob = run_block(blob)
        _force(blob)
        per_call.append(time.time() - start)
    wall = sorted(per_call)[len(per_call) // 2]
    states_out, _t, _c = unpack(blob)
    for s in states_out.values():
        assert np.all(np.isfinite(np.asarray(s['x'])))
    _phase('measured %.1f ms/step (per-call %s)' % (
        wall / steps_per_call * 1e3,
        ' '.join('%.2fs' % c for c in per_call)))
    return steps_per_call / wall


def bench_dam_break_3d(dx=0.02, delta_sph=False):
    from pysph_tpu.examples.dam_break_3d import DamBreak3D
    argv_save = sys.argv
    sys.argv = ['dam_break_3d']
    try:
        app = DamBreak3D()
        extra = ['--delta-sph'] if delta_sph else []
        app.setup(['--dx', str(dx), '--max-steps', '0',
                   '--disable-output'] + extra)
    finally:
        sys.argv = argv_save
    _phase('dam_break_3d setup done')
    solver = app.solver
    integ = solver.integrator
    states = solver.states
    n = sum(int(np.asarray(s['n_act'])) for s in states.values())
    sps = _measure_integrator(integ, states, float(solver.dt))
    return n * sps, n


def bench_elliptical_drop(nx=100):
    from pysph_tpu.base.cell_grid import GridSpec
    from pysph_tpu.base.kernels import Gaussian
    from pysph_tpu.base.utils import get_particle_array_wcsph
    from pysph_tpu.sph.acceleration_eval import AccelerationEval
    from pysph_tpu.sph.basic_equations import (
        ContinuityEquation, XSPHCorrection)
    from pysph_tpu.sph.equation import Group
    from pysph_tpu.sph.integrator import EPECIntegrator
    from pysph_tpu.sph.integrator_step import WCSPHStep
    from pysph_tpu.sph.wc.basic import MomentumEquation, TaitEOS

    dx = 1.0 / nx
    hdx, co = 1.3, 1400.0
    span = np.arange(-1.05, 1.05 + 1e-9, dx)
    x, y = np.meshgrid(span, span)
    x, y = x.ravel(), y.ravel()
    keep = x * x + y * y < 1.0
    x, y = x[keep], y[keep]
    n = x.size
    pa = get_particle_array_wcsph(
        name='fluid', x=x, y=y, m=np.full(n, dx * dx),
        rho=np.ones(n), h=np.full(n, hdx * dx), u=-100.0 * x,
        v=100.0 * y, cs=np.full(n, co))
    equations = [
        Group(equations=[TaitEOS('fluid', None, rho0=1.0, c0=co,
                                 gamma=7.0)], real=False),
        Group(equations=[
            ContinuityEquation('fluid', ['fluid']),
            MomentumEquation('fluid', ['fluid'], c0=co, alpha=0.1,
                             beta=0.0),
            XSPHCorrection('fluid', ['fluid']),
        ]),
    ]
    integ = EPECIntegrator(fluid=WCSPHStep())
    a_eval = AccelerationEval([pa], equations, Gaussian(dim=2))
    integ.set_acceleration_evals([a_eval])
    integ.set_nnps(GridSpec.from_particles(
        [pa], dim=2, radius_scale=3.0, pad=0.02,
        capacity_slack=1.15))
    state, _ = pa.to_device()
    dt = 0.25 * hdx * dx / (141 + co)
    sps = _measure_integrator(integ, {'fluid': state}, dt,
                              steps_per_call=25, n_calls=8)
    return n * sps, n


def _fail(msg):
    print(json.dumps({
        'metric': 'dam_break_3d_particle_steps_per_sec_per_chip',
        'value': 0.0, 'unit': 'particle-steps/s',
        'vs_baseline': 0.0, 'error': msg,
    }))
    sys.stdout.flush()


def _probe_backend(timeout=600):
    """Init the jax backend in a subprocess first: the remote-TPU
    plugin hangs un-interruptibly (inside C) when the tunnel is down,
    so probing in-process would wedge the driver.  The probe also runs
    one tiny computation + host fetch: a wedged-but-connectable tunnel
    (observed 2026-08-21: ``jax.devices()`` succeeds, any execute RPC
    hangs forever) passes a devices()-only probe and then eats the
    whole budget.  A successful probe warms the server connection."""
    import subprocess
    try:
        proc = subprocess.run(
            [sys.executable, '-c',
             'import jax, jax.numpy as jnp; jax.devices(); '
             'print(float(jnp.arange(8.).sum())); '
             'print("backend-ok")'],
            capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return 'timeout: TPU backend unreachable or wedged'
    if 'backend-ok' not in (proc.stdout or ''):
        return 'backend init failed: %s' % (proc.stderr or '')[-500:]
    return None


def _probe_until_up(budget_frac=0.45, per_try=240):
    """Retry the probe while the tunnel is down: a mid-window
    recovery still lands a real number (warm compile caches make the
    measurement itself take only a couple of minutes)."""
    while True:
        err = _probe_backend(timeout=per_try)
        if err is None:
            return None
        if _elapsed() > budget_frac * BUDGET_S:
            return err
        _phase('probe failed (%s); retrying in 30s' % err)
        time.sleep(30)


def _parent(argv):
    """Supervisor: run the measurement in a CHILD interpreter and
    relay its stdout.  A hard crash in the child (segfault-class —
    e.g. a poisoned compile-cache entry, a Mosaic bug) still leaves a
    parseable JSON line from this process; rounds 3-4 each lost their
    benchmark record to exactly this failure mode."""
    import subprocess
    cmd = [sys.executable, os.path.abspath(__file__), '--child'] + argv
    deadline = T0 + BUDGET_S - 45.0
    saw_json = False
    last = ''
    try:
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                text=True)
        while True:
            line = proc.stdout.readline()
            if not line:
                break
            sys.stdout.write(line)
            sys.stdout.flush()
            if line.lstrip().startswith('{'):
                saw_json = True
            else:
                last = line.strip()
            if time.time() > deadline and not saw_json:
                break
        try:
            proc.wait(timeout=max(5.0, deadline - time.time()))
        except subprocess.TimeoutExpired:
            proc.kill()
        rc = proc.returncode
    except Exception as e:
        rc, last = -1, repr(e)
    if not saw_json:
        _fail('bench child died without a result (rc=%r, last=%r)'
              % (rc, last[-300:]))
        return 3
    return 0


def main():
    if '--child' not in sys.argv[1:]:
        return _parent([a for a in sys.argv[1:]])
    threading.Thread(target=_watchdog, daemon=True).start()
    _phase('probing backend')
    err = _probe_until_up()
    if err is not None:
        _fail(err)
        return 3
    _phase('backend ok')

    import jax
    # Persistent compile cache: repeat bench runs (and the driver's
    # run after a pre-warming run in-round) load executables from disk
    # instead of recompiling — verified to work through the axon
    # remote-TPU plugin.  Keyed by host CPU flags: entries written on
    # a different machine can SIGABRT on load (see tests/conftest.py).
    import hashlib
    try:
        with open('/proc/cpuinfo') as f:
            flags = next((ln for ln in f if ln.startswith('flags')),
                         'none')
    except OSError:
        flags = 'none'
    tag = hashlib.md5(flags.encode()).hexdigest()[:8]
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             '.jax_cache_tpu-' + tag)
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes',
                          0)
        jax.config.update('jax_persistent_cache_enable_xla_caches',
                          'none')
    except Exception as e:
        _phase('compile cache unavailable: %s' % e)

    from pysph_tpu.config import get_config
    get_config().use_pallas = jax.default_backend() in ('tpu', 'axon')

    # `python bench.py --delta-sph` benches the BASELINE.md multi-chip
    # variant (WCSPH + delta-SPH + gradient correction); default is
    # the plain WCSPH north-star config the OpenMP baseline derives
    # from (accuracy gate for the variant:
    # tests/test_reference_parity.py::test_delta_sph_...)
    delta_sph = '--delta-sph' in sys.argv[1:]
    db3d, n_db3d = bench_dam_break_3d(delta_sph=delta_sph)
    # The north-star number exists: print it NOW (the driver's window
    # must never close on an unprinted result again).
    _emit(_north_star(db3d, n_db3d))
    with _result_lock:
        _result['best'] = (db3d, n_db3d)

    # Secondary measurement only with comfortable margin: its compiles
    # cost a few minutes cold.
    if _elapsed() > 0.55 * BUDGET_S:
        _phase('skipping elliptical_drop (%.0fs elapsed)' % _elapsed())
        return 0
    try:
        drop, n_drop = bench_elliptical_drop()
    except Exception as e:
        _phase('elliptical_drop failed: %r' % e)
        return 0
    _emit(_north_star(db3d, n_db3d, extra={
        'elliptical_drop_ps_per_sec': float('%.4g' % drop),
        'elliptical_vs_serial_baseline': float(
            '%.4g' % (drop / ELLIPTICAL_BASELINE)),
        'elliptical_n_particles': n_drop,
    }))
    return 0


if __name__ == '__main__':
    sys.exit(main())
