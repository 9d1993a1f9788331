"""Benchmark: WCSPH particle-steps/sec on one chip.

Runs the elliptical_drop configuration (2D WCSPH: Tait EOS + continuity +
momentum w/ artificial viscosity + XSPH, EPEC integration, NNPS rebuild
every acceleration eval — the same work PySPH does per step) at nx=100
(~31k particles) in float32 on the default backend and reports throughput.

Baseline: the reference example annotates ~60 s wall-clock for the full
run at nx=40 (~5k particles, ~1440 steps) on one desktop CPU
(/root/reference/pysph/examples/elliptical_drop.py:1), i.e. ~1.2e5
particle-steps/s serial.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The loop state crosses the jit boundary packed as one blob per dtype
(the runtime charges per output buffer) and 25 steps run per dispatch.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pysph_tpu.config import get_config
    get_config().use_pallas = jax.default_backend() in ('tpu', 'axon')

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

    nx = 100
    dx = 1.0 / nx
    hdx = 1.3
    co = 1400.0
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
    kernel = Gaussian(dim=2)
    integrator = EPECIntegrator(fluid=WCSPHStep())
    a_eval = AccelerationEval([pa], equations, kernel)
    integrator.set_acceleration_evals([a_eval])
    integrator.set_nnps(GridSpec.from_particles(
        [pa], dim=2, radius_scale=3.0, pad=0.02,
        capacity_slack=1.15))

    state, _ = pa.to_device()
    states = {'fluid': state}
    dt = 0.25 * hdx * dx / (141 + co)

    steps_per_call = 25

    # prime the binning carry once so the scan carry structure is fixed
    _, _, carry0 = jax.jit(
        lambda s: integrator.initial_acceleration(s, 0.0, dt))(states)

    from pysph_tpu.utils.packing import make_packer
    t0 = jnp.asarray(0.0, dtype=state['x'].dtype)
    pack, unpack = make_packer((states, t0, carry0))

    @jax.jit
    def run_block(blob):
        def body(carry, _):
            s, t, nnps = carry
            s, _diag, nnps = integrator.step(s, t, dt, nnps)
            return (s, t + dt, nnps), 0
        carry, _ = jax.lax.scan(
            body, unpack(blob), None, length=steps_per_call)
        return pack(carry)

    def _force(blob):
        # NOTE: jax.block_until_ready is a no-op on the axon TPU tunnel;
        # a host fetch of a small slice is the only reliable barrier.
        return np.asarray(next(iter(blob.values()))[:1])

    # warmup / compile
    blob = pack((states, t0, carry0))
    blob = run_block(blob)
    _force(blob)

    n_calls = 10
    start = time.time()
    for _ in range(n_calls):
        blob = run_block(blob)
    _force(blob)
    wall = time.time() - start

    states, _t, _c = unpack(blob)
    assert np.all(np.isfinite(np.asarray(states['fluid']['x'])))
    nsteps = n_calls * steps_per_call
    psteps_per_sec = n * nsteps / wall

    baseline = 1.2e5  # reference serial-CPU elliptical_drop throughput
    print(json.dumps({
        'metric': 'elliptical_drop_particle_steps_per_sec',
        'value': float('%.4g' % psteps_per_sec),
        'unit': 'particle-steps/s',
        'vs_baseline': float('%.4g' % (psteps_per_sec / baseline)),
    }))


if __name__ == '__main__':
    main()

