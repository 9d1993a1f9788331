"""A/B: resident packs vs slot-store path on dam_break_3d (on chip)."""
import os, sys, time, json
import numpy as np

def measure(resident, dx=0.02, steps_per_call=10, n_calls=4):
    os.environ['PYSPH_TPU_RESIDENT'] = '1' if resident else '0'
    import jax
    import jax.numpy as jnp
    from pysph_tpu.config import get_config
    get_config().use_pallas = True
    from pysph_tpu.examples.dam_break_3d import DamBreak3D
    from pysph_tpu.utils.packing import make_packer
    argv = sys.argv; sys.argv = ['bench']
    try:
        app = DamBreak3D()
        app.setup(['--dx', str(dx), '--max-steps', '0', '--disable-output'])
    finally:
        sys.argv = argv
    solver = app.solver
    integ = solver.integrator
    states = solver.states
    dt = float(solver.dt)
    n = sum(int(np.asarray(s['n_act'])) for s in states.values())
    fdt = next(iter(states.values()))['x'].dtype
    _, _, carry0 = jax.jit(lambda s: integ.initial_acceleration(s, 0.0, dt))(states)
    t0 = jnp.asarray(0.0, dtype=fdt)
    pack, unpack = make_packer((states, t0, carry0))
    @jax.jit
    def run_block(blob):
        def body(carry, _):
            s, t, nnps = carry
            s, _d, nnps = integ.step(s, t, dt, nnps)
            return (s, t + dt, nnps), 0
        carry, _ = jax.lax.scan(body, unpack(blob), None, length=steps_per_call)
        return pack(carry)
    def force(blob):
        return np.asarray(next(iter(blob.values()))[:1])
    blob = pack((states, t0, carry0))
    t_c0 = time.time()
    blob = run_block(blob); force(blob)
    compile_s = time.time() - t_c0
    start = time.time()
    for _ in range(n_calls):
        blob = run_block(blob)
    force(blob)
    wall = time.time() - start
    sps = n_calls * steps_per_call / wall
    # finiteness
    s_out, _t, _c = unpack(blob)
    s_out = jax.jit(lambda s, c: integ.materialize_states(s, c))(s_out, _c)
    for s in s_out.values():
        assert np.all(np.isfinite(np.asarray(s['x'])))
    resident_on = integ._res_runner not in (None, False)
    return dict(resident=resident, engaged=resident_on, ms_per_step=1000*wall/(n_calls*steps_per_call),
                psps=n*sps, n=n, compile_s=compile_s)

if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'both'
    out = []
    if which in ('both', 'res'):
        out.append(measure(True))
    if which in ('both', 'slot'):
        out.append(measure(False))
    for o in out:
        print(json.dumps(o))
