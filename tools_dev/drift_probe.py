"""Load-imbalance drift over a distributed 2D dam collapse on the
8-virtual-device CPU mesh: max/mean block occupancy every 50 steps,
with and without periodic re-split (DistributedRunner.rebalance).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu python tools_dev/drift_probe.py
"""
import os
import sys

os.environ.setdefault(
    'XLA_FLAGS', '--xla_force_host_platform_device_count=8')
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.argv = ['probe']

import numpy as np  # noqa: E402


def main(n_steps=3000, lb_freq=500):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    from pysph_tpu.base.cell_grid import GridSpec
    from pysph_tpu.base.kernels import CubicSpline
    from pysph_tpu.base.utils import get_particle_array_wcsph
    from pysph_tpu.parallel.domain_decomp import (
        BlockPartition, DistributedRunner)
    from pysph_tpu.sph.acceleration_eval import AccelerationEval
    from pysph_tpu.sph.basic_equations import (
        ContinuityEquation, XSPHCorrection)
    from pysph_tpu.sph.equation import Group
    from pysph_tpu.sph.integrator import EPECIntegrator
    from pysph_tpu.sph.integrator_step import EulerStep, WCSPHStep
    from pysph_tpu.sph.wc.basic import (
        MomentumEquation, TaitEOS, TaitEOSHGCorrection)

    def make():
        dx = 0.02
        # dam column: left quarter of a 2 x 0.5 tank
        xs = np.arange(dx, 0.5, dx)
        ys = np.arange(dx, 0.4, dx)
        x, y = np.meshgrid(xs, ys)
        x, y = x.ravel(), y.ravel()
        n = x.size
        fluid = get_particle_array_wcsph(
            name='fluid', x=x, y=y, h=np.full(n, 1.3 * dx),
            m=np.full(n, dx * dx * 1000.0), rho=np.full(n, 1000.0))
        bx = np.arange(0.0, 2.0, dx / 2)
        floor_y = np.zeros_like(bx)
        wx = np.zeros(int(0.5 / (dx / 2)))
        wy = np.arange(0.0, 0.5, dx / 2)[:wx.size]
        bx = np.concatenate([bx, wx, np.full_like(wx, 2.0)])
        by = np.concatenate([floor_y, wy, wy])
        boundary = get_particle_array_wcsph(
            name='boundary', x=bx, y=by,
            h=np.full(bx.size, 1.3 * dx),
            m=np.full(bx.size, dx * dx * 1000.0),
            rho=np.full(bx.size, 1000.0))
        return fluid, boundary

    c0 = 10.0 * np.sqrt(2 * 9.81 * 0.4)

    def equations():
        return [
            Group(equations=[
                TaitEOS('fluid', None, rho0=1000.0, c0=c0, gamma=7.0),
                TaitEOSHGCorrection('boundary', None, rho0=1000.0,
                                    c0=c0, gamma=7.0)], real=False),
            Group(equations=[
                ContinuityEquation('fluid', ['fluid', 'boundary']),
                ContinuityEquation('boundary', ['fluid']),
                MomentumEquation('fluid', ['fluid', 'boundary'],
                                 c0=c0, alpha=0.1, beta=0.0,
                                 gy=-9.81),
                XSPHCorrection('fluid', ['fluid']),
            ]),
        ]

    for mode, freq in (('static ', 0), ('lb_freq', lb_freq)):
        fluid, boundary = make()
        kernel = CubicSpline(dim=2)
        a_eval = AccelerationEval([fluid, boundary], equations(),
                                  kernel)
        integ = EPECIntegrator(fluid=WCSPHStep(), boundary=EulerStep())
        integ.set_acceleration_evals([a_eval])
        integ.set_nnps(GridSpec.from_particles(
            [fluid, boundary], dim=2, radius_scale=2.0))
        part = BlockPartition.weighted(
            8, [np.concatenate([fluid.x, boundary.x])],
            lo=0.0, hi=2.0, axes=('x',))
        runner = DistributedRunner(integ, part,
                                   devices=jax.devices()[:8],
                                   buffer_capacity=1024,
                                   rebalance_freq=freq)
        gstates = runner.distribute([fluid, boundary])
        dt = 0.125 * 1.3 * 0.02 / c0
        t = 0.0
        rows = []
        for i in range(n_steps):
            gstates, _dtn, diag = runner.step_checked(gstates, t, dt)
            t += dt
            if (i + 1) % 250 == 0:
                imb, _ = runner.imbalance(gstates)
                rows.append((i + 1, imb))
                print('%s step %4d  max/mean %5.2f' %
                      (mode, i + 1, imb), flush=True)
        print('%s summary: %s' % (
            mode, ' '.join('%d:%.2f' % r for r in rows)))


if __name__ == '__main__':
    main()
