"""Rigid body dynamics tests: segment-sum body reductions and rigid
motion (free fall + spin conservation)."""

import jax
import numpy as np

from pysph_tpu.base.cell_grid import GridSpec
from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array_rigid_body
from pysph_tpu.sph.acceleration_eval import AccelerationEval
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.integrator import EPECIntegrator
from pysph_tpu.sph.rigid_body import (
    BodyForce, RK2StepRigidBody, RigidBodyMoments, RigidBodyMotion)


def _setup(pa):
    kernel = CubicSpline(dim=2)
    # Moments (a reduce) must complete before Motion's initialize reads
    # cm/vc, so they go in separate groups (as the reference examples
    # do, e.g. examples/rigid_body/).
    eqs = [
        Group(equations=[BodyForce('body', None, gy=-9.81)]),
        Group(equations=[RigidBodyMoments('body', None)]),
        Group(equations=[RigidBodyMotion('body', None)]),
    ]
    a_eval = AccelerationEval([pa], eqs, kernel)
    integ = EPECIntegrator(body=RK2StepRigidBody())
    integ.set_acceleration_evals([a_eval])
    integ.set_nnps(GridSpec.from_particles([pa], dim=2,
                                           radius_scale=2.0))
    return integ


def _make_body(two_bodies=False, omega_z=0.0):
    dx = 0.1
    xs = np.arange(5) * dx
    x, y = np.meshgrid(xs, xs)
    x, y = x.ravel(), y.ravel()
    if two_bodies:
        x = np.concatenate([x, x + 2.0])
        y = np.concatenate([y, y])
        body_id = np.concatenate([np.zeros(25), np.ones(25)])
    else:
        body_id = np.zeros(x.size)
    u = -omega_z * (y - y.mean())
    v = omega_z * (x - x.mean())
    pa = get_particle_array_rigid_body(
        name='body', x=x, y=y, h=np.full(x.size, 0.13),
        m=np.full(x.size, 1.0), rho=np.ones(x.size), u=u, v=v,
        body_id=body_id.astype(int))
    return pa


def test_free_fall_two_bodies():
    pa = _make_body(two_bodies=True)
    integ = _setup(pa)
    states = {'body': pa.to_device()[0]}
    dt = 1e-3
    states, _, carry = integ.initial_acceleration(states, 0.0, dt)
    step = jax.jit(lambda s, t, c: integ.step(s, t, dt, c))
    t = 0.0
    for i in range(20):
        states, _, carry = step(states, t, carry)
        t += dt
    pa.update_from_device(states['body'])
    # each body should be in free fall: vc_y = -g t (particle v lags by
    # dt/2 since it is set at the mid-step evaluation, like the
    # reference)
    vc = np.asarray(pa.constants['vc']).reshape(2, 3)
    np.testing.assert_allclose(vc[:, 1], -9.81 * t, rtol=1e-6)
    np.testing.assert_allclose(vc[:, 0], 0.0, atol=1e-10)
    for b in (0, 1):
        vmean = pa.v[pa.body_id == b].mean()
        np.testing.assert_allclose(vmean, -9.81 * (t - dt / 2),
                                   rtol=1e-6)
    # total mass per body
    np.testing.assert_allclose(np.asarray(pa.total_mass), [25.0, 25.0])


def test_rigid_rotation_preserved():
    # omega is body state (like the reference): set it and verify the
    # free spin is preserved and particle velocities follow omega x r.
    omega = 2.0
    pa = _make_body()
    pa.constants['omega'][:] = [0.0, 0.0, omega]
    integ = _setup(pa)
    states = {'body': pa.to_device()[0]}
    dt = 1e-4
    states, _, carry = integ.initial_acceleration(states, 0.0, dt)
    pa.update_from_device(states['body'])
    cm = np.asarray(pa.constants['cm'])
    np.testing.assert_allclose(
        pa.u, -omega * (pa.y - cm[1]), atol=1e-10)
    np.testing.assert_allclose(
        pa.v, omega * (pa.x - cm[0]), atol=1e-10)
    step = jax.jit(lambda s, t, c: integ.step(s, t, dt, c))
    t = 0.0
    for i in range(10):
        states, _, carry = step(states, t, carry)
        t += dt
    pa.update_from_device(states['body'])
    # symmetric body spinning freely under gravity: omega is constant
    np.testing.assert_allclose(float(pa.omega[2]), omega, rtol=1e-5)
    np.testing.assert_allclose(float(pa.omega[0]), 0.0, atol=1e-8)
