"""Integrator tests: convergence order on a harmonic oscillator
(mirrors reference sph/tests/test_integrator.py:363-445) and adaptive-dt
logic (reference integrator.py:161-200)."""

import jax
import numpy as np

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.cell_grid import GridSpec
from pysph_tpu.base.utils import get_particle_array_wcsph
from pysph_tpu.sph.acceleration_eval import AccelerationEval
from pysph_tpu.sph.equation import Equation
from pysph_tpu.sph.integrator import (
    EPECIntegrator, EulerIntegrator, LeapFrogIntegrator, PECIntegrator,
    PEFRLIntegrator)
from pysph_tpu.sph.integrator_step import (
    EulerStep, LeapFrogStep, PEFRLStep, WCSPHStep)


class HarmonicForce(Equation):
    """au = -x, with the XSPH advection velocity ax = u."""

    def initialize(self, d_idx, d_au, d_av, d_aw, d_ax, d_ay, d_az,
                   d_arho, d_ae, d_x, d_u):
        d_au[d_idx] = -d_x[d_idx]
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0
        d_ax[d_idx] = d_u[d_idx]
        d_ay[d_idx] = 0.0
        d_az[d_idx] = 0.0
        d_arho[d_idx] = 0.0
        d_ae[d_idx] = 0.0


class XSPHZero(Equation):
    """For steppers where ax carries only the XSPH correction (zero)."""

    def initialize(self, d_idx, d_au, d_av, d_aw, d_ax, d_ay, d_az,
                   d_arho, d_ae, d_x):
        d_au[d_idx] = -d_x[d_idx]
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0
        d_ax[d_idx] = 0.0
        d_ay[d_idx] = 0.0
        d_az[d_idx] = 0.0
        d_arho[d_idx] = 0.0
        d_ae[d_idx] = 0.0


def _integrate(integrator_cls, stepper, equation_cls, tf, dt):
    pa = get_particle_array_wcsph(name='fluid', x=[1.0], u=[0.0],
                                  h=[1.0], m=[1.0], rho=[1.0])
    pa.add_property('ae')
    pa.add_property('e')
    kernel = CubicSpline(dim=1)
    a_eval = AccelerationEval([pa], [equation_cls('fluid', None)], kernel)
    integrator = integrator_cls(fluid=stepper)
    integrator.set_acceleration_evals([a_eval])
    integrator.set_nnps(GridSpec.from_particles(
        [pa], dim=1, radius_scale=2.0))
    states = {'fluid': pa.to_device()[0]}
    states, _, carry = integrator.initial_acceleration(states, 0.0, dt)

    @jax.jit
    def step(states, t, dt, carry):
        s, _, carry = integrator.step(states, t, dt, carry)
        return s, carry

    t = 0.0
    n = int(round(tf / dt))
    for i in range(n):
        states, carry = step(states, t, dt, carry)
        t += dt
    return float(states['fluid']['x'][0]), t


def _error(integrator_cls, stepper, eq, dt, tf=1.0):
    x, t = _integrate(integrator_cls, stepper, eq, tf, dt)
    return abs(x - np.cos(t))


def test_euler_is_first_order():
    e1 = _error(EulerIntegrator, EulerStep(), HarmonicForce, 0.02)
    e2 = _error(EulerIntegrator, EulerStep(), HarmonicForce, 0.01)
    ratio = e1 / e2
    assert 1.5 < ratio < 2.8, ratio


def test_pec_wcsph_is_second_order():
    e1 = _error(PECIntegrator, WCSPHStep(), HarmonicForce, 0.02)
    e2 = _error(PECIntegrator, WCSPHStep(), HarmonicForce, 0.01)
    ratio = e1 / e2
    assert 2.5 < ratio < 6.0, ratio


def test_epec_wcsph_is_second_order():
    e1 = _error(EPECIntegrator, WCSPHStep(), HarmonicForce, 0.02)
    e2 = _error(EPECIntegrator, WCSPHStep(), HarmonicForce, 0.01)
    ratio = e1 / e2
    assert 3.0 < ratio < 5.0, ratio


def test_leapfrog_is_second_order():
    e1 = _error(LeapFrogIntegrator, LeapFrogStep(), XSPHZero, 0.02)
    e2 = _error(LeapFrogIntegrator, LeapFrogStep(), XSPHZero, 0.01)
    ratio = e1 / e2
    assert 3.0 < ratio < 5.0, ratio


def test_pefrl_is_fourth_order():
    e1 = _error(PEFRLIntegrator, PEFRLStep(), XSPHZero, 0.05)
    e2 = _error(PEFRLIntegrator, PEFRLStep(), XSPHZero, 0.025)
    ratio = e1 / e2
    assert 10.0 < ratio < 24.0, ratio


def test_adaptive_dt_from_factors():
    pa = get_particle_array_wcsph(
        name='fluid', x=[0.0, 1.0], h=[0.5, 0.25], m=[1.0, 1.0],
        rho=[1.0, 1.0])
    pa.add_property('dt_cfl', data=[10.0, 20.0])
    pa.add_property('dt_force', data=[4.0, 16.0])
    pa.add_property('ae')
    pa.add_property('e')
    kernel = CubicSpline(dim=1)
    a_eval = AccelerationEval(
        [pa], [HarmonicForce('fluid', None)], kernel)
    integrator = EPECIntegrator(fluid=WCSPHStep())
    integrator.set_acceleration_evals([a_eval])
    integrator.set_nnps(GridSpec.from_particles(
        [pa], dim=1, radius_scale=2.0))
    states = {'fluid': pa.to_device()[0]}
    import jax.numpy as jnp
    dt = integrator.compute_time_step(states, jnp.asarray(1.0), cfl=0.5)
    # hmin = 0.25; dt_cfl = 0.25/20; dt_force = sqrt(0.25/sqrt(16)) = 0.25
    expected = 0.5 * min(0.25 / 20.0, np.sqrt(0.25 / 4.0))
    np.testing.assert_allclose(float(dt), expected)


def test_explicit_dt_adapt_overrides():
    pa = get_particle_array_wcsph(
        name='fluid', x=[0.0, 1.0], h=[0.5, 0.25], m=[1.0, 1.0],
        rho=[1.0, 1.0])
    pa.add_property('dt_adapt', data=[0.123, 0.5])
    pa.add_property('dt_cfl', data=[10.0, 20.0])
    pa.add_property('ae')
    pa.add_property('e')
    kernel = CubicSpline(dim=1)
    a_eval = AccelerationEval(
        [pa], [HarmonicForce('fluid', None)], kernel)
    integrator = EPECIntegrator(fluid=WCSPHStep())
    integrator.set_acceleration_evals([a_eval])
    states = {'fluid': pa.to_device()[0]}
    import jax.numpy as jnp
    dt = integrator.compute_time_step(states, jnp.asarray(1.0), cfl=0.5)
    np.testing.assert_allclose(float(dt), 0.123)
