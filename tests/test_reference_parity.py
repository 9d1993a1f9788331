"""Accuracy gate against the reference implementation's semantics.

BASELINE.json demands density/pressure matching the Cython reference to
1e-6 relative L2.  The reference cannot be compiled in this image (no
cython/compyle), so the gate is built from two independent oracles:

1. A scalar float64 NumPy *mini-reference*: a from-scratch, all-pairs
   implementation of the exact WCSPH equations the reference documents
   (TaitEOS /root/reference/pysph/sph/wc/basic.py:9, ContinuityEquation
   basic_equations.py:180, Monaghan MomentumEquation wc/basic.py:129,
   XSPHCorrection basic_equations.py:260) stepped with the EPEC
   one_timestep semantics (integrator.py:367, WCSPHStep
   integrator_step.py:38).  It shares *no* code with the engine under
   test (no cell grid, no masks, no jax) and asserts <=1e-6 relative
   L2 on rho/p/positions/velocities after multiple steps in x64.

2. The analytical elliptical-drop solution (Monaghan 1994; ODE from
   /root/reference/pysph/examples/elliptical_drop.py:32-77): the
   semi-major axis after a full tf=0.0076 run must match the exact
   value to the discretization tolerance the reference reports.
"""

import numpy as np
import pytest

import jax  # noqa: F401  (conftest configures x64 + cpu)
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Scalar float64 mini-reference (independent oracle)
# ---------------------------------------------------------------------------
class NumpyWCSPH(object):
    """All-pairs float64 WCSPH: Tait EOS + continuity + Monaghan
    momentum + XSPH, EPEC-stepped.  Vectorized numpy but mathematically
    the reference's scalar loops."""

    def __init__(self, x, y, m, h, rho, u, v, rho0, c0, gamma, alpha,
                 beta, eps_xsph=0.5):
        self.x = x.astype(np.float64).copy()
        self.y = y.astype(np.float64).copy()
        self.m = m.astype(np.float64).copy()
        self.h = h.astype(np.float64).copy()
        self.rho = rho.astype(np.float64).copy()
        self.u = u.astype(np.float64).copy()
        self.v = v.astype(np.float64).copy()
        self.rho0, self.c0, self.gamma = rho0, c0, gamma
        self.alpha, self.beta = alpha, beta
        self.eps_xsph = eps_xsph
        self.p = np.zeros_like(self.x)
        self.cs = np.zeros_like(self.x)

    # Gaussian kernel, dim=2 (reference base/kernels.py:830):
    # W = sigma/h^2 * exp(-q^2) for q <= 3, sigma = 1/pi
    def _kernel_terms(self, dx, dy, hij):
        r2 = dx * dx + dy * dy
        r = np.sqrt(r2)
        q = r / hij
        fac = 1.0 / (np.pi * hij * hij)
        w = np.where(q <= 3.0, fac * np.exp(-q * q), 0.0)
        # dW/dq / (h*r) * (dx, dy):  dW/dq = -2 q W
        dwdq = np.where(q <= 3.0, -2.0 * q * w, 0.0)
        with np.errstate(divide='ignore', invalid='ignore'):
            tmp = np.where(r > 1e-12, dwdq / (hij * r), 0.0)
        return w, tmp * dx, tmp * dy

    def eos(self):
        ratio = self.rho / self.rho0
        B = self.rho0 * self.c0 * self.c0 / self.gamma
        self.p = B * (ratio ** self.gamma - 1.0)
        self.cs = self.c0 * ratio ** (0.5 * (self.gamma - 1.0))

    def accelerations(self):
        """Returns (arho, au, av, ax, ay) summed over ALL pairs (the
        kernel truncation zeroes non-neighbors)."""
        self.eos()
        x, y, u, v = self.x, self.y, self.u, self.v
        dx = x[:, None] - x[None, :]
        dy = y[:, None] - y[None, :]
        du = u[:, None] - u[None, :]
        dv = v[:, None] - v[None, :]
        hij = 0.5 * (self.h[:, None] + self.h[None, :])
        w, dwx, dwy = self._kernel_terms(dx, dy, hij)
        mj = self.m[None, :]

        # continuity
        arho = np.sum(mj * (du * dwx + dv * dwy), axis=1)

        # momentum w/ artificial viscosity
        r2 = dx * dx + dy * dy
        eps2 = 0.01 * hij * hij
        vdotx = du * dx + dv * dy
        rhoij = 0.5 * (self.rho[:, None] + self.rho[None, :])
        cij = 0.5 * (self.cs[:, None] + self.cs[None, :])
        muij = hij * vdotx / (r2 + eps2)
        piij = np.where(vdotx < 0,
                        (-self.alpha * cij * muij +
                         self.beta * muij * muij) / rhoij, 0.0)
        tmpi = (self.p / (self.rho * self.rho))[:, None]
        tmpj = (self.p / (self.rho * self.rho))[None, :]
        fac = -mj * (tmpi + tmpj + piij)
        au = np.sum(fac * dwx, axis=1)
        av = np.sum(fac * dwy, axis=1)

        # XSPH: ax = u - eps * sum_j m_j vij/rhoij * Wij
        rhoij1 = 1.0 / rhoij
        ax = u - self.eps_xsph * np.sum(mj * w * rhoij1 * du, axis=1)
        ay = v - self.eps_xsph * np.sum(mj * w * rhoij1 * dv, axis=1)
        return arho, au, av, ax, ay

    def epec_step(self, dt):
        x0, y0 = self.x.copy(), self.y.copy()
        u0, v0 = self.u.copy(), self.v.copy()
        rho0 = self.rho.copy()
        # evaluate at y^n, predict to t + dt/2
        arho, au, av, ax, ay = self.accelerations()
        self.u = u0 + 0.5 * dt * au
        self.v = v0 + 0.5 * dt * av
        self.x = x0 + 0.5 * dt * ax
        self.y = y0 + 0.5 * dt * ay
        self.rho = rho0 + 0.5 * dt * arho
        # evaluate at midpoint, correct with full dt
        arho, au, av, ax, ay = self.accelerations()
        self.u = u0 + dt * au
        self.v = v0 + dt * av
        self.x = x0 + dt * ax
        self.y = y0 + dt * ay
        self.rho = rho0 + dt * arho
        # NOTE: p/cs keep their midpoint-evaluation values — the EOS
        # only runs inside acceleration evaluations, exactly like the
        # reference (the final state's p is from the second eval).


def _drop_particles(nx=10):
    dx = 1.0 / nx
    span = np.arange(-1.0 + dx / 2, 1.0, dx)
    x, y = np.meshgrid(span, span)
    x, y = x.ravel(), y.ravel()
    keep = x * x + y * y < 1.0
    x, y = x[keep], y[keep]
    n = x.size
    return (x, y, np.full(n, dx * dx), np.full(n, 1.3 * dx),
            np.ones(n), -100.0 * x, 100.0 * y)


def _engine_setup(x, y, m, h, rho, u, v, c0, alpha):
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

    pa = get_particle_array_wcsph(
        name='fluid', x=x, y=y, m=m, rho=rho, h=h, u=u, v=v,
        cs=np.full(x.size, c0))
    equations = [
        Group(equations=[TaitEOS('fluid', None, rho0=1.0, c0=c0,
                                 gamma=7.0)], real=False),
        Group(equations=[
            ContinuityEquation('fluid', ['fluid']),
            MomentumEquation('fluid', ['fluid'], c0=c0, alpha=alpha,
                             beta=0.0),
            XSPHCorrection('fluid', ['fluid']),
        ]),
    ]
    kernel = Gaussian(dim=2)
    integrator = EPECIntegrator(fluid=WCSPHStep())
    a_eval = AccelerationEval([pa], equations, kernel)
    integrator.set_acceleration_evals([a_eval])
    # generous capacity: these tests drive the integrator directly
    # (no Solver grow+redo on cell overflow), so the grid must never
    # overflow — overflow silently drops neighbors.
    integrator.set_nnps(GridSpec.from_particles(
        [pa], dim=2, radius_scale=3.0, capacity_slack=2.5))
    return pa, integrator


def _rel_l2(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    denom = np.linalg.norm(b)
    return np.linalg.norm(a - b) / (denom if denom > 0 else 1.0)


def test_wcsph_vs_scalar_reference_1e6():
    """rho/p/x/u must track the independent float64 all-pairs oracle
    to 1e-6 relative L2 over 10 EPEC steps (the BASELINE.json bar)."""
    c0, alpha = 1400.0, 0.1
    parts = _drop_particles(nx=10)
    oracle = NumpyWCSPH(*parts, rho0=1.0, c0=c0, gamma=7.0,
                        alpha=alpha, beta=0.0)
    pa, integrator = _engine_setup(*parts, c0=c0, alpha=alpha)

    state, _ = pa.to_device()
    assert state['x'].dtype == jnp.float64, 'x64 required for the gate'
    states = {'fluid': state}
    dt = 0.25 * 1.3 * 0.1 / (141 + c0)
    nsteps = 10

    step = jax.jit(lambda s, t: integrator.step(s, t, dt))
    t = 0.0
    carry = None
    for _ in range(nsteps):
        states, diag, carry = integrator.step(states, t, dt, carry)
        oracle.epec_step(dt)
        t += dt
    for k in ('cell_overflow', 'extent_overflow'):
        assert not bool(diag[k])

    s = jax.tree_util.tree_map(np.asarray, states['fluid'])
    n = oracle.x.size
    assert int(s['n_act']) == n
    for prop, ref in (('rho', oracle.rho), ('p', oracle.p),
                      ('x', oracle.x), ('y', oracle.y),
                      ('u', oracle.u), ('v', oracle.v)):
        err = _rel_l2(s[prop][:n], ref)
        assert err <= 1e-6, '%s rel L2 %.3g > 1e-6' % (prop, err)


# ---------------------------------------------------------------------------
# Analytical elliptical-drop solution
# ---------------------------------------------------------------------------
def _exact_semi_major(tf, dt=1e-6):
    """Integrate the incompressible-ellipse ODE (Monaghan 1994;
    reference examples/elliptical_drop.py:32-55) with RK4; the
    semi-major axis is 1/a(tf)."""
    def deriv(s):
        A, a = s
        a4 = a ** 4
        return np.array([A * A * (a4 - 1.0) / (a4 + 1.0), -a * A])

    s = np.array([100.0, 1.0])
    t = 0.0
    while t < tf - 1e-12:
        step = min(dt, tf - t)
        k1 = deriv(s)
        k2 = deriv(s + 0.5 * step * k1)
        k3 = deriv(s + 0.5 * step * k2)
        k4 = deriv(s + step * k3)
        s = s + (step / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        t += step
    return 1.0 / s[1]


@pytest.mark.slow
def test_elliptical_drop_semi_major_axis():
    """Full tf=0.0076 run: max(y) must land on the exact semi-major
    axis within discretization error (the check the reference's
    example/docs use, examples/elliptical_drop.py:174-180)."""
    c0, alpha = 1400.0, 0.1
    nx = 40
    dx = 1.0 / nx
    span = np.arange(-1.05, 1.05 + 1e-9, dx)
    x, y = np.meshgrid(span, span)
    x, y = x.ravel(), y.ravel()
    keep = np.sqrt(x * x + y * y) - 1.0 <= 1e-10
    x, y = x[keep], y[keep]
    n = x.size
    parts = (x, y, np.full(n, dx * dx), np.full(n, 1.3 * dx),
             np.ones(n), -100.0 * x, 100.0 * y)
    pa, integrator = _engine_setup(*parts, c0=c0, alpha=alpha)

    state, _ = pa.to_device()
    states = {'fluid': state}
    tf = 0.0076
    dt = 0.25 * 1.3 * dx / (141 + c0)

    t, carry = 0.0, None
    while t < tf - 1e-10:
        step_dt = min(dt, tf - t)
        states, diag, carry = integrator.step(states, t, step_dt, carry)
        t += step_dt
    s = jax.tree_util.tree_map(np.asarray, states['fluid'])
    assert np.isfinite(s['x'][:n]).all()

    exact = _exact_semi_major(tf)
    computed = float(np.max(s['y'][:n]))
    # the reference example reports ~1.8% discretization error at
    # nx=40 (semi-major exact ~1.0404); allow 3%.
    assert abs(computed - exact) / exact < 0.03, (computed, exact)
