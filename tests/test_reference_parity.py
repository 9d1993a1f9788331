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


# ---------------------------------------------------------------------------
# BASELINE.md gate configs: dam_break_2d (Adami wall BC) + taylor_green
# ---------------------------------------------------------------------------
def _gauss2d(dx, dy, h):
    """Gaussian kernel terms (dim=2, reference base/kernels.py:830):
    returns (W, dW/dx, dW/dy) for equal smoothing lengths."""
    r2 = dx * dx + dy * dy
    r = np.sqrt(r2)
    q = r / h
    fac = 1.0 / (np.pi * h * h)
    w = np.where(q <= 3.0, fac * np.exp(-q * q), 0.0)
    dwdq = np.where(q <= 3.0, -2.0 * q * w, 0.0)
    with np.errstate(divide='ignore', invalid='ignore'):
        tmp = np.where(r > 1e-12, dwdq / (h * r), 0.0)
    return w, tmp * dx, tmp * dy


@pytest.mark.slow
def test_dam_break_2d_adami_wall_bc_1e6():
    """dam_break_2d gate (BASELINE.md): the Adami generalized wall BC
    (reference wc/transport_velocity.py:641 SolidWallPressureBC, :84
    SetWallVelocity, :548 SolidWallNoSlipBC) + Monaghan momentum with
    a wall source, against an independent float64 all-pairs numpy
    oracle at 1e-6 relative L2 on wall p/rho and fluid au/av."""
    from pysph_tpu.base.kernels import Gaussian
    from pysph_tpu.base.utils import get_particle_array
    from pysph_tpu.sph.equation import Group
    from pysph_tpu.sph.wc.basic import MomentumEquation, TaitEOS
    from pysph_tpu.sph.wc.transport_velocity import (
        SetWallVelocity, SolidWallNoSlipBC, SolidWallPressureBC,
        VolumeSummation)
    from pysph_tpu.tools.sph_evaluator import SPHEvaluator

    dx = 0.05
    rho0, c0, gamma, g = 1000.0, 40.0, 7.0, -9.81
    p0 = rho0 * c0 * c0 / gamma
    nu, alpha = 1e-4, 0.1
    # fluid block resting on a two-layer floor
    xf, yf = np.mgrid[dx / 2:0.4:dx, dx / 2:0.3:dx]
    xf, yf = xf.ravel(), yf.ravel()
    rng = np.random.RandomState(3)
    rhof = rho0 * (1.0 + 0.02 * rng.rand(xf.size))
    uf_ = 0.1 * rng.randn(xf.size)
    vf_ = 0.1 * rng.randn(xf.size)
    xb, yb = np.mgrid[-2 * dx:0.4 + 2 * dx:dx,
                      -dx / 2:-2 * dx - dx:-dx]
    xb, yb = xb.ravel(), yb.ravel()
    h = 1.3 * dx
    m = rho0 * dx * dx
    extra = dict(V=0.0, uf=0.0, vf=0.0, wf=0.0, wij=0.0, ug=0.0,
                 vg=0.0, wg=0.0, auhat=0.0, avhat=0.0, awhat=0.0,
                 cs=0.0, dt_cfl=0.0, dt_force=0.0, au=0.0, av=0.0,
                 aw=0.0)
    fluid = get_particle_array(
        name='fluid', x=xf, y=yf, m=m, rho=rhof, h=h, u=uf_, v=vf_,
        p=0.0, **extra)
    wall = get_particle_array(
        name='wall', x=xb, y=yb, m=m, rho=rho0, h=h, p=0.0, **extra)
    eqs = [
        Group(equations=[
            TaitEOS('fluid', None, rho0=rho0, c0=c0, gamma=gamma),
            VolumeSummation('fluid', ['fluid', 'wall']),
            VolumeSummation('wall', ['fluid', 'wall']),
        ], real=False),
        # separate groups, as the reference's TVFScheme does
        # (scheme.py:637,643): both accumulate d_wij
        Group(equations=[SetWallVelocity('wall', ['fluid'])],
              real=False),
        Group(equations=[SolidWallPressureBC('wall', ['fluid'],
                                             rho0=rho0, p0=p0, gy=g)],
              real=False),
        Group(equations=[
            MomentumEquation('fluid', ['fluid', 'wall'], c0=c0,
                             alpha=alpha, beta=0.0, gy=g),
            SolidWallNoSlipBC('fluid', ['wall'], nu=nu),
        ]),
    ]
    ev = SPHEvaluator([fluid, wall], eqs, dim=2,
                      kernel=Gaussian(dim=2))
    ev.evaluate(t=0.0, dt=1e-4)

    # ---- float64 numpy oracle (all pairs) ----
    B = rho0 * c0 * c0 / gamma
    pf = B * ((rhof / rho0) ** gamma - 1.0)
    csf = c0 * (rhof / rho0) ** (0.5 * (gamma - 1.0))
    xall = np.concatenate([xf, xb])
    yall = np.concatenate([yf, yb])
    nf = xf.size

    def WDW(xd, yd, xs, ys):
        return _gauss2d(xd[:, None] - xs[None, :],
                        yd[:, None] - ys[None, :], h)

    w_aa, _, _ = WDW(xall, yall, xall, yall)
    V_all = np.sum(w_aa, axis=1)           # number density, everyone
    w_bf, _, _ = WDW(xb, yb, xf, yf)
    wij_b = np.sum(w_bf, axis=1)
    has = wij_b > 1e-12
    den = np.where(has, wij_b, 1.0)
    ufw = np.where(has, w_bf @ uf_ / den, 0.0)
    vfw = np.where(has, w_bf @ vf_ / den, 0.0)
    ug = -ufw                              # wall at rest: 2*0 - uf
    vg = -vfw
    # Adami wall pressure: XIJ = x_wall - x_fluid, wall accel = 0
    gdotx = g * (yb[:, None] - yf[None, :])
    pw_num = np.sum(w_bf * (pf[None, :] + rhof[None, :] * gdotx),
                    axis=1)
    den_p = np.where(wij_b > 1e-14, wij_b, 1.0)
    pw = np.where(wij_b > 1e-14, pw_num / den_p, 0.0)
    rhow = rho0 * (pw / p0 + 1.0)

    # fluid momentum: sources fluid + wall (wall cs = 0, Tait skipped)
    pall = np.concatenate([pf, pw])
    rhoall = np.concatenate([rhof, rhow])
    csall = np.concatenate([csf, np.zeros(xb.size)])
    uall = np.concatenate([uf_, np.zeros(xb.size)])
    vall = np.concatenate([vf_, np.zeros(xb.size)])
    dxp = xf[:, None] - xall[None, :]
    dyp = yf[:, None] - yall[None, :]
    du = uf_[:, None] - uall[None, :]
    dv = vf_[:, None] - vall[None, :]
    w, dwx, dwy = _gauss2d(dxp, dyp, h)
    r2 = dxp * dxp + dyp * dyp
    eps = 0.01 * h * h
    vdotx = du * dxp + dv * dyp
    rhoij1 = 2.0 / (rhof[:, None] + rhoall[None, :])
    cij = 0.5 * (csf[:, None] + csall[None, :])
    muij = h * vdotx / (r2 + eps)
    piij = np.where(vdotx < 0, (-alpha * cij * muij) * rhoij1, 0.0)
    tmp = (pf / rhof ** 2)[:, None] + (pall / rhoall ** 2)[None, :]
    au = np.sum(-m * (tmp + piij) * dwx, axis=1)
    av = np.sum(-m * (tmp + piij) * dwy, axis=1) + g
    # no-slip viscous wall force
    dxw = xf[:, None] - xb[None, :]
    dyw = yf[:, None] - yb[None, :]
    ww, dwxw, dwyw = _gauss2d(dxw, dyw, h)
    r2w = dxw * dxw + dyw * dyw
    eta_f = nu * rhof
    eta_w = nu * rhow
    etaij = 2.0 * (eta_f[:, None] * eta_w[None, :]) / \
        (eta_f[:, None] + eta_w[None, :])
    Fij = dxw * dwxw + dyw * dwyw
    Vi = (1.0 / V_all[:nf]) ** 2
    Vj = (1.0 / V_all[nf:]) ** 2
    fac = (1.0 / m) * (Vi[:, None] + Vj[None, :]) * etaij * Fij / \
        (r2w + eps)
    au += np.sum(fac * (uf_[:, None] - ug[None, :]), axis=1)
    av += np.sum(fac * (vf_[:, None] - vg[None, :]), axis=1)

    assert _rel_l2(np.asarray(wall.p), pw) <= 1e-6
    assert _rel_l2(np.asarray(wall.rho), rhow) <= 1e-6
    assert _rel_l2(np.asarray(fluid.au), au) <= 1e-6
    assert _rel_l2(np.asarray(fluid.av), av) <= 1e-6


@pytest.mark.slow
def test_taylor_green_periodic_tvf_1e6():
    """taylor_green gate (BASELINE.md): the periodic TVF pipeline
    (SummationDensity -> StateEquation -> pressure gradient +
    viscosity + artificial stress; reference
    wc/transport_velocity.py:24,176,219,328,451) on a fully periodic
    box, against a float64 minimum-image all-pairs oracle at 1e-6
    relative L2 on rho/p/au/av/auhat."""
    from pysph_tpu.base.domain import DomainManager
    from pysph_tpu.base.kernels import Gaussian
    from pysph_tpu.base.utils import get_particle_array
    from pysph_tpu.sph.equation import Group
    from pysph_tpu.sph.wc.transport_velocity import (
        MomentumEquationArtificialStress,
        MomentumEquationPressureGradient, MomentumEquationViscosity,
        StateEquation, SummationDensity)
    from pysph_tpu.tools.sph_evaluator import SPHEvaluator

    L = 1.0
    nx = 12
    dx = L / nx
    rho0, U = 1.0, 1.0
    c0 = 10.0 * U
    p0 = c0 * c0 * rho0
    nu = 0.01
    xg, yg = np.mgrid[dx / 2:L:dx, dx / 2:L:dx]
    x, y = xg.ravel(), yg.ravel()
    rng = np.random.RandomState(11)
    x = (x + 0.05 * dx * rng.randn(x.size)) % L
    y = (y + 0.05 * dx * rng.randn(y.size)) % L
    u = -U * np.cos(2 * np.pi * x) * np.sin(2 * np.pi * y)
    v = U * np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y)
    uhat = u * 1.02
    vhat = v * 0.98
    h = 1.2 * dx
    m = rho0 * dx * dx
    fluid = get_particle_array(
        name='fluid', x=x, y=y, m=m, rho=rho0, h=h, u=u, v=v, p=0.0,
        V=0.0, uhat=uhat, vhat=vhat, what=0.0, au=0.0, av=0.0, aw=0.0,
        auhat=0.0, avhat=0.0, awhat=0.0)
    dom = DomainManager(xmin=0, xmax=L, ymin=0, ymax=L,
                        periodic_in_x=True, periodic_in_y=True)
    eqs = [
        Group(equations=[SummationDensity('fluid', ['fluid'])],
              real=False),
        Group(equations=[StateEquation('fluid', None, p0=p0,
                                       rho0=rho0, b=1.0)],
              real=False),
        Group(equations=[
            MomentumEquationPressureGradient('fluid', ['fluid'],
                                             pb=p0),
            MomentumEquationViscosity('fluid', ['fluid'], nu=nu),
            MomentumEquationArtificialStress('fluid', ['fluid']),
        ]),
    ]
    ev = SPHEvaluator([fluid], eqs, dim=2, kernel=Gaussian(dim=2),
                      domain_manager=dom)
    ev.evaluate(t=0.0, dt=1e-4)

    # ---- float64 minimum-image all-pairs oracle ----
    def mi(d):
        return d - L * np.round(d / L)

    dxp = mi(x[:, None] - x[None, :])
    dyp = mi(y[:, None] - y[None, :])
    w, dwx, dwy = _gauss2d(dxp, dyp, h)
    V = np.sum(w, axis=1)
    rho = m * V
    p = p0 * (rho / rho0 - 1.0)
    pij = (rho[None, :] * p[:, None] + rho[:, None] * p[None, :]) / \
        (rho[:, None] + rho[None, :])
    Vi2 = (1.0 / V) ** 2
    fac = (Vi2[:, None] + Vi2[None, :]) / m
    au = np.sum(-pij * fac * dwx, axis=1)
    av = np.sum(-pij * fac * dwy, axis=1)
    auhat = np.sum(-p0 * fac * dwx, axis=1)
    # viscosity
    r2 = dxp * dxp + dyp * dyp
    eps = 0.01 * h * h
    eta = nu * rho
    etaij = 2.0 * eta[:, None] * eta[None, :] / \
        (eta[:, None] + eta[None, :])
    Fij = dxp * dwx + dyp * dwy
    du = u[:, None] - u[None, :]
    dv = v[:, None] - v[None, :]
    visc = fac * etaij * Fij / (r2 + eps)
    au += np.sum(visc * du, axis=1)
    av += np.sum(visc * dv, axis=1)
    # artificial stress
    dui = uhat - u
    dvi = vhat - v
    Ax = 0.5 * ((rho * u * dui)[:, None] + (rho * u * dui)[None, :]) \
        * dwx + 0.5 * ((rho * u * dvi)[:, None] +
                       (rho * u * dvi)[None, :]) * dwy
    Ay = 0.5 * ((rho * v * dui)[:, None] + (rho * v * dui)[None, :]) \
        * dwx + 0.5 * ((rho * v * dvi)[:, None] +
                       (rho * v * dvi)[None, :]) * dwy
    au += np.sum(fac * Ax, axis=1)
    av += np.sum(fac * Ay, axis=1)

    assert _rel_l2(np.asarray(fluid.rho), rho) <= 1e-6
    assert _rel_l2(np.asarray(fluid.p), p) <= 1e-6
    assert _rel_l2(np.asarray(fluid.au), au) <= 1e-6
    assert _rel_l2(np.asarray(fluid.av), av) <= 1e-6
    assert _rel_l2(np.asarray(fluid.auhat), auhat) <= 1e-6


# ---------------------------------------------------------------------------
# IISPH: iterative relaxed-Jacobi pressure solve
# (reference /root/reference/pysph/sph/iisph.py:264-367)
# ---------------------------------------------------------------------------
class NumpyIISPH(object):
    """All-pairs float64 IISPH (fluids only, nu=0): summation density,
    advection prediction, dii/aii assembly, the iterated
    ComputeDIJPJ + PressureSolve group (min 2 / max 30 sweeps,
    converged on mean compression), PressureForce, Euler step — the
    reference's scalar loops vectorized, sharing no code with the
    engine under test."""

    def __init__(self, x, y, m, h, u, v, rho0, omega=0.5, tol=1e-2,
                 gy=0.0):
        self.x, self.y = x.astype(np.float64), y.astype(np.float64)
        self.m, self.h = m.astype(np.float64), h.astype(np.float64)
        self.u, self.v = u.astype(np.float64), v.astype(np.float64)
        self.rho0, self.omega, self.tol, self.gy = rho0, omega, tol, gy
        n = x.size
        self.p = np.zeros(n)
        self.rho = np.zeros(n)
        self.iterations = []

    # CubicSpline dim=2 (reference base/kernels.py:29): sigma=10/(7pi)
    def _kern(self):
        dxp = self.x[:, None] - self.x[None, :]
        dyp = self.y[:, None] - self.y[None, :]
        r = np.sqrt(dxp * dxp + dyp * dyp)
        hij = 0.5 * (self.h[:, None] + self.h[None, :])
        q = r / hij
        sig = 10.0 / (7.0 * np.pi)
        fac = sig / (hij * hij)
        w_in = 1.0 - 1.5 * q * q * (1.0 - 0.5 * q)
        w_mid = 0.25 * (2.0 - q) ** 3
        w = fac * np.where(q > 2.0, 0.0,
                           np.where(q > 1.0, w_mid, w_in))
        dw_in = -3.0 * q * (1.0 - 0.75 * q)
        dw_mid = -0.75 * (2.0 - q) ** 2
        dwdq = np.where(q > 2.0, 0.0,
                        np.where(q > 1.0, dw_mid, dw_in))
        rinv = np.where(r > 1e-12, 1.0 / np.maximum(r, 1e-12), 0.0)
        grad = sig / (hij ** 3) * dwdq * rinv
        dwx = grad * dxp
        dwy = grad * dyp
        return w, dwx, dwy

    def step(self, dt):
        m, rho0 = self.m, self.rho0
        w, dwx, dwy = self._kern()
        # SummationDensity
        rho = np.sum(m[None, :] * w, axis=1)
        # AdvectionAcceleration (nu = 0)
        uadv = self.u + dt * 0.0
        vadv = self.v + dt * self.gy
        # ComputeDII
        ri2 = 1.0 / (rho * rho)
        dii0 = np.sum(-m[None, :] * ri2[:, None] * dwx, axis=1)
        dii1 = np.sum(-m[None, :] * ri2[:, None] * dwy, axis=1)
        # ComputeRhoAdvection + ComputeAII
        du = uadv[:, None] - uadv[None, :]
        dv = vadv[:, None] - vadv[None, :]
        rho_adv = rho + dt * np.sum(
            m[None, :] * (du * dwx + dv * dwy), axis=1)
        piter = 0.5 * self.p
        fac = (self.m * ri2)
        aii = np.sum(m[None, :] * (
            (dii0[:, None] - fac[:, None] * dwx) * dwx +
            (dii1[:, None] - fac[:, None] * dwy) * dwy), axis=1)
        # iterated pressure group (min 2, max 30)
        dt2 = dt * dt
        it = 0
        while True:
            # ComputeDIJPJ
            rj2pj = m / (rho * rho) * piter
            dijpj0 = np.sum(-rj2pj[None, :] * dwx, axis=1)
            dijpj1 = np.sum(-rj2pj[None, :] * dwy, axis=1)
            # PressureSolve sweep
            facp = self.m * ri2 * piter
            djkpk0 = dijpj0[None, :] - facp[:, None] * dwx
            djkpk1 = dijpj1[None, :] - facp[:, None] * dwy
            tmp0 = dijpj0[:, None] - (dii0 * piter)[None, :] - djkpk0
            tmp1 = dijpj1[:, None] - (dii1 * piter)[None, :] - djkpk1
            psum = np.sum(m[None, :] * (tmp0 * dwx + tmp1 * dwy),
                          axis=1)
            tmp = rho0 - rho_adv - psum * dt2
            dnr = aii * dt2
            ok = np.abs(dnr) > 1e-9
            pnew = np.where(ok, np.maximum(
                (1.0 - self.omega) * piter +
                self.omega / np.where(ok, dnr, 1.0) * tmp, 0.0), 0.0)
            compression = np.where(pnew != 0.0,
                                   np.abs(pnew * dnr - tmp) + rho0,
                                   rho0)
            piter = pnew
            it += 1
            cnt = np.sum(compression > 0)
            avg = np.sum(compression) / cnt if cnt else rho0
            conv = abs(avg - rho0) / rho0 <= self.tol
            if not (it < 30 and not (conv and it >= 2)):
                break
        self.iterations.append(it)
        p = piter
        # PressureForce
        pfac = -m[None, :] * (p * ri2)[:, None]
        pfac = pfac + (-m * p / (rho * rho))[None, :]
        au = np.sum(pfac * dwx, axis=1)
        av = np.sum(pfac * dwy, axis=1)
        # IISPHStep stage1 (Euler)
        self.u = uadv + dt * au
        self.v = vadv + dt * av
        self.x = self.x + dt * self.u
        self.y = self.y + dt * self.v
        self.rho, self.p = rho, p


def test_iisph_pressure_solve_1e6():
    """IISPH dam-break-class physics (BASELINE.md benchmark config
    row 5): the iterated relaxed-Jacobi group must track the
    independent float64 all-pairs oracle to 1e-6 relative L2 on
    rho/p/x/u over 3 Euler steps, including the data-dependent sweep
    count (reference sph/iisph.py:264-367, Group(iterate=True,
    max_iterations=30, min_iterations=2) iisph.py:625)."""
    from pysph_tpu.base.cell_grid import GridSpec
    from pysph_tpu.base.kernels import CubicSpline
    from pysph_tpu.base.utils import get_particle_array_iisph
    from pysph_tpu.sph.acceleration_eval import AccelerationEval
    from pysph_tpu.sph.iisph import IISPHScheme, IISPHStep
    from pysph_tpu.sph.integrator import EulerIntegrator

    dx, rho0 = 0.1, 1000.0
    span = np.arange(-0.7, 0.7 + 1e-9, dx)
    x, y = np.meshgrid(span, span)
    x, y = x.ravel(), y.ravel()
    n = x.size
    m = np.full(n, rho0 * dx * dx)
    h = np.full(n, 1.3 * dx)
    # strong inward velocity -> compression -> a multi-sweep solve
    u, v = -5.0 * x, -5.0 * y

    scheme = IISPHScheme(fluids=['fluid'], solids=[], dim=2,
                         rho0=rho0, nu=0.0, omega=0.5,
                         tolerance=1e-2)
    pa = get_particle_array_iisph(name='fluid', x=x, y=y, m=m, h=h,
                                  u=u, v=v)
    scheme.setup_properties([pa], clean=False)
    equations = scheme.get_equations()
    integrator = EulerIntegrator(fluid=IISPHStep())
    a_eval = AccelerationEval([pa], equations, CubicSpline(dim=2))
    integrator.set_acceleration_evals([a_eval])
    integrator.set_nnps(GridSpec.from_particles(
        [pa], dim=2, radius_scale=2.0, capacity_slack=2.5))

    oracle = NumpyIISPH(x, y, m, h, u, v, rho0)
    state, _ = pa.to_device()
    assert state['x'].dtype == jnp.float64
    states = {'fluid': state}
    dt = 5e-3
    t, carry = 0.0, None
    for _ in range(3):
        states, diag, carry = integrator.step(states, t, dt, carry)
        oracle.step(dt)
        t += dt
    for k in ('cell_overflow', 'extent_overflow'):
        assert not bool(diag[k])
    assert max(oracle.iterations) > 2, \
        'oracle converged trivially; test is vacuous'

    s = jax.tree_util.tree_map(np.asarray, states['fluid'])
    assert int(s['n_act']) == n
    for prop, ref in (('rho', oracle.rho), ('p', oracle.p),
                      ('x', oracle.x), ('y', oracle.y),
                      ('u', oracle.u), ('v', oracle.v)):
        err = _rel_l2(s[prop][:n], ref)
        assert err <= 1e-6, '%s rel L2 %.3g > 1e-6' % (prop, err)


# ---------------------------------------------------------------------------
# delta-SPH (+ gradient correction) — the BASELINE dam_break_3d variant's
# physics (reference wc/basic.py:272-416, wc/kernel_correction.py:40-124)
# ---------------------------------------------------------------------------
class NumpyDeltaSPH(NumpyWCSPH):
    """All-pairs float64 WCSPH + delta-SPH: Marrone 2011 eqn (5a/5b)
    diffusive continuity with Bonet-Lok-corrected renormalized
    density gradients, JOSEPHINE-style velocity diffusion replacing
    the Monaghan artificial viscosity (the WCSPHScheme delta_sph=True
    assembly, reference scheme.py:434-470)."""

    def __init__(self, *args, delta=0.1, **kw):
        super(NumpyDeltaSPH, self).__init__(*args, **kw)
        self.delta = delta

    def accelerations(self):
        self.eos()
        x, y, u, v = self.x, self.y, self.u, self.v
        dx = x[:, None] - x[None, :]
        dy = y[:, None] - y[None, :]
        du = u[:, None] - u[None, :]
        dv = v[:, None] - v[None, :]
        hij = 0.5 * (self.h[:, None] + self.h[None, :])
        w, dwx, dwy = self._kernel_terms(dx, dy, hij)
        mj = self.m[None, :]
        Vj = mj / self.rho[None, :]
        eps = 0.01 * hij * hij
        r2 = dx * dx + dy * dy

        # GradientCorrectionPreStep: A_i = -sum_j V_j DW (x) XIJ
        A = np.empty((x.size, 2, 2))
        A[:, 0, 0] = np.sum(-Vj * dwx * dx, axis=1)
        A[:, 0, 1] = np.sum(-Vj * dwx * dy, axis=1)
        A[:, 1, 0] = np.sum(-Vj * dwy * dx, axis=1)
        A[:, 1, 1] = np.sum(-Vj * dwy * dy, axis=1)
        # GradientCorrection: solve A_i res = DWIJ per pair; accept
        # when the L1 change is below tol (reference
        # kernel_correction.py:98-124)
        Ainv = np.linalg.inv(A)
        resx = Ainv[:, 0, 0][:, None] * dwx + \
            Ainv[:, 0, 1][:, None] * dwy
        resy = Ainv[:, 1, 0][:, None] * dwx + \
            Ainv[:, 1, 1][:, None] * dwy
        eps1 = 1.0e-4 * hij
        change = np.abs((np.abs(resx) + np.abs(resy)) -
                        (np.abs(dwx) + np.abs(dwy))) / \
            (np.abs(dwx) + np.abs(dwy) + eps1)
        ok = change < 0.1
        dwcx = np.where(ok, resx, dwx)
        dwcy = np.where(ok, resy, dwy)

        # ContinuityEquationDeltaSPHPreStep (corrected gradients)
        drho = self.rho[None, :] - self.rho[:, None]
        gradrx = np.sum(drho * Vj * dwcx, axis=1)
        gradry = np.sum(drho * Vj * dwcy, axis=1)

        # ContinuityEquation (plain) + delta term (plain gradients)
        arho = np.sum(mj * (du * dwx + dv * dwy), axis=1)
        fac = -2.0 * drho / (r2 + eps)
        psix = fac * dx - gradrx[:, None] - gradrx[None, :]
        psiy = fac * dy - gradry[:, None] - gradry[None, :]
        arho += np.sum(self.delta * hij * self.c0 *
                       (psix * dwx + psiy * dwy) * Vj, axis=1)

        # MomentumEquation with alpha=0 + MomentumEquationDeltaSPH
        tmpi = (self.p / (self.rho * self.rho))[:, None]
        tmpj = (self.p / (self.rho * self.rho))[None, :]
        facp = -mj * (tmpi + tmpj)
        au = np.sum(facp * dwx, axis=1)
        av = np.sum(facp * dwy, axis=1)
        vdotx = du * dx + dv * dy
        piij = vdotx / (r2 + eps)
        tmpd = (self.alpha * hij * self.c0 * self.rho0 * piij * Vj /
                self.rho[:, None])
        au += np.sum(tmpd * dwx, axis=1)
        av += np.sum(tmpd * dwy, axis=1)

        # XSPH
        rhoij1 = 2.0 / (self.rho[:, None] + self.rho[None, :])
        ax = u - self.eps_xsph * np.sum(mj * w * rhoij1 * du, axis=1)
        ay = v - self.eps_xsph * np.sum(mj * w * rhoij1 * dv, axis=1)
        return arho, au, av, ax, ay


@pytest.mark.slow
def test_delta_sph_gradient_correction_1e6():
    """WCSPH + delta-SPH (the BASELINE multi-chip dam-break variant):
    rho/p/x/u track the independent float64 oracle to 1e-6 relative
    L2 over 6 EPEC steps — gates the renormalized-gradient pipeline
    (moment matrix, per-pair corrected DWIJ, diffusive continuity,
    JOSEPHINE momentum diffusion)."""
    from pysph_tpu.base.cell_grid import GridSpec
    from pysph_tpu.base.kernels import Gaussian
    from pysph_tpu.base.utils import get_particle_array_wcsph
    from pysph_tpu.sph.acceleration_eval import AccelerationEval
    from pysph_tpu.sph.integrator import EPECIntegrator
    from pysph_tpu.sph.integrator_step import WCSPHStep
    from pysph_tpu.sph.scheme import WCSPHScheme

    c0, alpha, delta = 1400.0, 0.2, 0.1
    x, y, m, h, rho, u, v = _drop_particles(nx=10)
    oracle = NumpyDeltaSPH(x, y, m, h, rho, u, v, rho0=1.0, c0=c0,
                           gamma=7.0, alpha=alpha, beta=0.0,
                           delta=delta)

    scheme = WCSPHScheme(
        ['fluid'], [], dim=2, rho0=1.0, c0=c0, h0=float(h[0]),
        hdx=1.3, gamma=7.0, alpha=alpha, beta=0.0, delta_sph=True,
        delta=delta)
    pa = get_particle_array_wcsph(
        name='fluid', x=x, y=y, m=m, rho=rho, h=h, u=u, v=v,
        cs=np.full(x.size, c0))
    scheme.setup_properties([pa], clean=False)
    equations = scheme.get_equations()
    integrator = EPECIntegrator(fluid=WCSPHStep())
    a_eval = AccelerationEval([pa], equations, Gaussian(dim=2))
    integrator.set_acceleration_evals([a_eval])
    integrator.set_nnps(GridSpec.from_particles(
        [pa], dim=2, radius_scale=3.0, capacity_slack=2.5))

    state, _ = pa.to_device()
    assert state['x'].dtype == jnp.float64
    states = {'fluid': state}
    dt = 0.25 * 1.3 * 0.1 / (141 + c0)
    t, carry = 0.0, None
    for _ in range(6):
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
