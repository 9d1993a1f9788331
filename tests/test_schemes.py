"""Smoke tests for the scheme families added after the core engine:
each runs a tiny problem a few steps and must stay finite (the
detailed physics validation lives in the examples' post_process).
"""

import numpy as np
import pytest

import jax  # noqa: F401  (configured in conftest)


def _sod(nl=60, gamma=1.4, factory=None):
    from pysph_tpu.base.utils import get_particle_array
    dxl = 0.5 / nl
    nr = int(nl * 0.125)
    dxr = 0.5 / nr
    x = np.concatenate([np.arange(-0.5 + 0.5 * dxl, 0.0, dxl),
                        np.arange(0.5 * dxr, 0.5, dxr)])
    rho = np.where(x < 0, 1.0, 0.125)
    p = np.where(x < 0, 1.0, 0.1)
    m = np.where(x < 0, dxl, dxr * 0.125)
    h = 1.2 * 2 * np.where(x < 0, dxl, dxr)
    e = p / ((gamma - 1) * rho)
    return get_particle_array(name='fluid', x=x, rho=rho, p=p, m=m,
                              h=h, e=e, additional_props=['e'])


def _run(scheme, particles, dt, nsteps, kernel=None):
    solver = scheme.get_solver()
    solver.setup(particles, scheme.get_equations(),
                 kernel=kernel or solver.kernel)
    solver.set_disable_output(True)
    solver.set_max_steps(nsteps)
    solver.solve(show_progress=False)
    solver._sync_to_host()
    return solver


def _assert_finite(pa, props=('u', 'rho', 'p')):
    for prop in props:
        if prop in pa.properties:
            assert np.isfinite(np.asarray(pa.get(prop))).all(), prop


def test_gsph_scheme_sod():
    from pysph_tpu.sph.scheme import GSPHScheme
    pa = _sod()
    s = GSPHScheme(['fluid'], [], dim=1, gamma=1.4, kernel_factor=1.0,
                   g1=0.25, g2=0.5, rsolver=2, interpolation=1,
                   monotonicity=1)
    s.setup_properties([pa], clean=False)
    s.configure_solver(dt=1e-4, tf=1.0)
    _run(s, [pa], 1e-4, 5)
    _assert_finite(pa)


@pytest.mark.slow
def test_tsph_scheme_sod():
    from pysph_tpu.sph.gas_dynamics.tsph import TSPHScheme
    pa = _sod()
    s = TSPHScheme(['fluid'], [], dim=1, gamma=1.4, hfact=1.2)
    s.setup_properties([pa], clean=False)
    s.configure_solver(dt=1e-3, tf=1.0)
    _run(s, [pa], 1e-3, 3)
    _assert_finite(pa)


@pytest.mark.slow
def test_psph_scheme_sod():
    from pysph_tpu.sph.gas_dynamics.psph import PSPHScheme
    pa = _sod()
    s = PSPHScheme(['fluid'], [], dim=1, gamma=1.4, hfact=1.2)
    s.setup_properties([pa], clean=False)
    s.configure_solver(dt=1e-3, tf=1.0)
    _run(s, [pa], 1e-3, 3)
    _assert_finite(pa, ('u', 'rho', 'p', 'alpha'))


@pytest.mark.slow
def test_magma2_scheme_sod():
    from pysph_tpu.sph.gas_dynamics.magma2 import MAGMA2Scheme
    pa = _sod(nl=40)
    s = MAGMA2Scheme(['fluid'], [], dim=1, gamma=1.4, ndes=8,
                     formulation='mi1')
    s.setup_properties([pa], clean=False)
    s.configure_solver(dt=5e-4, tf=1.0)
    _run(s, [pa], 5e-4, 3)
    _assert_finite(pa)


def _taylor_green_pa(factory, extra=()):
    L, nx = 1.0, 12
    dx = L / nx
    x, y = np.mgrid[dx / 2:L:dx, dx / 2:L:dx]
    x, y = x.ravel(), y.ravel()
    u = -np.cos(2 * np.pi * x) * np.sin(2 * np.pi * y)
    v = np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y)
    return factory(name='fluid', x=x, y=y, u=u, v=v, m=dx * dx,
                   rho=1.0, h=1.2 * dx), dx


def _domain():
    from pysph_tpu.base.domain import DomainManager
    return DomainManager(xmin=0, xmax=1.0, ymin=0, ymax=1.0,
                         periodic_in_x=True, periodic_in_y=True)


@pytest.mark.slow
def test_pcisph_scheme_taylor_green():
    from pysph_tpu.sph.wc.pcisph import (PCISPHScheme,
                                         get_particle_array_pcisph)
    pa, dx = _taylor_green_pa(get_particle_array_pcisph)
    s = PCISPHScheme(fluids=['fluid'], dim=2, rho0=1.0, nu=0.001,
                     tolerance=0.1)
    s.setup_properties([pa], clean=False)
    s.configure_solver(dt=2e-4, tf=1.0)
    solver = s.get_solver()
    solver.set_domain(_domain())
    solver.setup([pa], s.get_equations(), kernel=solver.kernel)
    solver.set_disable_output(True)
    solver.set_max_steps(3)
    solver.solve(show_progress=False)
    solver._sync_to_host()
    _assert_finite(pa)
    # the prediction-correction loop must hold the density
    assert abs(np.asarray(pa.rho).mean() - 1.0) < 0.05


@pytest.mark.slow
def test_isph_scheme_taylor_green():
    from pysph_tpu.sph.isph.isph import (ISPHScheme,
                                         get_particle_array_isph)
    pa, dx = _taylor_green_pa(get_particle_array_isph)
    s = ISPHScheme(fluids=['fluid'], solids=[], dim=2, nu=0.01,
                   rho0=1.0, c0=10.0, alpha=0.0)
    s.setup_properties([pa], clean=False)
    s.configure_solver(dt=2e-4, tf=1.0)
    solver = s.get_solver()
    solver.set_domain(_domain())
    solver.setup([pa], s.get_equations(), kernel=solver.kernel)
    solver.set_disable_output(True)
    solver.set_max_steps(3)
    solver.solve(show_progress=False)
    solver._sync_to_host()
    _assert_finite(pa)
    # matrix-free CG must have reduced the residual
    assert float(pa.cg_scal[0]) <= 1e-5 * max(float(pa.cg_scal[1]),
                                              1e-30) * 1.01


@pytest.mark.slow
def test_sisph_scheme_taylor_green():
    from pysph_tpu.sph.isph.sisph import (SISPHScheme,
                                          get_particle_array_sisph)
    pa, dx = _taylor_green_pa(get_particle_array_sisph)
    s = SISPHScheme(fluids=['fluid'], solids=[], dim=2, nu=0.01,
                    rho0=1.0, c0=10.0, alpha=0.0, pref=1.0)
    s.setup_properties([pa], clean=False)
    s.configure_solver(dt=2e-4, tf=1.0)
    solver = s.get_solver()
    solver.set_domain(_domain())
    solver.setup([pa], s.get_equations(), kernel=solver.kernel)
    solver.set_disable_output(True)
    solver.set_max_steps(3)
    solver.solve(show_progress=False)
    solver._sync_to_host()
    _assert_finite(pa)


def test_swe_equations():
    from pysph_tpu.base.kernels import CubicSpline
    from pysph_tpu.base.utils import get_particle_array_swe
    from pysph_tpu.sph.equation import Group
    from pysph_tpu.sph.swe.basic import (
        CorrectionFactorVariableSmoothingLength, ParticleAcceleration,
        SWEOS)
    from pysph_tpu.tools.sph_evaluator import SPHEvaluator
    dx = 0.1
    x, y = np.mgrid[0:1 + 1e-9:dx, 0:1 + 1e-9:dx]
    x, y = x.ravel(), y.ravel()
    pa = get_particle_array_swe(
        name='fluid', x=x, y=y, m=1000.0 * dx * dx, rho=1000.0,
        h=1.2 * dx, h0=1.2 * dx)
    pa.rho0[:] = 1000.0
    ev = SPHEvaluator([pa], [
        Group(equations=[CorrectionFactorVariableSmoothingLength(
            'fluid', ['fluid'])]),
        Group(equations=[SWEOS('fluid')]),
        Group(equations=[ParticleAcceleration('fluid', ['fluid'],
                                              alpha=0.5)]),
    ], dim=2, kernel=CubicSpline(dim=2))
    ev.evaluate(t=0.0, dt=1e-4)
    # p = 0.5 (g / rho_w) rho^2
    assert np.allclose(np.asarray(pa.p), 4905.0, rtol=1e-4)
    _assert_finite(pa, ('au', 'av', 'cs'))


def test_swe_split_and_merge():
    from pysph_tpu.base.kernels import CubicSpline
    from pysph_tpu.base.utils import get_particle_array_swe
    from pysph_tpu.sph.equation import Group
    from pysph_tpu.sph.swe.basic import FindMergeable, ParticleSplit
    from pysph_tpu.tools.sph_evaluator import SPHEvaluator
    dx = 0.1
    x, y = np.mgrid[0:1 + 1e-9:dx, 0:1 + 1e-9:dx]
    x, y = x.ravel(), y.ravel()
    pa = get_particle_array_swe(
        name='fluid', x=x, y=y, m=1000.0 * dx * dx, rho=1000.0,
        h=1.2 * dx, h0=1.2 * dx)
    pa.rho0[:] = 1000.0
    n0 = pa.get_number_of_particles()
    ev = SPHEvaluator([pa], [Group(equations=[
        FindMergeable('fluid', ['fluid'], A_min=2 * dx * dx)])],
        dim=2, kernel=CubicSpline(dim=2))
    ev.evaluate()
    merged = int(np.asarray(pa.is_merged_pa).sum())
    flagged = int(np.asarray(pa.merge).sum())
    assert merged == flagged and merged > 0
    FindMergeable.remove(pa)
    assert pa.get_number_of_particles() == n0 - flagged

    pa.pa_to_split[:4] = 1
    n1 = pa.get_number_of_particles()
    ParticleSplit(pa).do_particle_split()
    assert pa.get_number_of_particles() == n1 + 4 * 6


def test_inlet_recycles_particles():
    from pysph_tpu.base.kernels import QuinticSpline
    from pysph_tpu.base.utils import get_particle_array
    from pysph_tpu.sph.bc.inlet_outlet_manager import (InletBase,
                                                       InletInfo)
    dx = 0.1
    xi = np.arange(-0.5 + dx / 2, 0, dx)
    inlet = get_particle_array(name='inlet', x=xi, m=1.0, h=0.15,
                               rho=1.0, u=1.0)
    fluid = get_particle_array(name='fluid', x=np.array([0.25]),
                               m=1.0, h=0.15, rho=1.0, u=1.0)
    for pa in (inlet, fluid):
        pa.add_property('ioid')
        pa.add_property('disp')
    info = InletInfo('inlet', normal=[-1.0, 0, 0],
                     refpoint=[0.0, 0, 0], has_ghost=False)
    info.length = 0.5
    info.dx = dx
    ib = InletBase(inlet, fluid, info, QuinticSpline(dim=1), 1,
                   active_stages=[1])
    inlet.x[:] = np.asarray(inlet.x) + 0.15
    n_in = inlet.get_number_of_particles()
    n_fl = fluid.get_number_of_particles()
    ib.update(0.0, 1e-2, 1)
    # crossers moved to the fluid, inlet count conserved (recycled)
    assert inlet.get_number_of_particles() == n_in
    assert fluid.get_number_of_particles() > n_fl
    assert np.asarray(inlet.x).max() < 0.0


@pytest.mark.slow
def test_particle_packing_relaxes():
    from pysph_tpu.tools.particle_packing import (
        ParticlePacking, create_free_particles_rect,
        create_frozen_container_rect)
    dx = 0.1
    frozen = create_frozen_container_rect(dx, 1.2, 1.0, (0, 1, 0, 1),
                                          dim=2)
    free = create_free_particles_rect(dx, 1.2, 1.0, (0, 1, 0, 1),
                                      dim=2, name='free')
    s = ParticlePacking(['free'], [], ['frozen'], dim=2, dx=dx)
    s.setup_properties([free, frozen])
    s.configure_solver(tf=1.0, dt=1e-3)
    solver = s.get_solver()
    solver.setup([free, frozen], s.get_equations(),
                 kernel=solver.kernel)
    solver.set_disable_output(True)
    solver.set_max_steps(5)
    solver.solve(show_progress=False)
    solver._sync_to_host()
    x = np.asarray(free.x)
    y = np.asarray(free.y)
    assert np.isfinite(x).all()
    assert x.min() > -dx and x.max() < 1 + dx
    assert y.min() > -dx and y.max() < 1 + dx


@pytest.mark.slow
def test_isph_pressure_gradient_symmetric_mirror():
    """Mirror variant (reference isph/isph.py:294): with every source
    particle away from the free surface (rho/rho0 >= 0.98) it must
    match the plain symmetric gradient; near-surface sources flip to
    the Shao & Lo mirrored branch and change the answer."""
    from pysph_tpu.base.kernels import CubicSpline
    from pysph_tpu.sph.equation import Group
    from pysph_tpu.sph.isph.isph import (
        MomentumEquationPressureGradientSymmetric,
        MomentumEquationPressureGradientSymmetricMirror,
        get_particle_array_isph)
    from pysph_tpu.tools.sph_evaluator import SPHEvaluator
    dx = 0.1
    x, y = np.mgrid[0:1 + 1e-9:dx, 0:1 + 1e-9:dx]
    x, y = x.ravel(), y.ravel()
    rng = np.random.RandomState(7)
    p = 100.0 * (1.0 + rng.rand(x.size))

    def build():
        pa = get_particle_array_isph(
            name='fluid', x=x, y=y, m=1.0, rho=1000.0, h=1.3 * dx,
            p=p.copy())
        pa.rho0[:] = 1000.0
        return pa

    def accel(eq_cls, rho_scale):
        pa = build()
        pa.rho[:] = 1000.0 * rho_scale
        ev = SPHEvaluator(
            [pa], [Group(equations=[eq_cls('fluid', ['fluid'])])],
            dim=2, kernel=CubicSpline(dim=2))
        ev.evaluate(t=0.0, dt=1e-4)
        return np.asarray(pa.au), np.asarray(pa.av)

    au_m, av_m = accel(MomentumEquationPressureGradientSymmetricMirror,
                       1.0)
    au_s, av_s = accel(MomentumEquationPressureGradientSymmetric, 1.0)
    assert np.allclose(au_m, au_s, rtol=1e-6, atol=1e-10)
    assert np.allclose(av_m, av_s, rtol=1e-6, atol=1e-10)
    # dilute the particles below the free-surface threshold: the
    # mirror branch must engage (answers diverge but stay finite)
    au_m2, av_m2 = accel(
        MomentumEquationPressureGradientSymmetricMirror, 0.9)
    au_s2, _ = accel(MomentumEquationPressureGradientSymmetric, 0.9)
    assert np.isfinite(au_m2).all() and np.isfinite(av_m2).all()
    assert not np.allclose(au_m2, au_s2, rtol=1e-3)


def test_exact_riemann_sample():
    """exact() + sample() reproduce Toro's Sod-tube solution
    (reference riemann_solver.py:176,289): star state and the
    sampled regions at t=0.25."""
    import jax.numpy as jnp

    from pysph_tpu.sph.gas_dynamics.riemann_solver import exact, sample
    pm, um = exact(1.0, 0.125, 1.0, 0.1, 0.0, 0.0, gamma=1.4)
    pm, um = float(pm), float(um)
    # Toro table 4.1
    assert abs(pm - 0.30313) < 1e-4
    assert abs(um - 0.92745) < 1e-4
    t = 0.25
    # regions at t=0.25: fan tail at s=-1.18..s=-0.07, star-left up
    # to the contact s=um=0.927, star-right to the shock s=1.752
    xs = jnp.asarray([-0.4, -0.1, 0.1, 0.3, 0.45])
    rho, u, pr = sample(pm, um, xs / t, 1.0, 0.125, 1.0, 0.1,
                        0.0, 0.0, gamma=1.4)
    rho, u, pr = map(np.asarray, (rho, u, pr))
    # left data state
    assert abs(rho[0] - 1.0) < 1e-6 and abs(u[0]) < 1e-6
    # inside the left fan: between left and star-left densities
    assert 0.42632 < rho[1] < 1.0
    # star-left plateau
    assert abs(rho[2] - 0.42632) < 1e-4 and abs(pr[2] - pm) < 1e-6
    # star-right plateau
    assert abs(rho[3] - 0.26557) < 1e-4 and abs(u[3] - um) < 1e-6
    # right data state (beyond the shock at s=1.7522)
    assert abs(rho[4] - 0.125) < 1e-6 and abs(pr[4] - 0.1) < 1e-6
