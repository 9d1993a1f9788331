"""Tests for SPHEvaluator and Interpolator (mirrors reference
tools/tests/test_interpolator.py strategy: interpolating known fields)."""

import numpy as np

from pysph_tpu.base.kernels import CubicSpline, Gaussian
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.sph.basic_equations import SummationDensity
from pysph_tpu.tools.interpolator import Interpolator
from pysph_tpu.tools.sph_evaluator import SPHEvaluator


def _fluid_block(n=20, dx=0.05):
    span = np.arange(0, n) * dx + dx / 2
    x, y = np.meshgrid(span, span)
    x, y = x.ravel(), y.ravel()
    pa = get_particle_array(
        name='fluid', x=x, y=y, h=np.full(x.size, 1.2 * dx),
        m=np.full(x.size, dx * dx), rho=np.ones(x.size),
        p=2.0 * x + 3.0 * y, u=np.sin(x))
    return pa


def test_sph_evaluator_summation_density():
    pa = _fluid_block()
    ev = SPHEvaluator([pa], [SummationDensity('fluid', ['fluid'])],
                      dim=2, kernel=CubicSpline(dim=2))
    ev.evaluate()
    rho = pa.rho
    # interior particles should be near 1.0
    interior = rho[(pa.x > 0.2) & (pa.x < 0.8) &
                   (pa.y > 0.2) & (pa.y < 0.8)]
    np.testing.assert_allclose(interior, 1.0, rtol=2e-2)


def test_interpolator_shepard_constant_field():
    pa = _fluid_block()
    pa.p = np.ones_like(pa.p)
    interp = Interpolator([pa], num_points=400,
                          kernel=Gaussian(dim=2))
    p = interp.interpolate('p')
    assert p.shape == tuple(np.asarray(interp.shape).squeeze()[
        np.asarray(interp.shape).squeeze() > 1])
    np.testing.assert_allclose(p, 1.0, rtol=1e-10)


def test_interpolator_given_points_linear_field():
    pa = _fluid_block()
    xs = np.array([0.3, 0.5, 0.7])
    ys = np.array([0.5, 0.5, 0.5])
    interp = Interpolator([pa], x=xs, y=ys, kernel=Gaussian(dim=2))
    p = interp.interpolate('p')
    expected = 2.0 * xs + 3.0 * ys
    np.testing.assert_allclose(p, expected, rtol=5e-2)


def test_interpolator_order1_linear_field_and_gradient():
    pa = _fluid_block()
    xs = np.linspace(0.3, 0.7, 5)
    ys = np.full(5, 0.5)
    interp = Interpolator([pa], x=xs, y=ys, kernel=Gaussian(dim=2),
                          method='order1')
    p = interp.interpolate('p')
    expected = 2.0 * xs + 3.0 * ys
    np.testing.assert_allclose(p, expected, rtol=1e-6)
    # gradient components
    dpdx = interp.interpolate('p', comp=1)
    dpdy = interp.interpolate('p', comp=2)
    np.testing.assert_allclose(dpdx, 2.0, rtol=1e-5)
    np.testing.assert_allclose(dpdy, 3.0, rtol=1e-5)


def test_interpolator_sph_method():
    pa = _fluid_block()
    # set rho to summation density for consistency
    ev = SPHEvaluator([pa], [SummationDensity('fluid', ['fluid'])],
                      dim=2, kernel=CubicSpline(dim=2))
    ev.evaluate()
    xs = np.array([0.5])
    ys = np.array([0.5])
    interp = Interpolator([pa], x=xs, y=ys, kernel=Gaussian(dim=2),
                          method='sph')
    pa.p = 2.0 * pa.x + 3.0 * pa.y
    p = interp.interpolate('p')
    np.testing.assert_allclose(p, [2.5], rtol=5e-2)


def test_density_correction_equations():
    from pysph_tpu.sph.equation import Group
    from pysph_tpu.sph.wc.density_correction import (
        MLSFirstOrder2D, ShepardFilter)
    pa = _fluid_block()
    pa.add_property('rhotmp')
    pa.rho = 1.0 + 0.01 * np.random.RandomState(3).randn(
        pa.get_number_of_particles())
    for cls in (ShepardFilter, MLSFirstOrder2D):
        ev = SPHEvaluator(
            [pa], [Group(equations=[cls('fluid', ['fluid'])],
                         real=False)],
            dim=2, kernel=CubicSpline(dim=2))
        ev.evaluate()
        interior = pa.rho[(pa.x > 0.2) & (pa.x < 0.8) &
                          (pa.y > 0.2) & (pa.y < 0.8)]
        np.testing.assert_allclose(interior, 1.0, rtol=3e-2)
        assert np.all(np.isfinite(pa.rho))


def test_shift_equations_run():
    from pysph_tpu.sph.equation import Group
    from pysph_tpu.sph.wc.shift import (CorrectVelocities, FickianShift,
                                        SimpleShift)
    pa = _fluid_block()
    pa.add_constant('vmax', [0.0])
    pa.add_property('dpos', stride=3)
    pa.add_property('gradv', stride=9)
    x0 = pa.x.copy()
    ev = SPHEvaluator(
        [pa], [Group(equations=[SimpleShift('fluid', ['fluid'])],
                     update_nnps=True),
               Group(equations=[CorrectVelocities('fluid', ['fluid'])])],
        dim=2, kernel=CubicSpline(dim=2))
    ev.evaluate(dt=1e-3)
    assert np.all(np.isfinite(pa.x))
    pa2 = _fluid_block()
    pa2.add_property('dpos', stride=3)
    ev2 = SPHEvaluator(
        [pa2], [Group(equations=[FickianShift('fluid', ['fluid'])])],
        dim=2, kernel=CubicSpline(dim=2))
    ev2.evaluate(dt=1e-3)
    assert np.all(np.isfinite(pa2.x))
