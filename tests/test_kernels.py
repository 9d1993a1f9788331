"""Kernel tests: normalization, gradient consistency, closed-form checks.

Mirrors the strategy of reference test_kernel.py: numerical normalization
(integral of W = 1), consistency of gradient with finite differences of
``kernel``, and consistency of ``gradient_h`` with dW/dh.
"""

import numpy as np
import pytest

from pysph_tpu.base import kernels


ALL_KERNELS = [
    (kernels.CubicSpline, (1, 2, 3)),
    (kernels.WendlandQuinticC2_1D, (1,)),
    (kernels.WendlandQuintic, (2, 3)),
    (kernels.WendlandQuinticC4_1D, (1,)),
    (kernels.WendlandQuinticC4, (2, 3)),
    (kernels.WendlandQuinticC6_1D, (1,)),
    (kernels.WendlandQuinticC6, (2, 3)),
    (kernels.Gaussian, (1, 2, 3)),
    (kernels.SuperGaussian, (1, 2, 3)),
    (kernels.QuinticSpline, (1, 2, 3)),
]

CASES = [(cls, dim) for cls, dims in ALL_KERNELS for dim in dims]


def _integrate_w(kern, dim, h=0.7):
    """Numerically integrate W over its support."""
    rs = kern.radius_scale
    n = 160
    if dim == 1:
        x = np.linspace(-rs * h, rs * h, 2 * n + 1)
        w = np.asarray(kern.kernel(rij=np.abs(x), h=h))
        return np.trapz(w, x)
    elif dim == 2:
        r = np.linspace(0, rs * h, n + 1)
        w = np.asarray(kern.kernel(rij=r, h=h))
        return np.trapz(2 * np.pi * r * w, r)
    else:
        r = np.linspace(0, rs * h, n + 1)
        w = np.asarray(kern.kernel(rij=r, h=h))
        return np.trapz(4 * np.pi * r * r * w, r)


@pytest.mark.parametrize('cls,dim', CASES)
def test_kernel_normalization(cls, dim):
    kern = cls(dim=dim)
    integral = _integrate_w(kern, dim)
    # Gaussians are truncated at q=3 and genuinely lose a little mass
    # (the reference kernels have the identical truncation).
    tol = 5e-3 if 'Gaussian' in cls.__name__ else 1e-4
    assert abs(integral - 1.0) < tol, integral


@pytest.mark.parametrize('cls,dim', CASES)
def test_dwdq_is_derivative_of_kernel(cls, dim):
    kern = cls(dim=dim)
    h = 0.9
    eps = 1e-6
    q = np.array([0.13, 0.49, 0.77, 1.11, 1.53, 1.87])
    if kern.radius_scale > 2.5:
        q = q * 1.5
    r = q * h
    num = (np.asarray(kern.kernel(rij=r + eps, h=h)) -
           np.asarray(kern.kernel(rij=r - eps, h=h))) / (2 * eps) * h
    ana = np.asarray(kern.dwdq(rij=r, h=h))
    np.testing.assert_allclose(num, ana, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize('cls,dim', CASES)
def test_gradient_h_matches_fd(cls, dim):
    kern = cls(dim=dim)
    h = 0.8
    eps = 1e-6
    r = np.array([0.11, 0.43, 0.76, 1.21]) * h * kern.radius_scale / 2.0
    num = (np.asarray(kern.kernel(rij=r, h=h + eps)) -
           np.asarray(kern.kernel(rij=r, h=h - eps))) / (2 * eps)
    ana = np.asarray(kern.gradient_h(rij=r, h=h))
    np.testing.assert_allclose(num, ana, rtol=1e-4, atol=1e-7)


@pytest.mark.parametrize('cls,dim', CASES)
def test_gradient_direction_and_zero_at_origin(cls, dim):
    kern = cls(dim=dim)
    h = 1.0
    xij = np.array([0.3, -0.2, 0.1])
    rij = np.linalg.norm(xij)
    grad = np.asarray(kern.gradient(xij, rij, h))
    assert grad.shape == (3,)
    # gradient points along -xij for decreasing kernels
    ratio = grad / xij
    np.testing.assert_allclose(ratio, ratio[0], rtol=1e-10)
    grad0 = np.asarray(kern.gradient(np.zeros(3), 0.0, h))
    np.testing.assert_allclose(grad0, 0.0)
    assert np.all(np.isfinite(grad0))


def test_kernel_batched_shapes():
    kern = kernels.CubicSpline(dim=2)
    r = np.random.rand(5, 7)
    h = 0.5 * np.ones((5, 7))
    w = np.asarray(kern.kernel(rij=r, h=h))
    assert w.shape == (5, 7)
    xij = np.random.rand(3, 5, 7)
    g = np.asarray(kern.gradient(xij, r, h))
    assert g.shape == (3, 5, 7)


def test_kernel_compact_support():
    for cls, dims in ALL_KERNELS:
        for dim in dims:
            kern = cls(dim=dim)
            rs = kern.radius_scale
            assert float(kern.kernel(rij=rs * 1.01, h=1.0)) == 0.0
            assert float(kern.dwdq(rij=rs * 1.01, h=1.0)) == 0.0


def test_get_correction():
    kern = kernels.CubicSpline(dim=2)
    c = float(kernels.get_correction(kern, h0=0.1))
    assert c > 0.0
