"""SPH smoothing kernels, vectorized for TPU.

Feature parity with the reference kernel library
(/root/reference/pysph/base/kernels.py): CubicSpline, WendlandQuinticC2_1D,
WendlandQuintic, WendlandQuinticC4_1D, WendlandQuinticC4,
WendlandQuinticC6_1D, WendlandQuinticC6, Gaussian, SuperGaussian,
QuinticSpline.  Each provides ``kernel``, ``dwdq``, ``gradient``,
``gradient_h`` and ``get_deltap`` and a ``radius_scale`` that sets the
neighbor-search cutoff.

Unlike the reference (scalar Python transpiled to Cython/OpenCL), every
kernel here is a single shape function ``_shape(q) -> (w, dw)`` evaluated
with ``jnp.where`` branches over whole ``(N, K)`` pair blocks, so the VPU
processes all pairs at once and XLA fuses the kernel into the surrounding
equation arithmetic.

All kernels share the identities (reference kernels.py:125-163):

    W(r, h)       = fac(h) * w(q),  q = r / h,  fac(h) = sigma / h^dim
    dW/dq         = fac(h) * dw(q)
    grad_a W      = (dW/dq) * (1/h) * x_ij / r
    dW/dh         = -fac(h)/h * (q * dw(q) + dim * w(q))

Note: the reference ``SuperGaussian.gradient_h`` returns the *negated*
analytic dW/dh (verified numerically against finite differences of its own
``kernel``); we implement the mathematically consistent form above for all
kernels.
"""

import math

import jax.numpy as jnp

M_1_PI = 1.0 / math.pi
M_2_SQRTPI = 2.0 / math.sqrt(math.pi)


class SmoothingKernel(object):
    """Base class: subclasses define ``fac`` (normalization sigma),
    ``radius_scale`` and ``_shape(q) -> (w, dw)``.
    """

    radius_scale = 2.0
    _deltap = 1.0

    def __init__(self, dim=1):
        if dim not in (1, 2, 3):
            raise ValueError('dim must be 1, 2 or 3, got %r' % dim)
        self.dim = dim
        self.fac = self._sigma(dim)

    def __repr__(self):
        return '%s(dim=%d)' % (self.__class__.__name__, self.dim)

    # -- subclass interface -------------------------------------------------
    def _sigma(self, dim):
        raise NotImplementedError()

    def _shape(self, q):
        """Return (w(q), dw(q)) without normalization."""
        raise NotImplementedError()

    # -- public API (matches reference kernel contract) ---------------------
    def get_deltap(self):
        return self._deltap

    @property
    def deltap(self):
        return self._deltap

    def _fac(self, h):
        h1 = 1.0 / h
        if self.dim == 1:
            return self.fac * h1
        elif self.dim == 2:
            return self.fac * h1 * h1
        return self.fac * h1 * h1 * h1

    def kernel(self, xij=None, rij=1.0, h=1.0):
        """W(rij, h).  ``xij`` is accepted for API parity and ignored."""
        q = rij / h
        w, _ = self._shape(q)
        return w * self._fac(h)

    def dwdq(self, rij=1.0, h=1.0):
        """sigma(h) * dw/dq at q = rij/h."""
        q = rij / h
        _, dw = self._shape(q)
        return dw * self._fac(h)

    def gradient(self, xij, rij, h):
        """grad_a W: returns a (3, ...) stacked array.

        Guards the r -> 0 singularity exactly like the reference
        (tmp = 0 when rij <= 1e-12, kernels.py:128-132).
        """
        wdash = self.dwdq(rij, h)
        tmp = jnp.where(rij > 1e-12, wdash / (h * jnp.where(rij > 1e-12, rij, 1.0)), 0.0)
        return jnp.stack([tmp * xij[0], tmp * xij[1], tmp * xij[2]])

    def gradient_h(self, xij=None, rij=1.0, h=1.0):
        """dW/dh = -fac/h * (q*dw + dim*w)."""
        q = rij / h
        w, dw = self._shape(q)
        return -self._fac(h) / h * (dw * q + w * self.dim)

    # convenience used by the equation engine (KERNEL macro)
    def __call__(self, xij, rij, h):
        return self.kernel(xij, rij, h)


class CubicSpline(SmoothingKernel):
    """Cubic spline kernel [Monaghan1992] (reference kernels.py:29-163)."""

    radius_scale = 2.0
    _deltap = 2.0 / 3.0

    def _sigma(self, dim):
        return (2.0 / 3.0, 10.0 * M_1_PI / 7.0, M_1_PI)[dim - 1]

    def _shape(self, q):
        q = jnp.asarray(q)
        tmp2 = 2.0 - q
        w_in = 1.0 - 1.5 * q * q * (1.0 - 0.5 * q)
        w_mid = 0.25 * tmp2 * tmp2 * tmp2
        w = jnp.where(q > 2.0, 0.0, jnp.where(q > 1.0, w_mid, w_in))
        dw_in = -3.0 * q * (1.0 - 0.75 * q)
        dw_mid = -0.75 * tmp2 * tmp2
        dw = jnp.where(q > 2.0, 0.0, jnp.where(q > 1.0, dw_mid, dw_in))
        return w, dw


class _Wendland(SmoothingKernel):
    """Common machinery for the Wendland family: support q in [0, 2)."""

    radius_scale = 2.0

    def _poly(self, q):
        raise NotImplementedError()

    def _shape(self, q):
        q = jnp.asarray(q)
        w, dw = self._poly(q)
        inside = q < 2.0
        return jnp.where(inside, w, 0.0), jnp.where(inside, dw, 0.0)


class WendlandQuinticC2_1D(_Wendland):
    """Wendland C2 kernel, 1D (reference kernels.py:166-271)."""

    _deltap = 2.0 / 3.0

    def __init__(self, dim=1):
        if dim != 1:
            raise ValueError('WendlandQuinticC2_1D is 1D only')
        super(WendlandQuinticC2_1D, self).__init__(dim)

    def _sigma(self, dim):
        return 5.0 / 8.0

    def _poly(self, q):
        tmp = 1.0 - 0.5 * q
        w = tmp ** 3 * (1.5 * q + 1.0)
        dw = -3.0 * q * tmp * tmp
        return w, dw


class WendlandQuintic(_Wendland):
    """Wendland C2 kernel for 2D/3D (reference kernels.py:274-380)."""

    _deltap = 0.5

    def __init__(self, dim=2):
        if dim == 1:
            raise ValueError('WendlandQuintic is 2D/3D; use '
                             'WendlandQuinticC2_1D in 1D')
        super(WendlandQuintic, self).__init__(dim)

    def _sigma(self, dim):
        return (None, 7.0 * M_1_PI / 4.0, M_1_PI * 21.0 / 16.0)[dim - 1]

    def _poly(self, q):
        tmp = 1.0 - 0.5 * q
        w = tmp ** 4 * (2.0 * q + 1.0)
        dw = -5.0 * q * tmp ** 3
        return w, dw


class WendlandQuinticC4_1D(_Wendland):
    """Wendland C4 kernel, 1D (reference kernels.py:383-490)."""

    _deltap = 0.55195628

    def __init__(self, dim=1):
        if dim != 1:
            raise ValueError('WendlandQuinticC4_1D is 1D only')
        super(WendlandQuinticC4_1D, self).__init__(dim)

    def _sigma(self, dim):
        return 0.75

    def _poly(self, q):
        tmp = 1.0 - 0.5 * q
        w = tmp ** 5 * (2.0 * q * q + 2.5 * q + 1.0)
        dw = -3.5 * q * (2.0 * q + 1.0) * tmp ** 4
        return w, dw


class WendlandQuinticC4(_Wendland):
    """Wendland C4 kernel for 2D/3D (reference kernels.py:493-603)."""

    _deltap = 0.47114274

    def __init__(self, dim=2):
        if dim == 1:
            raise ValueError('WendlandQuinticC4 is 2D/3D; use '
                             'WendlandQuinticC4_1D in 1D')
        super(WendlandQuinticC4, self).__init__(dim)

    def _sigma(self, dim):
        return (None, 9.0 * M_1_PI / 4.0, M_1_PI * 495.0 / 256.0)[dim - 1]

    def _poly(self, q):
        tmp = 1.0 - 0.5 * q
        w = tmp ** 6 * ((35.0 / 12.0) * q * q + 3.0 * q + 1.0)
        dw = (-14.0 / 3.0) * q * (1.0 + 2.5 * q) * tmp ** 5
        return w, dw


class WendlandQuinticC6_1D(_Wendland):
    """Wendland C6 kernel, 1D (reference kernels.py:606-716)."""

    _deltap = 0.47996698

    def __init__(self, dim=1):
        if dim != 1:
            raise ValueError('WendlandQuinticC6_1D is 1D only')
        super(WendlandQuinticC6_1D, self).__init__(dim)

    def _sigma(self, dim):
        return 55.0 / 64.0

    def _poly(self, q):
        tmp = 1.0 - 0.5 * q
        w = tmp ** 7 * (2.625 * q ** 3 + 4.75 * q * q + 3.5 * q + 1.0)
        dw = -0.5 * q * (26.25 * q * q + 27.0 * q + 9.0) * tmp ** 6
        return w, dw


class WendlandQuinticC6(_Wendland):
    """Wendland C6 kernel for 2D/3D (reference kernels.py:719-827)."""

    _deltap = 0.4305720757

    def __init__(self, dim=2):
        if dim == 1:
            raise ValueError('WendlandQuinticC6 is 2D/3D; use '
                             'WendlandQuinticC6_1D in 1D')
        super(WendlandQuinticC6, self).__init__(dim)

    def _sigma(self, dim):
        return (None, 78.0 * M_1_PI / 28.0, M_1_PI * 1365.0 / 512.0)[dim - 1]

    def _poly(self, q):
        tmp = 1.0 - 0.5 * q
        w = tmp ** 8 * (4.0 * q ** 3 + 6.25 * q * q + 4.0 * q + 1.0)
        dw = -5.5 * q * tmp ** 7 * (1.0 + 3.5 * q + 4.0 * q * q)
        return w, dw


class Gaussian(SmoothingKernel):
    """Gaussian kernel, truncated at q = 3 (reference kernels.py:830-941)."""

    radius_scale = 3.0
    # inflection point q = 1/sqrt(2)
    _deltap = 0.70710678118654746

    def _sigma(self, dim):
        return (0.5 * M_2_SQRTPI) ** dim

    def _shape(self, q):
        q = jnp.asarray(q)
        inside = q < 3.0
        e = jnp.exp(-jnp.where(inside, q * q, 0.0))
        w = jnp.where(inside, e, 0.0)
        dw = jnp.where(inside, -2.0 * q * e, 0.0)
        return w, dw


class SuperGaussian(SmoothingKernel):
    """Super-Gaussian kernel (reference kernels.py:944-1050).

    W(q) = sigma/h^d * exp(-q^2) * (d/2 + 1 - q^2) truncated at q = 3.
    """

    radius_scale = 3.0

    def _sigma(self, dim):
        return (0.5 * M_2_SQRTPI) ** dim

    def get_deltap(self):
        return (0.584540507426389, 0.6021141014644256,
                0.615369528365158)[self.dim - 1]

    @property
    def _deltap(self):
        return self.get_deltap()

    def _shape(self, q):
        q = jnp.asarray(q)
        d = self.dim
        inside = q < 3.0
        q2 = jnp.where(inside, q * q, 0.0)
        e = jnp.exp(-q2)
        w = jnp.where(inside, e * (1.0 + 0.5 * d - q2), 0.0)
        dw = jnp.where(inside, q * (2.0 * q2 - d - 4.0) * e, 0.0)
        return w, dw


class QuinticSpline(SmoothingKernel):
    """Quintic spline, support q in [0, 3] (reference kernels.py:1050-1210)."""

    radius_scale = 3.0
    _deltap = 0.759298480738450

    def _sigma(self, dim):
        return (1.0 / 120.0, M_1_PI * 7.0 / 478.0, M_1_PI / 120.0)[dim - 1]

    def _shape(self, q):
        q = jnp.asarray(q)
        t3 = 3.0 - q
        t2 = 2.0 - q
        t1 = 1.0 - q
        w3 = t3 ** 5
        w2 = 6.0 * t2 ** 5
        w1 = 15.0 * t1 ** 5
        w = jnp.where(
            q > 3.0, 0.0,
            jnp.where(q > 2.0, w3,
                      jnp.where(q > 1.0, w3 - w2, w3 - w2 + w1)))
        d3 = -5.0 * t3 ** 4
        d2 = 30.0 * t2 ** 4
        d1 = -75.0 * t1 ** 4
        dw = jnp.where(
            q > 3.0, 0.0,
            jnp.where(q > 2.0, d3,
                      jnp.where(q > 1.0, d3 + d2, d3 + d2 + d1)))
        return w, dw


KERNELS = {
    'CubicSpline': CubicSpline,
    'WendlandQuinticC2_1D': WendlandQuinticC2_1D,
    'WendlandQuintic': WendlandQuintic,
    'WendlandQuinticC4_1D': WendlandQuinticC4_1D,
    'WendlandQuinticC4': WendlandQuinticC4,
    'WendlandQuinticC6_1D': WendlandQuinticC6_1D,
    'WendlandQuinticC6': WendlandQuinticC6,
    'Gaussian': Gaussian,
    'SuperGaussian': SuperGaussian,
    'QuinticSpline': QuinticSpline,
}


def get_correction(kernel, h0):
    """Tensile-correction normalization (reference kernels.py:10-12)."""
    rij = kernel.get_deltap() * h0
    return kernel.kernel(rij=rij, h=h0)


def get_compiled_kernel(kernel):
    """API-parity shim: kernels are already vectorized+jittable."""
    return kernel
