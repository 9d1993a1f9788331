"""Kernel/gradient correction exactness tests (behavioral parity with
reference sph/tests/test_kernel_corrections.py): on a tiny particle
set carrying the linear field u = x + y (+ z), the corrected SPH
gradient must be exact — (1, 1, 0) in 2D, (1, 1, 1) in 3D — on both
the regular and the perturbed configurations; CRKSPH additionally
reproduces a partition of unity (zeroth moment 1, first moment 0)."""

import numpy as np
import pytest

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.sph.basic_equations import SummationDensity
from pysph_tpu.sph.equation import Equation, Group
from pysph_tpu.sph.wc.crksph import (
    CRKSPH, CRKSPHPreStep, CRKSPHSymmetric, NumberDensity)
from pysph_tpu.sph.wc.kernel_correction import (
    GradientCorrection, GradientCorrectionPreStep,
    MixedGradientCorrection, MixedKernelCorrectionPreStep)
from pysph_tpu.tools.sph_evaluator import SPHEvaluator


class GradPhi(Equation):
    """Measure grad(u) with the (corrected) DWIJ."""

    def initialize(self, d_idx, d_gradu):
        d_gradu[3 * d_idx] = 0.0
        d_gradu[3 * d_idx + 1] = 0.0
        d_gradu[3 * d_idx + 2] = 0.0

    def loop(self, d_idx, d_gradu, d_u, s_idx, s_m, s_rho, s_u, DWIJ):
        fac = s_m[s_idx] / s_rho[s_idx] * (s_u[s_idx] - d_u[d_idx])
        d_gradu[3 * d_idx] += fac * DWIJ[0]
        d_gradu[3 * d_idx + 1] += fac * DWIJ[1]
        d_gradu[3 * d_idx + 2] += fac * DWIJ[2]


class GradPhiSymm(Equation):
    """Symmetric-form gradient (sums to zero over all particles)."""

    def initialize(self, d_idx, d_gradu):
        d_gradu[3 * d_idx] = 0.0
        d_gradu[3 * d_idx + 1] = 0.0
        d_gradu[3 * d_idx + 2] = 0.0

    def loop(self, d_idx, d_rho, d_m, d_gradu, d_u, s_idx, s_m, s_rho,
             s_u, DWIJ):
        fac = s_m[s_idx] / s_rho[s_idx] * \
            (s_u[s_idx] + d_u[d_idx]) / d_rho[d_idx]
        d_gradu[3 * d_idx] += fac * DWIJ[0]
        d_gradu[3 * d_idx + 1] += fac * DWIJ[1]
        d_gradu[3 * d_idx + 2] += fac * DWIJ[2]


class VerifyCRKSPH(Equation):
    """Accumulate the corrected kernel's zeroth/first moments.

    The corrected kernel is W^R_ij = A_i (1 + B_i . x_ij) W_ij.  The
    reference reads the pair factor from the per-pair ``cwij`` channel
    its CRKSPH.loop writes; this engine's convention is that consumers
    recompute the factor locally from ai/bi (see
    pysph_tpu/sph/wc/crksph.py CRKSPH.loop) — same property verified:
    partition of unity (zeroth moment 1, first moment 0)."""

    def initialize(self, d_idx, d_zero_mom, d_first_mom):
        d_zero_mom[d_idx] = 0.0
        d_first_mom[3 * d_idx] = 0.0
        d_first_mom[3 * d_idx + 1] = 0.0
        d_first_mom[3 * d_idx + 2] = 0.0

    def loop(self, d_idx, d_zero_mom, d_first_mom, d_ai, d_bi, s_idx,
             s_m, s_rho, WIJ, XIJ):
        cw = d_ai[d_idx] * (1.0 + d_bi[3 * d_idx] * XIJ[0] +
                            d_bi[3 * d_idx + 1] * XIJ[1] +
                            d_bi[3 * d_idx + 2] * XIJ[2])
        vjwijp = s_m[s_idx] / s_rho[s_idx] * WIJ * cw
        d_zero_mom[d_idx] += vjwijp
        d_first_mom[3 * d_idx] += vjwijp * XIJ[0]
        d_first_mom[3 * d_idx + 1] += vjwijp * XIJ[1]
        d_first_mom[3 * d_idx + 2] += vjwijp * XIJ[2]


def _make_pa(dim, perturbed=False):
    if dim == 2:
        x, y = np.mgrid[0.5:1:2j, 0.5:1:2j]
        x, y = x.ravel(), y.ravel()
        z = np.zeros_like(x)
    else:
        x, y, z = np.mgrid[0.5:1:2j, 0.5:1:2j, 0.5:1:2j]
        x, y, z = x.ravel(), y.ravel(), z.ravel()
    if perturbed:
        d = np.resize([0.1, 0.05, -0.1, -0.05], x.size)
        x = x + d
        y = y + d
        if dim == 3:
            z = z + d
    u = x + y + (z if dim == 3 else 0.0)
    pa = get_particle_array(name='fluid', x=x, y=y, z=z, h=0.5,
                            m=1.0, u=u, V=1.0)
    pa.add_property('gradu', stride=3)
    pa.add_property('cwij')
    pa.add_property('dw_gamma', stride=3)
    pa.add_property('m_mat', stride=9)
    pa.add_property('ai')
    pa.add_property('gradai', stride=3)
    pa.add_property('bi', stride=3)
    pa.add_property('gradbi', stride=9)
    pa.add_property('zero_mom')
    pa.add_property('first_mom', stride=3)
    # CRKSPHPreStep scratch moments (added by the scheme's
    # get_particle_array_crksph in production runs)
    from pysph_tpu.sph.wc.crksph import _CRK_TEMPS
    for name, stride in _CRK_TEMPS:
        pa.add_property(name, stride=stride)
    pa.cwij[:] = 1.0
    expect = np.ones((x.size, 3))
    if dim == 2:
        expect[:, 2] = 0.0
    return pa, expect.ravel()


def _evaluate(pa, eqs, dim):
    seval = SPHEvaluator(arrays=[pa], equations=eqs, dim=dim,
                         kernel=CubicSpline(dim=dim))
    seval.evaluate(0.0, 0.1)


@pytest.mark.parametrize('dim', [2, pytest.param(3, marks=pytest.mark.slow)])
@pytest.mark.parametrize('perturbed', [False, True],
                         ids=['regular', 'perturbed'])
def test_gradient_correction_exact_linear(dim, perturbed):
    pa, expect = _make_pa(dim, perturbed)
    d, s = 'fluid', ['fluid']
    eqs = [
        Group(equations=[SummationDensity(dest=d, sources=s)]),
        Group(equations=[
            GradientCorrectionPreStep(dest=d, sources=s, dim=dim)]),
        Group(equations=[
            GradientCorrection(dest=d, sources=s, dim=dim, tol=100.0),
            GradPhi(dest=d, sources=s)]),
    ]
    _evaluate(pa, eqs, dim)
    np.testing.assert_array_almost_equal(pa.gradu, expect, decimal=5)


@pytest.mark.parametrize('dim', [2, pytest.param(3, marks=pytest.mark.slow)])
@pytest.mark.parametrize('perturbed', [False, True],
                         ids=['regular', 'perturbed'])
def test_mixed_gradient_correction_exact_linear(dim, perturbed):
    pa, expect = _make_pa(dim, perturbed)
    d, s = 'fluid', ['fluid']
    eqs = [
        Group(equations=[SummationDensity(dest=d, sources=s)]),
        Group(equations=[
            MixedKernelCorrectionPreStep(dest=d, sources=s, dim=dim)]),
        Group(equations=[
            MixedGradientCorrection(dest=d, sources=s, dim=dim,
                                    tol=100.0),
            GradPhi(dest=d, sources=s)]),
    ]
    _evaluate(pa, eqs, dim)
    np.testing.assert_array_almost_equal(pa.gradu, expect, decimal=5)


@pytest.mark.parametrize('dim', [2, pytest.param(3, marks=pytest.mark.slow)])
@pytest.mark.parametrize('perturbed', [False, True],
                         ids=['regular', 'perturbed'])
def test_crksph_moments_and_gradient(dim, perturbed):
    pa, expect = _make_pa(dim, perturbed)
    pa.rho[:] = 1.0
    d, s = 'fluid', ['fluid']
    eqs = [
        Group(equations=[NumberDensity(dest=d, sources=s)]),
        Group(equations=[SummationDensity(dest=d, sources=s)]),
        Group(equations=[
            CRKSPHPreStep(dest=d, sources=s, dim=dim)]),
        Group(equations=[
            CRKSPH(dest=d, sources=s, dim=dim, tol=1000.0),
            GradPhi(dest=d, sources=s),
            VerifyCRKSPH(dest=d, sources=s)]),
    ]
    _evaluate(pa, eqs, dim)
    np.testing.assert_array_almost_equal(pa.zero_mom, 1.0, decimal=5)
    np.testing.assert_array_almost_equal(pa.first_mom, 0.0, decimal=5)
    np.testing.assert_array_almost_equal(pa.gradu, expect, decimal=5)


@pytest.mark.parametrize('perturbed', [False, True],
                         ids=['regular', 'perturbed'])
def test_crksph_symmetric_conserves(perturbed):
    dim = 2
    pa, _ = _make_pa(dim, perturbed)
    pa.rho[:] = 1.0
    d, s = 'fluid', ['fluid']
    eqs = [
        Group(equations=[NumberDensity(dest=d, sources=s)]),
        Group(equations=[SummationDensity(dest=d, sources=s)]),
        Group(equations=[
            CRKSPHPreStep(dest=d, sources=s, dim=dim)]),
        Group(equations=[
            CRKSPHSymmetric(dest=d, sources=s, dim=dim, tol=1000.0),
            GradPhiSymm(dest=d, sources=s),
            VerifyCRKSPH(dest=d, sources=s)]),
    ]
    _evaluate(pa, eqs, dim)
    np.testing.assert_array_almost_equal(pa.zero_mom, 1.0, decimal=5)
    np.testing.assert_array_almost_equal(pa.first_mom, 0.0, decimal=5)
    # symmetric form: momentum conservation — accelerations sum to 0
    assert abs(np.sum(pa.gradu[::3])) < 1e-6
    assert abs(np.sum(pa.gradu[1::3])) < 1e-6
