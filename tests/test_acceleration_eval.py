"""DSL/engine semantics micro-tests on small 1D arrays.

Mirrors the strategy of reference sph/tests/test_acceleration_eval.py:
hand-checkable results on tiny arrays: group ordering, precomputed symbols,
reduce, iterated groups, conditions, start/stop_idx, real flag, loop_all.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pysph_tpu.base.cell_grid import GridSpec
from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.sph.acceleration_eval import AccelerationEval
from pysph_tpu.sph.equation import MAX, Equation, Group
from pysph_tpu.sph.basic_equations import SummationDensity


def _setup(pa_list, equations, dim=1, kernel=None):
    kernel = kernel or CubicSpline(dim=dim)
    a_eval = AccelerationEval(pa_list, equations, kernel)
    spec = GridSpec.from_particles(pa_list, dim=dim,
                                   radius_scale=kernel.radius_scale)
    a_eval.set_nnps(spec)
    states = {}
    for pa in pa_list:
        states[pa.name], _ = pa.to_device()
    return a_eval, states


def _compute(a_eval, states, t=0.0, dt=0.1):
    new_states, diag = a_eval.update_and_compute(t, dt, states)
    assert not bool(diag['cell_overflow'])
    assert not bool(diag['extent_overflow'])
    return new_states


def _line_array(n=10, dx=1.0, name='fluid', **extra):
    x = np.arange(n) * dx
    pa = get_particle_array(name=name, x=x, h=np.full(n, 1.2 * dx),
                            m=np.ones(n), rho=np.ones(n), **extra)
    return pa


def test_summation_density_matches_hand_computed():
    pa = _line_array(5)
    kernel = CubicSpline(dim=1)
    a_eval, states = _setup([pa], [SummationDensity('fluid', ['fluid'])],
                            kernel=kernel)
    states = _compute(a_eval, states)
    rho = np.asarray(states['fluid']['rho'])[:5]
    x = np.arange(5.0)
    expected = np.zeros(5)
    for i in range(5):
        for j in range(5):
            r = abs(x[i] - x[j])
            if r < 2.0 * 1.2:
                expected[i] += float(kernel.kernel(rij=r, h=1.2))
    np.testing.assert_allclose(rho, expected, rtol=1e-12)


class SimpleEquation(Equation):
    def __init__(self, dest, sources):
        super(SimpleEquation, self).__init__(dest, sources)

    def initialize(self, d_idx, d_u, d_au):
        d_u[d_idx] = 0.0
        d_au[d_idx] = 0.0

    def loop(self, d_idx, d_au, s_idx, s_m):
        d_au[d_idx] += s_m[s_idx]

    def post_loop(self, d_idx, d_u, d_au):
        d_u[d_idx] = d_au[d_idx]


def test_simple_loop_counts_neighbors():
    # With unit masses, d_au accumulates the number of neighbors.
    pa = _line_array(10)
    a_eval, states = _setup([pa], [SimpleEquation('fluid', ['fluid'])])
    states = _compute(a_eval, states)
    u = np.asarray(states['fluid']['u'])[:10]
    # cutoff = 2*h = 2.4 -> neighbors are j-2..j+2
    expected = np.array([3., 4., 5., 5., 5., 5., 5., 5., 4., 3.])
    np.testing.assert_allclose(u, expected)


class MixedOrderEquation(Equation):
    """Second group must see results written by first group."""
    def initialize(self, d_idx, d_v, d_u):
        d_v[d_idx] = 2.0 * d_u[d_idx]


def test_group_ordering_preserved():
    pa = _line_array(10)
    eqs = [Group(equations=[SimpleEquation('fluid', ['fluid'])]),
           Group(equations=[MixedOrderEquation('fluid', None)])]
    a_eval, states = _setup([pa], eqs)
    states = _compute(a_eval, states)
    u = np.asarray(states['fluid']['u'])[:10]
    v = np.asarray(states['fluid']['v'])[:10]
    np.testing.assert_allclose(v, 2 * u)


class MaxEquation(Equation):
    def initialize(self, d_idx, d_p):
        d_p[d_idx] = -1e20

    def loop(self, d_idx, d_p, s_idx, s_x):
        d_p[d_idx] = MAX(s_x[s_idx], d_p[d_idx])


def test_max_accumulation():
    pa = _line_array(10)
    a_eval, states = _setup([pa], [MaxEquation('fluid', ['fluid'])])
    states = _compute(a_eval, states)
    p = np.asarray(states['fluid']['p'])[:10]
    expected = np.minimum(np.arange(10) + 2.0, 9.0)
    np.testing.assert_allclose(p, expected)


class ReduceEquation(Equation):
    def reduce(self, dst, t, dt):
        total = jnp.sum(jnp.where(dst.active, dst.m[:], 0.0))
        dst.total_mass[0] = total


def test_reduce_writes_constant():
    pa = _line_array(10)
    pa.add_constant('total_mass', 0.0)
    a_eval, states = _setup([pa], [ReduceEquation('fluid', None)])
    states = _compute(a_eval, states)
    assert float(states['fluid']['total_mass'][0]) == 10.0


class IterateEquation(Equation):
    """Doubles p each sweep; convergence flag stored in a constant."""
    def initialize(self, d_idx, d_p):
        d_p[d_idx] = d_p[d_idx] + 1.0

    def reduce(self, dst, t, dt):
        dst.conv_flag[0] = jnp.where(jnp.max(dst.p[:]) >= 4.0, 1.0, -1.0)

    def converged(self, dst):
        return dst.conv_flag[0]


def test_iterated_group_runs_until_converged():
    pa = _line_array(4)
    pa.add_constant('conv_flag', -1.0)
    group = Group(equations=[IterateEquation('fluid', None)],
                  iterate=True, max_iterations=10, min_iterations=2)
    a_eval, states = _setup([pa], [group])
    states = _compute(a_eval, states)
    # p starts at 0; after 4 sweeps p = 4 -> converged
    np.testing.assert_allclose(np.asarray(states['fluid']['p'])[:4], 4.0)


def test_iterated_group_respects_max_iterations():
    pa = _line_array(4)
    pa.add_constant('conv_flag', -1.0)

    class NeverConverge(IterateEquation):
        def reduce(self, dst, t, dt):
            dst.conv_flag[0] = -1.0

    group = Group(equations=[NeverConverge('fluid', None)],
                  iterate=True, max_iterations=3)
    a_eval, states = _setup([pa], [group])
    states = _compute(a_eval, states)
    np.testing.assert_allclose(np.asarray(states['fluid']['p'])[:4], 3.0)


class SetOne(Equation):
    def initialize(self, d_idx, d_u):
        d_u[d_idx] = 1.0


def test_condition_group():
    pa = _line_array(4)
    g = Group(equations=[SetOne('fluid', None)],
              condition=lambda t, dt: t > 0.5)
    a_eval, states = _setup([pa], [g])
    s1 = _compute(a_eval, states, t=0.0)
    np.testing.assert_allclose(np.asarray(s1['fluid']['u'])[:4], 0.0)
    s2 = _compute(a_eval, states, t=1.0)
    np.testing.assert_allclose(np.asarray(s2['fluid']['u'])[:4], 1.0)


def test_start_stop_idx():
    pa = _line_array(10)
    g = Group(equations=[SetOne('fluid', None)], start_idx=2, stop_idx=5)
    a_eval, states = _setup([pa], [g])
    states = _compute(a_eval, states)
    u = np.asarray(states['fluid']['u'])[:10]
    np.testing.assert_allclose(u, [0, 0, 1, 1, 1, 0, 0, 0, 0, 0])


def test_stop_idx_from_constant():
    pa = _line_array(10)
    pa.add_constant('n_body', [3.0])
    g = Group(equations=[SetOne('fluid', None)], stop_idx='n_body')
    a_eval, states = _setup([pa], [g])
    states = _compute(a_eval, states)
    u = np.asarray(states['fluid']['u'])[:10]
    np.testing.assert_allclose(u, [1, 1, 1, 0, 0, 0, 0, 0, 0, 0])


def test_real_flag_skips_remote():
    pa = _line_array(6)
    pa.properties['tag'][:] = [0, 0, 0, 1, 1, 2]
    g_real = Group(equations=[SetOne('fluid', None)], real=True)
    a_eval, states = _setup([pa], [g_real])
    states = _compute(a_eval, states)
    np.testing.assert_allclose(np.asarray(states['fluid']['u'])[:6],
                               [1, 1, 1, 0, 0, 0])
    g_all = Group(equations=[SetOne('fluid', None)], real=False)
    a_eval2, states2 = _setup([pa], [g_all])
    states2 = _compute(a_eval2, states2)
    np.testing.assert_allclose(np.asarray(states2['fluid']['u'])[:6], 1.0)


class LoopAllEquation(Equation):
    """Counts neighbors via the explicit NBRS/N_NBRS interface."""
    def initialize(self, d_idx, d_u):
        d_u[d_idx] = 0.0

    def loop_all(self, d_idx, d_u, N_NBRS):
        d_u[d_idx] = N_NBRS * 1.0


def test_loop_all():
    pa = _line_array(10)
    a_eval, states = _setup([pa], [LoopAllEquation('fluid', ['fluid'])])
    states = _compute(a_eval, states)
    u = np.asarray(states['fluid']['u'])[:10]
    np.testing.assert_allclose(u, [3, 4, 5, 5, 5, 5, 5, 5, 4, 3])


def test_two_arrays_cross_density():
    pa1 = _line_array(5, name='fluid')
    pa2 = _line_array(5, name='solid')
    pa2.x = pa2.x + 0.5
    eq = SummationDensity('fluid', ['fluid', 'solid'])
    a_eval, states = _setup([pa1, pa2], [eq])
    states = _compute(a_eval, states)
    kernel = CubicSpline(dim=1)
    xf = np.arange(5.0)
    xs = xf + 0.5
    expected = np.zeros(5)
    for i in range(5):
        for xarr in (xf, xs):
            for j in range(5):
                r = abs(xf[i] - xarr[j])
                if r < 2.4:
                    expected[i] += float(kernel.kernel(rij=r, h=1.2))
    np.testing.assert_allclose(np.asarray(states['fluid']['rho'])[:5],
                               expected, rtol=1e-12)


def test_missing_property_raises():
    pa = _line_array(4)

    class NeedsFoo(Equation):
        def initialize(self, d_idx, d_foo):
            d_foo[d_idx] = 0.0

    try:
        _setup([pa], [NeedsFoo('fluid', None)])
    except RuntimeError as e:
        assert 'foo' in str(e)
    else:
        raise AssertionError('expected RuntimeError')


def test_compute_is_jittable():
    pa = _line_array(10)
    a_eval, states = _setup([pa], [SummationDensity('fluid', ['fluid'])])

    @jax.jit
    def step(states, t, dt):
        s, diag = a_eval.update_and_compute(t, dt, states)
        return s

    out = step(states, 0.0, 0.1)
    out2 = step(out, 0.0, 0.1)
    assert np.asarray(out2['fluid']['rho'])[:10].all()


def test_strided_property_pair_access():
    pa = _line_array(5)
    pa.add_property('grad', stride=3)

    class Grad(Equation):
        def initialize(self, d_idx, d_grad):
            d_grad[d_idx * 3 + 0] = 0.0
            d_grad[d_idx * 3 + 1] = 0.0
            d_grad[d_idx * 3 + 2] = 0.0

        def loop(self, d_idx, s_idx, d_grad, s_m, DWIJ):
            d_grad[d_idx * 3 + 0] += s_m[s_idx] * DWIJ[0]
            d_grad[d_idx * 3 + 1] += s_m[s_idx] * DWIJ[1]
            d_grad[d_idx * 3 + 2] += s_m[s_idx] * DWIJ[2]

    a_eval, states = _setup([pa], [Grad('fluid', ['fluid'])])
    states = _compute(a_eval, states)
    grad = np.asarray(states['fluid']['grad'])[:5]
    # interior particle: symmetric neighborhood -> zero gradient sum
    np.testing.assert_allclose(grad[2], 0.0, atol=1e-12)
    # leftmost particle sees only right neighbors: xij < 0 and dwdq < 0
    # give a positive x-component.
    assert grad[0, 0] > 0


class SourceAccumEquation(Equation):
    """Writes into the source (reverse-stencil accumulation path)."""
    def initialize(self, d_idx, d_u):
        d_u[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_u, s_p, s_m):
        d_u[d_idx] += s_m[s_idx]
        s_p[s_idx] += 1.0


def test_source_accumulation_counts_pairs():
    pa = _line_array(10)
    pa.p = np.zeros(10)
    a_eval, states = _setup([pa], [SourceAccumEquation('fluid',
                                                       ['fluid'])])
    states = _compute(a_eval, states)
    # each pair increments the source once: source counts == dest counts
    p = np.asarray(states['fluid']['p'])[:10]
    u = np.asarray(states['fluid']['u'])[:10]
    np.testing.assert_allclose(p, [3, 4, 5, 5, 5, 5, 5, 5, 4, 3])
    np.testing.assert_allclose(u, p)


def test_source_accumulation_two_arrays():
    d = _line_array(6, name='fluid')
    s = _line_array(6, name='wall')
    s.x = s.x + 0.5
    a_eval, states = _setup([d, s], [SourceAccumEquation('fluid',
                                                         ['wall'])])
    states = _compute(a_eval, states)
    p = np.asarray(states['wall']['p'])[:6]
    # wall j at x=j+0.5 is neighbor of fluid i iff |i - j - 0.5| < 2.4
    expected = np.zeros(6)
    for j in range(6):
        for i in range(6):
            if abs(i - j - 0.5) < 2.4:
                expected[j] += 1
    np.testing.assert_allclose(p, expected)


def test_pair_shaped_constant_accumulation_counts_neighbors():
    """A constant accumulated per neighbor must be written
    pair-shaped (`1.0 + 0.0 * WIJ`); this guards the EDAC/CRKSPH
    neighbor-count regression (ComputeAveragePressure)."""
    class CountNeighbors(Equation):
        def initialize(self, d_idx, d_nnbr):
            d_nnbr[d_idx] = 0.0

        def loop(self, d_idx, d_nnbr, WIJ):
            d_nnbr[d_idx] += 1.0 + 0.0 * WIJ

    pa = _line_array(6, additional_props=['nnbr'])
    a_eval, states = _setup(
        [pa], [Group(equations=[CountNeighbors('fluid', ['fluid'])])])
    states = _compute(a_eval, states)
    nnbr = np.asarray(states['fluid']['nnbr'])[:6]
    # support radius 2h = 2.4: neighbors at distance 0, 1, 2
    expected = np.array([3., 4., 5., 5., 4., 3.])
    np.testing.assert_allclose(nnbr, expected)


def test_average_pressure_neighbor_count():
    """ComputeAveragePressure must produce the mean (not the sum) of
    neighbor pressures."""
    from pysph_tpu.sph.wc.edac import ComputeAveragePressure
    pa = _line_array(6, additional_props=['pavg', 'nnbr'])
    pa.p[:] = 2.0
    a_eval, states = _setup(
        [pa],
        [Group(equations=[ComputeAveragePressure('fluid',
                                                 ['fluid'])])])
    states = _compute(a_eval, states)
    pavg = np.asarray(states['fluid']['pavg'])[:6]
    np.testing.assert_allclose(pavg, 2.0, rtol=1e-12)
