"""NNPS correctness via oracle equivalence.

Mirrors the reference strategy (base/tests/test_nnps.py:415-938): establish
expected neighbors with the brute-force O(N^2) oracle, then assert the
production index returns exactly the same sets, over random clouds in
1/2/3D, variable smoothing lengths, empty arrays, and periodic domains.
"""

import numpy as np
import pytest

from pysph_tpu.base.domain import DomainManager
from pysph_tpu.base.nnps import (
    NeighborFinder, brute_force_neighbors)
from pysph_tpu.base.utils import get_particle_array


def _make_state(n, dim, seed, h0=0.1, vary_h=False, lo=0.0, hi=1.0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(lo, hi, (n, 3))
    if dim < 3:
        pts[:, dim:] = 0.0
    h = np.full(n, h0)
    if vary_h:
        h *= rng.uniform(0.5, 2.0, n)
    pa = get_particle_array(name='f', x=pts[:, 0], y=pts[:, 1],
                            z=pts[:, 2], h=h)
    state, _ = pa.to_device()
    return state


def _check_pair(finder, dest, src, radius_scale, domain=None):
    lists, diag = finder.update({'d': dest, 's': src}, [('d', 's')])
    assert not bool(diag['neighbor_overflow']), int(diag['max_neighbors'])
    assert not bool(diag['cell_overflow']), int(diag['max_occupancy'])
    nl = lists[('d', 's')]
    idx = np.asarray(nl.idx)
    mask = np.asarray(nl.mask)
    expected = brute_force_neighbors(dest, src, radius_scale, domain)
    dn = int(dest['n_act'])
    for i in range(dn):
        got = np.sort(idx[i][mask[i]])
        np.testing.assert_array_equal(got, expected[i],
                                      err_msg='particle %d' % i)
    # padded rows have no neighbors
    for i in range(dn, idx.shape[0]):
        assert not mask[i].any()


@pytest.mark.parametrize('dim', [1, 2, 3])
def test_self_neighbors_random_cloud(dim):
    state = _make_state(120, dim, seed=dim, h0=0.12)
    finder = NeighborFinder(dim=dim, radius_scale=2.0)
    _check_pair(finder, state, state, 2.0)


@pytest.mark.parametrize('dim', [2, 3])
def test_variable_h(dim):
    state = _make_state(100, dim, seed=7 + dim, h0=0.08, vary_h=True)
    finder = NeighborFinder(dim=dim, radius_scale=2.0,
                            max_neighbors=256, cell_capacity=64)
    _check_pair(finder, state, state, 2.0)


def test_two_arrays():
    dest = _make_state(80, 2, seed=1, h0=0.1)
    src = _make_state(90, 2, seed=2, h0=0.15)
    finder = NeighborFinder(dim=2, radius_scale=2.0, max_neighbors=128)
    _check_pair(finder, dest, src, 2.0)


def test_radius_scale_3():
    state = _make_state(60, 2, seed=3, h0=0.1)
    finder = NeighborFinder(dim=2, radius_scale=3.0, max_neighbors=256,
                            cell_capacity=64)
    _check_pair(finder, state, state, 3.0)


def test_empty_source():
    dest = _make_state(10, 2, seed=4)
    pa = get_particle_array(name='s')
    src, _ = pa.to_device()
    finder = NeighborFinder(dim=2, radius_scale=2.0)
    lists, diag = finder.update({'d': dest, 's': src}, [('d', 's')])
    nl = lists[('d', 's')]
    assert not np.asarray(nl.mask).any()


@pytest.mark.parametrize('axes', ['x', 'y', 'xy'])
def test_periodic_2d(axes):
    domain = DomainManager(
        xmin=0.0, xmax=1.0, ymin=0.0, ymax=1.0,
        periodic_in_x='x' in axes, periodic_in_y='y' in axes)
    state = _make_state(100, 2, seed=11, h0=0.09)
    finder = NeighborFinder(dim=2, radius_scale=2.0, domain=domain,
                            max_neighbors=128)
    _check_pair(finder, state, state, 2.0, domain)


def test_periodic_3d_all_axes():
    domain = DomainManager(
        xmin=0.0, xmax=1.0, ymin=0.0, ymax=1.0, zmin=0.0, zmax=1.0,
        periodic_in_x=True, periodic_in_y=True, periodic_in_z=True)
    state = _make_state(120, 3, seed=13, h0=0.15)
    finder = NeighborFinder(dim=3, radius_scale=2.0, domain=domain,
                            max_neighbors=256, cell_capacity=64)
    _check_pair(finder, state, state, 2.0, domain)


def test_periodic_narrow_box_duplicate_cells():
    # Box narrower than 3 cells in y: stencil wraps onto the same cells;
    # dedup must prevent duplicated neighbor pairs.
    domain = DomainManager(
        xmin=0.0, xmax=1.0, ymin=0.0, ymax=0.3,
        periodic_in_x=True, periodic_in_y=True)
    state = _make_state(60, 2, seed=17, h0=0.1, lo=0.0, hi=0.3)
    # also spread x over full box
    import numpy as _np
    rng = _np.random.RandomState(23)
    x = rng.uniform(0, 1.0, 60)
    state['x'] = state['x'].at[:60].set(x)
    finder = NeighborFinder(dim=2, radius_scale=2.0, domain=domain,
                            max_neighbors=256, cell_capacity=128)
    _check_pair(finder, state, state, 2.0, domain)


def test_neighbor_overflow_detected():
    state = _make_state(64, 2, seed=5, h0=0.5)  # everyone sees everyone
    finder = NeighborFinder(dim=2, radius_scale=2.0, max_neighbors=8,
                            cell_capacity=128)
    lists, diag = finder.update({'d': state, 's': state}, [('d', 's')])
    assert bool(diag['neighbor_overflow'])
    assert int(diag['max_neighbors']) == 64


def test_clustered_distribution():
    # heavy clustering stresses cell capacity accounting
    rng = np.random.RandomState(42)
    pts = np.concatenate([
        rng.normal(0.25, 0.01, (80, 3)),
        rng.uniform(0, 1, (40, 3))])
    pts[:, 2] = 0.0
    pa = get_particle_array(name='f', x=pts[:, 0], y=pts[:, 1],
                            h=np.full(len(pts), 0.05))
    state, _ = pa.to_device()
    finder = NeighborFinder(dim=2, radius_scale=2.0, max_neighbors=256,
                            cell_capacity=128)
    _check_pair(finder, state, state, 2.0)


def test_chunked_query_matches_unchunked():
    state = _make_state(300, 2, seed=21, h0=0.07)
    f1 = NeighborFinder(dim=2, radius_scale=2.0, chunk=64)
    f2 = NeighborFinder(dim=2, radius_scale=2.0, chunk=100000)
    l1, _ = f1.update({'d': state, 's': state}, [('d', 's')])
    l2, _ = f2.update({'d': state, 's': state}, [('d', 's')])
    np.testing.assert_array_equal(np.asarray(l1[('d', 's')].idx),
                                  np.asarray(l2[('d', 's')].idx))
    np.testing.assert_array_equal(np.asarray(l1[('d', 's')].mask),
                                  np.asarray(l2[('d', 's')].mask))
