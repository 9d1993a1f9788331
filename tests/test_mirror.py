"""Mirror (reflective) boundary support: ghost creation semantics and
end-to-end kernel-support completion (the analog of the reference's
mirror ghosts, nnps_base.pyx:505-660)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pysph_tpu.base.domain import DomainManager


def _state_1d(x, u, cap):
    n = len(x)
    pad = cap - n
    return {
        'x': jnp.asarray(np.pad(np.asarray(x, float), (0, pad))),
        'y': jnp.zeros(cap), 'z': jnp.zeros(cap),
        'u': jnp.asarray(np.pad(np.asarray(u, float), (0, pad))),
        'tag': jnp.zeros(cap, jnp.int32),
        'm': jnp.ones(cap),
        'n_act': jnp.asarray(n, jnp.int32),
    }


def test_mirror_ghosts_1d():
    dom = DomainManager(xmin=0.0, xmax=1.0, mirror_in_x=True)
    state = _state_1d([0.05, 0.2, 0.5, 0.8, 0.95],
                      [1.0, 2.0, 3.0, 4.0, 5.0], cap=16)
    props = ('x', 'y', 'z', 'u', 'tag', 'm')
    s2, ovf = dom.add_mirror_ghosts(state, 0.1, props)
    assert not bool(ovf)
    na = int(s2['n_act'])
    assert na == 7
    gx = np.sort(np.asarray(s2['x'][5:na]))
    np.testing.assert_allclose(gx, [-0.05, 1.05])
    # normal velocity negated, tag marks ghosts
    gu = np.asarray(s2['u'][5:na])
    assert set(np.round(gu, 6)) == {-1.0, -5.0}
    assert np.all(np.asarray(s2['tag'][5:na]) == 2)
    # strip restores the real count
    s3 = dom.strip_mirror_ghosts(s2)
    assert int(s3['n_act']) == 5


def test_mirror_ghosts_corner_2d():
    dom = DomainManager(xmin=0.0, xmax=1.0, ymin=0.0, ymax=1.0,
                        mirror_in_x=True, mirror_in_y=True)
    cap = 16
    st = {'x': jnp.asarray(np.pad([0.05], (0, cap - 1))),
          'y': jnp.asarray(np.pad([0.08], (0, cap - 1))),
          'z': jnp.zeros(cap),
          'u': jnp.ones(cap), 'v': jnp.full(cap, 2.0),
          'tag': jnp.zeros(cap, jnp.int32),
          'n_act': jnp.asarray(1, jnp.int32)}
    s2, ovf = dom.add_mirror_ghosts(
        st, 0.1, ('x', 'y', 'z', 'u', 'v', 'tag'))
    assert not bool(ovf)
    na = int(s2['n_act'])
    # original + x image + y image + corner image
    assert na == 4
    pts = {(round(float(a), 3), round(float(b), 3))
           for a, b in zip(np.asarray(s2['x'][:na]),
                           np.asarray(s2['y'][:na]))}
    assert pts == {(0.05, 0.08), (-0.05, 0.08), (0.05, -0.08),
                   (-0.05, -0.08)}


def test_mirror_ghost_overflow_flagged():
    dom = DomainManager(xmin=0.0, xmax=1.0, mirror_in_x=True)
    # every particle near a face, capacity too small for the images
    state = _state_1d([0.01, 0.02, 0.03, 0.97, 0.98, 0.99],
                      [0.0] * 6, cap=8)
    s2, ovf = dom.add_mirror_ghosts(
        state, 0.1, ('x', 'y', 'z', 'u', 'tag', 'm'))
    assert bool(ovf)
    assert int(s2['n_act']) <= 8


@pytest.mark.slow
def test_mirror_summation_density_complete_support():
    """A uniform 1D lattice next to mirror walls keeps full kernel
    support: summation density at the wall matches the interior."""
    from pysph_tpu.base.utils import get_particle_array
    from pysph_tpu.base.kernels import CubicSpline
    from pysph_tpu.sph.basic_equations import SummationDensity
    from pysph_tpu.sph.equation import Group
    from pysph_tpu.sph.integrator import EulerIntegrator
    from pysph_tpu.sph.integrator_step import EulerStep
    from pysph_tpu.solver.solver import Solver

    dx = 0.05
    x = np.arange(0.5 * dx, 1.0, dx)
    pa = get_particle_array(
        name='fluid', x=x, h=1.2 * dx, m=dx, rho=1.0,
        additional_props=['arho', 'au', 'av', 'aw', 'ax', 'ay', 'az'])
    dom = DomainManager(xmin=0.0, xmax=1.0, mirror_in_x=True)
    solver = Solver(dim=1, integrator=EulerIntegrator(fluid=EulerStep()),
                    kernel=CubicSpline(dim=1), dt=1e-5, tf=1e-5)
    solver.set_domain(dom)
    equations = [Group(equations=[
        SummationDensity(dest='fluid', sources=['fluid'])])]
    solver.setup([pa], equations)
    solver.set_disable_output(True)
    solver.solve(show_progress=False)
    solver._sync_to_host()
    rho = np.asarray(pa.rho)
    tag = np.asarray(pa.tag)
    real = tag == 0
    x = np.asarray(pa.x)[real]
    rho = rho[real]
    interior = rho[(x > 0.3) & (x < 0.7)].mean()
    wall = rho[x < 2 * dx]
    np.testing.assert_allclose(wall, interior, rtol=1e-5)
