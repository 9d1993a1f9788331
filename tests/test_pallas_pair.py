"""Numerical validation of the Pallas fused pair kernel against a
brute-force O(N^2) oracle (continuity + momentum w/ Monaghan
artificial viscosity, CubicSpline, unit mass).

Runs in pallas interpret mode on CPU; kept tiny so the 27-offset
unrolled kernel traces quickly.
"""

import numpy as np
import pytest


@pytest.mark.parametrize('seed', [0])
def test_fused_continuity_momentum_matches_oracle(seed):
    import jax  # noqa: F401  (platform set by conftest)

    from pysph_tpu.base.cell_grid import (GridSpec, build_layout,
                                          to_slots)
    from pysph_tpu.base.utils import get_particle_array
    from pysph_tpu.ops.pallas_pair import fused_continuity_momentum

    rng = np.random.RandomState(seed)
    n = 120
    dx = 0.2
    pts = rng.uniform(0, 1.0, (n, 3)).astype(np.float32)
    u = rng.randn(n, 3).astype(np.float32) * 0.1
    rho = (1 + 0.05 * rng.randn(n)).astype(np.float32)
    p = (10 + rng.randn(n)).astype(np.float32)
    h = np.full(n, 1.3 * dx, np.float32)
    c0, alpha, beta = 10.0, 0.1, 0.0

    # brute-force oracle
    arho_o = np.zeros(n)
    au_o = np.zeros((n, 3))
    for i in range(n):
        xij = pts[i] - pts
        r2 = (xij ** 2).sum(1)
        r = np.sqrt(r2)
        hij = 0.5 * (h[i] + h)
        sup = 2 * np.maximum(h[i], h)
        mask = r2 < sup * sup
        q = r / hij
        fac = 1 / (np.pi * hij ** 3)
        dwdq = np.where(q <= 1, -3 * q + 2.25 * q * q,
                        np.where(q <= 2, -0.75 * (2 - q) ** 2, 0.0))
        dwdr = fac * dwdq / hij
        with np.errstate(divide='ignore'):
            rinv = np.where(r > 1e-12, 1 / r, 0.0)
        dwvec = (dwdr * rinv)[:, None] * xij
        vij = u[i] - u
        vdotx = (vij * xij).sum(1)
        vdotdw = (vij * dwvec).sum(1)
        rhoij = 0.5 * (rho[i] + rho)
        eps = 0.01 * hij * hij
        muij = hij * vdotx / (r2 + eps)
        piij = np.where(
            vdotx < 0,
            (-alpha * c0 * muij + beta * muij ** 2) / rhoij, 0.0)
        pfac = p[i] / rho[i] ** 2 + p / rho ** 2 + piij
        m = np.where(mask, 1.0, 0.0)
        arho_o[i] = (m * vdotdw).sum()
        au_o[i] = -(m[:, None] * pfac[:, None] * dwvec).sum(0)

    pa = get_particle_array(
        name='f', x=pts[:, 0], y=pts[:, 1], z=pts[:, 2],
        u=u[:, 0], v=u[:, 1], w=u[:, 2], rho=rho, p=p, h=h)
    spec = GridSpec.from_particles([pa], dim=3, radius_scale=2.0)
    state, _ = pa.to_device()
    origin, widths, _ = spec.geometry({'f': state})
    lay = build_layout(spec, state, origin, widths,
                       capacity=spec.capacity_for('f'))
    M = lay.slot_to_particle.shape[0] // spec.n_cells
    slot = {k: to_slots(lay, state[k])
            for k in ('x', 'y', 'z', 'u', 'v', 'w', 'rho', 'p', 'h')}
    arho_s, au_s, av_s, aw_s = fused_continuity_momentum(
        slot, spec.dims, M, dim=3, c0=c0, alpha=alpha, beta=beta,
        interpret=True)

    s2p = np.asarray(lay.slot_to_particle)
    valid = s2p >= 0
    arho_k = np.zeros(n)
    au_k = np.zeros((n, 3))
    arho_k[s2p[valid]] = np.asarray(arho_s)[valid]
    au_k[s2p[valid], 0] = np.asarray(au_s)[valid]
    au_k[s2p[valid], 1] = np.asarray(av_s)[valid]
    au_k[s2p[valid], 2] = np.asarray(aw_s)[valid]

    assert np.isfinite(arho_k).all() and np.isfinite(au_k).all()
    scale_r = max(np.abs(arho_o).max(), 1e-9)
    scale_a = max(np.abs(au_o).max(), 1e-9)
    assert np.abs(arho_k - arho_o).max() / scale_r < 5e-6
    assert np.abs(au_k - au_o).max() / scale_a < 5e-6
