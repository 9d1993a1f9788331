"""Pallas fused pair kernel — prototype of the round-2 compute path.

The XLA roll engine evaluates dense (C, M, 27M) pair blocks whose
temporaries stream through HBM (~10% VPU efficiency measured on
dam_break_3d).  This kernel instead walks cell rows: the grid is
(nx, ny, 9) where the last axis enumerates the 9 (ox, oy) neighbor
offsets; each program loads the dest row block (1, 1, nz, M) and the
(ox, oy) neighbor row block via the index map, unrolls the 3 z-offsets
in-register, and accumulates into the output row block across the 9
grid revisits — so pair temporaries are (nz, M, M) in VMEM and never
touch HBM.

The prototype hand-fuses the WCSPH continuity + momentum (Monaghan
artificial viscosity) pair math for one (dest=src) fluid array with a
CubicSpline kernel — enough to validate numerics against the XLA
engine and measure the speed of light for the round-2 generalization
(binding arbitrary equation groups the same way the XLA path does).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _cubic_w_dwdr(rij, h, dim):
    """CubicSpline W and dW/dr (vectorized, matches
    base/kernels.py)."""
    q = rij / h
    if dim == 3:
        fac = 1.0 / (np.pi * h ** 3)
    elif dim == 2:
        fac = 10.0 / (7.0 * np.pi * h ** 2)
    else:
        fac = 2.0 / (3.0 * h)
    w = jnp.where(
        q <= 1.0, 1.0 - 1.5 * q * q * (1.0 - 0.5 * q),
        jnp.where(q <= 2.0, 0.25 * (2.0 - q) ** 3, 0.0))
    dwdq = jnp.where(
        q <= 1.0, -3.0 * q + 2.25 * q * q,
        jnp.where(q <= 2.0, -0.75 * (2.0 - q) ** 2, 0.0))
    return fac * w, fac * dwdq / h


def _row_kernel(nx, ny, nz, M, dim, c0, alpha, beta, eps_fac, *refs):
    """One (cell row, x-offset): accumulate continuity + momentum for
    the 9 (oy, oz) offsets of one neighbor x-plane row group.

    refs: 9 dest props (1, 1, nz, M); then per prop the 3 y-shifted
    src blocks (oy = -1, 0, +1) at the k-th x-offset; then 4 outs."""
    n_props = 9  # x, y, z, u, v, w, h, rho, p  (+mask via h>0)
    dvals = [refs[p][0, 0] for p in range(n_props)]       # (nz, M)
    src = refs[n_props:4 * n_props]
    out_refs = refs[4 * n_props:4 * n_props + 4]
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    ox = k - 1

    (dx_, dy_, dz_, du_, dv_, dw_, dh_, drho_, dp_) = dvals
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    # Mosaic can't broadcast i1 vectors along a new minor dim, so the
    # mask is carried as a float indicator and only compared to zero
    # once it has the full (nz, M, 3M) pair-block shape.
    x_okf = jnp.where((i + ox >= 0) & (i + ox <= nx - 1), one, zero)
    dmaskf = jnp.where(dh_ > 0.0, one, zero)

    zi = jax.lax.broadcasted_iota(jnp.int32, (nz, 1, 1), 0)
    hi = dh_[:, :, None]

    # Concatenate the 3 z-offset source blocks along lanes so the pair
    # block's minor dim is 3M (pads to one 128-lane tile for M <= 42
    # instead of 3 tiles at 3.5x waste) and the pair math runs once
    # per y-offset.
    def cat3(s):
        return jnp.concatenate(
            [jnp.roll(s, 1, axis=0), s, jnp.roll(s, -1, axis=0)],
            axis=-1)[:, None, :]  # (nz, 1, 3M)

    z_edgef = jnp.concatenate(
        [jnp.broadcast_to(
            jnp.where((zi + oz >= 0) & (zi + oz <= nz - 1), one,
                      zero), (nz, 1, M)) for oz in (-1, 0, 1)],
        axis=-1)

    arho = jnp.zeros((nz, M), dx_.dtype)
    au = jnp.zeros((nz, M), dx_.dtype)
    av = jnp.zeros((nz, M), dx_.dtype)
    aw = jnp.zeros((nz, M), dx_.dtype)

    for t, oy in enumerate((-1, 0, 1)):
        (sx, sy, sz, su, sv, sw, sh, srho, sp) = [
            cat3(src[p * 3 + t][0, 0]) for p in range(n_props)]
        y_okf = jnp.where((j + oy >= 0) & (j + oy <= ny - 1), one,
                          zero)
        edgef = x_okf * y_okf * z_edgef
        smaskf = jnp.where(sh > 0.0, one, zero)

        xij = dx_[:, :, None] - sx
        yij = dy_[:, :, None] - sy
        zij = dz_[:, :, None] - sz
        r2 = xij * xij + yij * yij + zij * zij
        hj = sh
        sup = 2.0 * jnp.maximum(hi, hj)
        okf = (dmaskf[:, :, None] * smaskf * edgef *
               jnp.where(r2 < sup * sup, one, zero))
        mask = okf > 0.0  # full (nz, M, 3M) pair-block shape

        rij = jnp.sqrt(r2)
        hij = 0.5 * (hi + hj)
        _w, dwdr = _cubic_w_dwdr(rij, hij, dim)
        rinv = jnp.where(rij > 1e-12, 1.0 / rij, 0.0)
        dwx = dwdr * xij * rinv
        dwy = dwdr * yij * rinv
        dwz = dwdr * zij * rinv

        uij = du_[:, :, None] - su
        vij = dv_[:, :, None] - sv
        wij_ = dw_[:, :, None] - sw
        vdotx = uij * xij + vij * yij + wij_ * zij
        vdotdw = uij * dwx + vij * dwy + wij_ * dwz

        mj = srho * 0.0 + 1.0  # uniform-mass prototype; m folded
        # into the caller's scaling
        rhoij = 0.5 * (drho_[:, :, None] + srho)
        eps = eps_fac * hij * hij
        muij = hij * vdotx / (r2 + eps)
        piij = jnp.where(
            vdotx < 0,
            (-alpha * c0 * muij + beta * muij * muij) / rhoij, 0.0)
        # guard empty-slot lanes (rho == 0) before dividing; the
        # final where() would not stop nan*0 propagation
        rhoi2 = jnp.maximum(drho_[:, :, None] ** 2, 1e-30)
        rhoj2 = jnp.maximum(srho ** 2, 1e-30)
        pfac = dp_[:, :, None] / rhoi2 + sp / rhoj2 + piij

        arho = arho + jnp.sum(jnp.where(mask, mj * vdotdw, 0.0),
                              axis=2)
        au = au - jnp.sum(jnp.where(mask, mj * pfac * dwx, 0.0),
                          axis=2)
        av = av - jnp.sum(jnp.where(mask, mj * pfac * dwy, 0.0),
                          axis=2)
        aw = aw - jnp.sum(jnp.where(mask, mj * pfac * dwz, 0.0),
                          axis=2)

    vals = (arho, au, av, aw)

    @pl.when(k == 0)
    def _init():
        for ref, val in zip(out_refs, vals):
            ref[0, 0] = val

    @pl.when(k != 0)
    def _accum():
        for ref, val in zip(out_refs, vals):
            ref[0, 0] = ref[0, 0] + val


def _src_index_map(i, j, k, oy, nx, ny):
    return (jnp.clip(i + k - 1, 0, nx - 1),
            jnp.clip(j + oy, 0, ny - 1), 0, 0)


@functools.partial(jax.jit, static_argnames=('dims', 'M', 'dim', 'c0',
                                             'alpha', 'beta', 'eps_fac',
                                             'interpret'))
def fused_continuity_momentum(slot_props, dims, M, dim=3, c0=10.0,
                              alpha=0.1, beta=0.0, eps_fac=0.01,
                              interpret=False):
    """Run the fused pair kernel over all cell rows.

    ``slot_props``: dict with x, y, z, u, v, w, h, rho, p as dense
    slot arrays of shape (n_cells * M,), where empty slots have h == 0.
    Returns (arho, au, av, aw) slot arrays (unit particle mass; scale
    by m outside).
    """
    nx, ny, nz = dims
    names = ('x', 'y', 'z', 'u', 'v', 'w', 'h', 'rho', 'p')
    arrs = [slot_props[n].reshape(nx, ny, nz, M) for n in names]
    block = (1, 1, nz, M)
    dest_specs = [pl.BlockSpec(block, lambda i, j, k: (i, j, 0, 0))
                  for _ in names]
    src_specs = []
    src_ins = []
    for a in arrs:
        for oy in (-1, 0, 1):
            src_ins.append(a)
            src_specs.append(pl.BlockSpec(
                block, functools.partial(_src_index_map, oy=oy,
                                         nx=nx, ny=ny)))
    out_specs = [pl.BlockSpec(block, lambda i, j, k: (i, j, 0, 0))] * 4
    out_shape = [jax.ShapeDtypeStruct((nx, ny, nz, M),
                                      arrs[0].dtype)] * 4
    kernel = functools.partial(_row_kernel, nx, ny, nz, M, dim,
                               float(c0), float(alpha), float(beta),
                               float(eps_fac))
    outs = pl.pallas_call(
        kernel, grid=(nx, ny, 3), in_specs=dest_specs + src_specs,
        out_specs=out_specs, out_shape=out_shape,
        interpret=interpret)(*(arrs + src_ins))
    return tuple(o.reshape(nx * ny * nz * M) for o in outs)
