"""Surface mesh -> particle generators (parity with
/root/reference/pysph/tools/mesh_tools.pyx).

The reference is Cython iterating triangle by triangle; here every
triangle is sampled at once with a vectorized barycentric lattice."""

import numpy as np


class ZeroAreaTriangleException(Exception):
    pass


class PolygonMeshError(ValueError):
    pass


def _triangle_points(p0, p1, p2, dx):
    """Points filling one triangle at approximate spacing dx
    (vectorized barycentric lattice, includes edges/vertices)."""
    a = np.linalg.norm(p1 - p0)
    b = np.linalg.norm(p2 - p0)
    n = max(int(np.ceil(max(a, b) / dx)), 1)
    pts = []
    for i in range(n + 1):
        u = i / n
        m = n - i
        if m == 0:
            pts.append(p0[None, :] + u * (p1 - p0)[None, :])
            continue
        v = np.linspace(0.0, 1.0 - u, m + 1)
        pts.append(p0[None, :] + u * (p1 - p0)[None, :] +
                   v[:, None] * (p2 - p0)[None, :])
    return np.concatenate(pts, axis=0)


def surface_points(x, y, z, cells, dx_triangle):
    """Sample all triangles of a surface mesh
    (reference mesh_tools.pyx:103 `_get_surface_mesh`; the hot loop
    runs in the native C++ helper when the toolchain is available —
    pysph_tpu/native/mesh_native.cpp)."""
    verts = np.stack([np.asarray(x), np.asarray(y),
                      np.asarray(z)], axis=1)
    cells = np.asarray(cells, dtype=np.int64).reshape(-1, 3)
    from pysph_tpu import native
    pts = native.surface_points(verts, cells, dx_triangle)
    if pts is not None:
        if pts.shape[0] == 0:
            raise PolygonMeshError(
                'mesh has no non-degenerate triangles')
        return pts[:, 0], pts[:, 1], pts[:, 2]
    out = []
    for tri in cells:
        p0, p1, p2 = verts[tri]
        area = 0.5 * np.linalg.norm(np.cross(p1 - p0, p2 - p0))
        if area < 1e-30:
            continue
        out.append(_triangle_points(p0, p1, p2, dx_triangle))
    if not out:
        raise PolygonMeshError('mesh has no non-degenerate triangles')
    pts = np.concatenate(out, axis=0)
    return pts[:, 0], pts[:, 1], pts[:, 2]


def remove_repeated_points(x, y, z, dx):
    """Deduplicate sampled points on a dx/2 grid
    (reference mesh_tools.pyx surface cleanup)."""
    key = np.stack([np.round(np.asarray(x) / (0.5 * dx)),
                    np.round(np.asarray(y) / (0.5 * dx)),
                    np.round(np.asarray(z) / (0.5 * dx))], axis=1)
    _, idx = np.unique(key, axis=0, return_index=True)
    idx = np.sort(idx)
    return np.asarray(x)[idx], np.asarray(y)[idx], np.asarray(z)[idx]


def fill_volume(x, y, z, dx):
    """Uniform grid points covering the axis-aligned bounding volume
    of a surface sampling (mirrors the uniform fill of reference
    mesh_tools.pyx:228; use :func:`fill_volume_mesh` for an exact
    interior fill when the triangle connectivity is available)."""
    x = np.asarray(x)
    y = np.asarray(y)
    z = np.asarray(z)
    gx, gy, gz = np.mgrid[x.min():x.max() + dx / 2:dx,
                          y.min():y.max() + dx / 2:dx,
                          z.min():z.max() + dx / 2:dx]
    return gx.ravel(), gy.ravel(), gz.ravel()


def fill_volume_mesh(x, y, z, cells, dx):
    """Exact interior lattice fill of a CLOSED triangle surface by
    z-ray parity (native C++ when available, numpy fallback).

    Returns (x, y, z) of interior lattice points."""
    verts = np.stack([np.asarray(x, float), np.asarray(y, float),
                      np.asarray(z, float)], axis=1)
    cells = np.asarray(cells, dtype=np.int64).reshape(-1, 3)
    from pysph_tpu import native
    pts = native.fill_volume(verts, cells, dx)
    if pts is None:
        pts = _fill_volume_numpy(verts, cells, dx)
    return pts[:, 0], pts[:, 1], pts[:, 2]


def _fill_volume_numpy(verts, cells, dx):
    lo = verts.min(axis=0)
    hi = verts.max(axis=0)
    nx = int(np.floor((hi[0] - lo[0]) / dx)) + 1
    ny = int(np.floor((hi[1] - lo[1]) / dx)) + 1
    hits = {}
    eps = 1e-12
    for tri in cells:
        p0, p1, p2 = verts[tri]
        a = p1 - p0
        b = p2 - p0
        det = a[0] * b[1] - a[1] * b[0]
        if abs(det) < 1e-30:
            continue
        i0 = max(0, int(np.ceil((min(p0[0], p1[0], p2[0]) - lo[0])
                                / dx)))
        i1 = min(nx - 1, int(np.floor(
            (max(p0[0], p1[0], p2[0]) - lo[0]) / dx)))
        j0 = max(0, int(np.ceil((min(p0[1], p1[1], p2[1]) - lo[1])
                                / dx)))
        j1 = min(ny - 1, int(np.floor(
            (max(p0[1], p1[1], p2[1]) - lo[1]) / dx)))
        if i1 < i0 or j1 < j0:
            continue
        gi, gj = np.mgrid[i0:i1 + 1, j0:j1 + 1]
        px = lo[0] + gi * dx - p0[0]
        py = lo[1] + gj * dx - p0[1]
        u = (px * b[1] - py * b[0]) / det
        v = (a[0] * py - a[1] * px) / det
        ok = (u >= -eps) & (v >= -eps) & (u + v <= 1 + eps)
        zs = p0[2] + u * (p1[2] - p0[2]) + v * (p2[2] - p0[2])
        for i, j, zz in zip(gi[ok], gj[ok], zs[ok]):
            hits.setdefault((int(i), int(j)), []).append(float(zz))
    out = []
    for (i, j), zs in hits.items():
        zs.sort()
        uniq = []
        for zz in zs:
            if not uniq or zz - uniq[-1] > 1e-9 * (1 + abs(zz)):
                uniq.append(zz)
        for k in range(0, len(uniq) - 1, 2):
            k0 = int(np.ceil((uniq[k] - lo[2]) / dx))
            k1 = int(np.floor((uniq[k + 1] - lo[2]) / dx))
            for kk in range(max(0, k0), k1 + 1):
                out.append((lo[0] + i * dx, lo[1] + j * dx,
                            lo[2] + kk * dx))
    return (np.asarray(out) if out else np.zeros((0, 3)))
