"""Geometry generators (parity with
/root/reference/pysph/tools/geometry.py): blocks, walls, tanks, circles,
spheres, cylinders, transforms, and overlap removal."""

import numpy as np


def distance(point1, point2=None):
    if point2 is None:
        point2 = np.zeros(3)
    return np.linalg.norm(np.asarray(point1) - np.asarray(point2))


def distance_2d(point1, point2=None):
    if point2 is None:
        point2 = np.zeros(2)
    return np.linalg.norm(np.asarray(point1) - np.asarray(point2))


def translate(x, y, z, x_translate=0.0, y_translate=0.0, z_translate=0.0):
    return (np.asarray(x) + x_translate, np.asarray(y) + y_translate,
            np.asarray(z) + z_translate)


def rotate(x, y, z, axis=None, angle=90.0):
    """Rotate points about ``axis`` by ``angle`` degrees (Rodrigues)."""
    if axis is None:
        axis = np.array([0.0, 0.0, 1.0])
    axis = np.asarray(axis, dtype=float)
    axis = axis / np.linalg.norm(axis)
    theta = np.deg2rad(angle)
    k = axis
    pts = np.stack([np.asarray(x), np.asarray(y), np.asarray(z)])
    kx = np.cross(k, pts.T).T
    kdot = k.dot(pts)
    rot = (pts * np.cos(theta) + kx * np.sin(theta) +
           np.outer(k, kdot) * (1 - np.cos(theta)))
    return rot[0], rot[1], rot[2]


def extrude(x, y, dx=0.01, extrude_dist=1.0, z_center=0.0):
    """Extrude a 2d point set along z."""
    n = int(extrude_dist / dx) + 1
    zs = np.linspace(z_center - extrude_dist / 2.0,
                     z_center + extrude_dist / 2.0, n)
    x = np.asarray(x)
    y = np.asarray(y)
    xo = np.tile(x, n)
    yo = np.tile(y, n)
    zo = np.repeat(zs, x.size)
    return xo, yo, zo


def get_2d_wall(dx=0.01, center=(0.0, 0.0), length=1.0, num_layers=1,
                up=True):
    """Wall parallel to the x-axis with layers stacked in +/-y."""
    x = np.arange(-length / 2.0, length / 2.0 + dx, dx) + center[0]
    sign = 1 if up else -1
    ys = [np.ones_like(x) * (center[1] + sign * i * dx)
          for i in range(num_layers)]
    return np.tile(x, num_layers), np.concatenate(ys)


def get_2d_tank(dx=0.05, base_center=(0.0, 0.0), length=1.0, height=1.0,
                num_layers=1, outside=True, staggered=False, top=False):
    """Open 2d tank: base on the x-axis, side walls along y."""
    dy = dx
    fac = 1 if outside else 0
    if staggered:
        dx = dx / 2
    start = fac * (1 - num_layers) * dx
    end = fac * num_layers * dx + (1 - fac) * dx
    x, y = np.mgrid[start:length + end:dx, start:height + end:dy]
    topset = 0 if top else 10 * height
    if staggered:
        topset += dx
        y[1::2] += dx
    offset = 0 if outside else (num_layers - 1) * dx
    cond = ~((x > offset) & (x < length - offset) &
             (y > offset) & (y < height + topset - offset))
    return (x[cond] + base_center[0] - length / 2,
            y[cond] + base_center[1])


def get_2d_block(dx=0.01, length=1.0, height=1.0, center=(0.0, 0.0)):
    """Filled rectangular block of particles."""
    n1 = int(length / dx) + 1
    n2 = int(height / dx) + 1
    x, y = np.mgrid[-length / 2.0:length / 2.0:n1 * 1j,
                    -height / 2.0:height / 2.0:n2 * 1j]
    return x.ravel() + center[0], y.ravel() + center[1]


def get_2d_circle(dx=0.01, r=0.5, center=(0.0, 0.0)):
    """Filled circular disc."""
    N = int(2.0 * r / dx) + 1
    x, y = np.mgrid[-r:r:N * 1j, -r:r:N * 1j]
    x, y = x.ravel(), y.ravel()
    keep = x * x + y * y <= r * r
    return x[keep] + center[0], y[keep] + center[1]


def get_2d_hollow_circle(dx=0.01, r=1.0, center=(0.0, 0.0),
                         num_layers=2, inside=True):
    """Annulus of ``num_layers`` layers around radius r."""
    width = num_layers * dx
    r_out = r if inside else r + width
    r_in = r - width if inside else r
    N = int(2.0 * r_out / dx) + 1
    x, y = np.mgrid[-r_out:r_out:N * 1j, -r_out:r_out:N * 1j]
    x, y = x.ravel(), y.ravel()
    r2 = x * x + y * y
    keep = (r2 <= r_out * r_out) & (r2 >= r_in * r_in)
    return x[keep] + center[0], y[keep] + center[1]


def get_3d_hollow_cylinder(dx=0.01, r=0.5, length=1.0,
                           center=(0.0, 0.0, 0.0), num_layers=2,
                           inside=True):
    """Hollow cylinder along z."""
    x2, y2 = get_2d_hollow_circle(dx, r, (0.0, 0.0), num_layers, inside)
    x, y, z = extrude(x2, y2, dx, length, 0.0)
    return x + center[0], y + center[1], z + center[2]


def get_3d_block(dx=0.01, length=1.0, height=1.0, depth=1.0,
                 center=(0.0, 0.0, 0.0)):
    """Filled 3d block."""
    n1 = int(length / dx) + 1
    n2 = int(height / dx) + 1
    n3 = int(depth / dx) + 1
    x, y, z = np.mgrid[-length / 2.0:length / 2.0:n1 * 1j,
                       -height / 2.0:height / 2.0:n2 * 1j,
                       -depth / 2.0:depth / 2.0:n3 * 1j]
    return (x.ravel() + center[0], y.ravel() + center[1],
            z.ravel() + center[2])


def get_3d_sphere(dx=0.01, r=0.5, center=(0.0, 0.0, 0.0)):
    """Filled sphere."""
    N = int(2.0 * r / dx) + 1
    x, y, z = np.mgrid[-r:r:N * 1j, -r:r:N * 1j, -r:r:N * 1j]
    x, y, z = x.ravel(), y.ravel(), z.ravel()
    keep = x * x + y * y + z * z <= r * r
    return (x[keep] + center[0], y[keep] + center[1],
            z[keep] + center[2])


def find_overlap_particles(fluid_parray, solid_parray, dx_solid, dim=3):
    """Indices of fluid particles closer than dx_solid to any solid
    particle (reference geometry.py:713)."""
    from scipy.spatial import cKDTree
    cols = ['x', 'y', 'z'][:dim]
    fl = np.stack([np.asarray(fluid_parray.get(c)) for c in cols], axis=1)
    so = np.stack([np.asarray(solid_parray.get(c)) for c in cols], axis=1)
    tree = cKDTree(so)
    d, _ = tree.query(fl, k=1)
    return np.where(d < dx_solid)[0]


def remove_overlap_particles(fluid_parray, solid_parray, dx_solid, dim=3):
    """Remove fluid particles overlapping the solid
    (reference geometry.py:763)."""
    idx = find_overlap_particles(fluid_parray, solid_parray, dx_solid,
                                 dim)
    if len(idx):
        fluid_parray.remove_particles(idx)
