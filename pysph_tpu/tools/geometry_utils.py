"""Simple tank/block generators (parity with
/root/reference/pysph/tools/geometry_utils.py), vectorized with numpy
concatenation instead of index bookkeeping."""

import numpy


def create_2D_tank(x1, y1, x2, y2, dx):
    """Open-top 2D tank outline (reference geometry_utils.py:6)."""
    yl = numpy.arange(y1, y2 + dx / 2, dx)
    xl = numpy.full_like(yl, x1)
    yr = numpy.arange(y1, y2 + dx / 2, dx)
    xr = numpy.full_like(yr, x2)
    xb = numpy.arange(x1 + dx, x2 - dx + dx / 2, dx)
    yb = numpy.full_like(xb, y1)
    x = numpy.concatenate([xl, xb, xr])
    y = numpy.concatenate([yl, yb, yr])
    return x, y


def create_3D_tank(x1, y1, z1, x2, y2, z2, dx):
    """Open-top 3D box: bottom + 4 side walls
    (reference geometry_utils.py:34)."""
    pts = []
    gx, gy = numpy.mgrid[x1:x2 + dx / 2:dx, y1:y2 + dx / 2:dx]
    pts.append((gx.ravel(), gy.ravel(),
                numpy.full(gx.size, z1)))
    gx, gz = numpy.mgrid[x1:x2 + dx / 2:dx, z1:z2 + dx / 2:dx]
    pts.append((gx.ravel(), numpy.full(gx.size, y1), gz.ravel()))
    pts.append((gx.ravel(), numpy.full(gx.size, y2), gz.ravel()))
    gy, gz = numpy.mgrid[y1:y2 + dx / 2:dx, z1:z2 + dx / 2:dx]
    pts.append((numpy.full(gy.size, x1), gy.ravel(), gz.ravel()))
    pts.append((numpy.full(gy.size, x2), gy.ravel(), gz.ravel()))
    x = numpy.concatenate([p[0] for p in pts])
    y = numpy.concatenate([p[1] for p in pts])
    z = numpy.concatenate([p[2] for p in pts])
    return x, y, z


def create_2D_filled_region(x1, y1, x2, y2, dx):
    """(reference geometry_utils.py:77)"""
    x, y = numpy.mgrid[x1:x2 + dx / 2:dx, y1:y2 + dx / 2:dx]
    return x.ravel(), y.ravel()


def create_3D_filled_region(x1, y1, z1, x2, y2, z2, dx):
    """(reference geometry_utils.py:87)"""
    x, y, z = numpy.mgrid[x1:x2 + dx / 2:dx, y1:y2 + dx / 2:dx,
                          z1:z2 + dx / 2:dx]
    return x.ravel(), y.ravel(), z.ravel()
