"""Uniform particle distributions (parity with
/root/reference/pysph/tools/uniform_distribution.py)."""

import numpy


def uniform_distribution_hcp2D(dx, xmin, xmax, ymin, ymax,
                               adjust=False):
    """Hexagonal close packing in 2D (reference
    uniform_distribution.py:6).  Returns (x, y, dx, dy, xmin, xmax,
    ymin, ymax)."""
    dy = 0.5 * numpy.sqrt(3.0) * dx
    rows = int(numpy.ceil((ymax - ymin) / dy))
    cols = int(numpy.ceil((xmax - xmin) / dx))
    xs, ys = [], []
    for j in range(rows):
        y = ymin + 0.5 * dy + j * dy
        off = 0.25 * dx if j % 2 == 0 else -0.25 * dx
        x = xmin + 0.5 * dx + off + dx * numpy.arange(cols)
        keep = (x > xmin) & (x < xmax)
        xs.append(x[keep])
        ys.append(numpy.full(int(keep.sum()), y))
    x = numpy.concatenate(xs)
    y = numpy.concatenate(ys)
    if adjust:
        # scale so the packing exactly tiles the box
        ly = rows * dy
        y = ymin + (y - ymin) * (ymax - ymin) / ly
        dy = dy * (ymax - ymin) / ly
    return x, y, dx, dy, xmin, xmax, ymin, ymax


def uniform_distribution_cubic2D(dx, xmin, xmax, ymin, ymax,
                                 nrows=None):
    """Simple cubic lattice (reference uniform_distribution.py:41)."""
    dy = dx
    x, y = numpy.mgrid[xmin + 0.5 * dx:xmax:dx,
                       ymin + 0.5 * dy:ymax:dy]
    return x.ravel(), y.ravel(), dx, dy, xmin, xmax, ymin, ymax


def get_number_density_hcp(dx, dy, kernel, h0):
    """Number density of the HCP lattice at the origin (reference
    uniform_distribution.py:67)."""
    import numpy as np
    n = 5
    xs, ys = [], []
    for j in range(-n, n + 1):
        off = 0.25 * dx if j % 2 == 0 else -0.25 * dx
        for i in range(-n, n + 1):
            xs.append(i * dx + off)
            ys.append(j * dy)
    x = np.array(xs)
    y = np.array(ys)
    r = np.sqrt(x ** 2 + y ** 2)
    import jax.numpy as jnp
    xij = [jnp.asarray(x), jnp.asarray(y), jnp.zeros_like(jnp.asarray(x))]
    w = kernel.kernel(xij, jnp.asarray(r), h0)
    return float(jnp.sum(w))
