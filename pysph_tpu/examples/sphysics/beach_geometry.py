"""Beach-style geometry used by the SPHysics cases: a flat section,
an inclined bed and a vertical back wall, plus a paddle/obstacle
column (parity with
/root/reference/pysph/examples/sphysics/beach_geometry.py)."""

import numpy as np

from pysph_tpu.tools.geometry import get_2d_wall


def get_beach_geometry_2d(dx=0.1, l=3.0, h=1.0, flat_l=1.0,
                          angle=45.0, num_layers=3):
    """Return (x, y) of the beach (flat + slope + back wall) and
    (x4, y4) of the paddle/obstacle column at the flat end.

    ``l`` is the total beach length, ``flat_l`` the flat part,
    ``angle`` the slope angle in degrees, ``h`` the back-wall
    height."""
    theta = np.pi * angle / 180.0
    x1, y1 = get_2d_wall(dx, np.array([(flat_l + dx) / 2.0, 0.]),
                         flat_l, num_layers, False)
    x2 = np.arange(flat_l - l, 0.0, dx * np.cos(theta))
    h2 = (l - flat_l) * np.tan(theta)
    y2_layer = x2 * np.tan(-theta)
    x2 = np.tile(x2, num_layers)
    y2 = np.ravel(np.array(
        [y2_layer - i * dx for i in range(num_layers)]))
    y3 = np.arange(h2 + dx, h + h2, dx)
    x3_layer = np.ones_like(y3) * (flat_l - l)
    y3 = np.tile(y3, num_layers)
    x3 = np.ravel(np.array(
        [x3_layer - i * dx for i in range(num_layers)]))
    x = np.concatenate([x1, x2, x3])
    y = np.concatenate([y1, y2, y3])
    y4 = np.arange(dx, 2.0 * h, dx)
    x4_layer = np.ones_like(y4) * flat_l
    y4 = np.tile(y4, num_layers)
    x4 = np.ravel(np.array(
        [x4_layer + i * dx for i in range(num_layers)]))
    return x, y, x4, y4
