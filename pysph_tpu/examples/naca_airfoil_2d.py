"""Flow past a NACA airfoil in the wind tunnel (exercises the NACA
geometry generators, tools/geometry.py; the tunnel/IO machinery is
the flow_past_cylinder_2d setup with the cylinder replaced by a solid
4- or 5-digit airfoil)."""

import numpy as np

from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.examples.flow_past_cylinder_2d import WindTunnel, rho
from pysph_tpu.tools.geometry import (
    get_4digit_naca_airfoil, get_5digit_naca_airfoil)


class NACAWindTunnel(WindTunnel):
    def add_user_options(self, group):
        super(NACAWindTunnel, self).add_user_options(group)
        group.add_argument('--airfoil', action='store',
                           dest='airfoil', default='0012',
                           help='NACA 4- or 5-digit designation.')
        group.add_argument('--aoa', action='store', type=float,
                           dest='aoa', default=5.0,
                           help='Angle of attack (degrees).')

    def consume_user_options(self):
        super(NACAWindTunnel, self).consume_user_options()
        self.airfoil = self.options.airfoil
        self.aoa = np.deg2rad(self.options.aoa)

    def _create_solid(self):
        dx = self.dx
        chord = self.dc  # reuse the --dc length scale as the chord
        if len(self.airfoil) == 4:
            x, y = get_4digit_naca_airfoil(dx=dx,
                                           airfoil=self.airfoil,
                                           c=chord)
        else:
            x, y = get_5digit_naca_airfoil(dx=dx,
                                           airfoil=self.airfoil,
                                           c=chord)
        # rotate by the angle of attack about the quarter chord and
        # place at the cylinder station
        xq = x - 0.25 * chord
        ca, sa = np.cos(-self.aoa), np.sin(-self.aoa)
        xr = ca * xq - sa * y
        yr = sa * xq + ca * y
        vol = dx * dx
        return get_particle_array(
            name='solid', x=xr + self.cxy[0], y=yr,
            m=vol * rho, rho=rho, h=self.h, V=1.0 / vol)


if __name__ == '__main__':
    app = NACAWindTunnel()
    app.run()
    app.post_process(app.info_filename)
