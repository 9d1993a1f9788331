"""Flow past a cylinder whose body and near-field fluid come from a
packed (body-fitted, SPH-relaxed) particle distribution around the
cylinder's surface coordinates (parity case for
/root/reference/pysph/examples/fpc_with_packed_cylinder.py)."""

import os
import tempfile
from math import cos, pi, sin

import numpy as np

from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.examples.flow_past_cylinder_2d import (WindTunnel, rho,
                                                      umax)

use_coords = True

# surface coordinates (and a file with the same) of the cylinder
xc, yc = [], []
cyl_file = os.path.join(tempfile.gettempdir(), 'cylinder.txt')
with open(cyl_file, 'w') as fp:
    for i in range(0, 100):
        _x = cos(2 * pi * i / 100) + 5.0
        _y = sin(2 * pi * i / 100)
        xc.append(_x)
        yc.append(_y)
        fp.write('%.3f %.3f\n' % (_x, _y))


class FPCWithPackedCylinder(WindTunnel):
    def _get_packed_points(self):
        """returns xs, ys, zs, xf, yf, zf"""
        from pysph_tpu.tools.geometry import (
            get_packed_2d_particles_from_surface_coordinates,
            get_packed_2d_particles_from_surface_file)
        folder = self.output_dir
        dx = self.dx
        if use_coords:
            return get_packed_2d_particles_from_surface_coordinates(
                self.add_user_options, folder, dx, x=np.array(xc),
                y=np.array(yc), shift=True)
        return get_packed_2d_particles_from_surface_file(
            self.add_user_options, folder, dx, filename=cyl_file,
            shift=True)

    def _create_solid(self):
        xs, ys, zs, xf, yf, zf = self._get_packed_points()
        dx = self.dx
        volume = dx * dx
        return get_particle_array(
            name='solid', x=xs - dx / 2, y=ys, m=volume * rho,
            rho=rho, h=self.h, V=1.0 / volume)

    def _create_fluid(self):
        from pysph_tpu.tools.geometry import create_fluid_around_packing
        xs, ys, zs, xf, yf, zf = self._get_packed_points()
        dx = self.dx
        volume = dx * dx
        L = self.Lt
        B = self.Wt * 2.0
        return create_fluid_around_packing(
            dx, xf - dx / 2, yf, L, B, m=volume * rho, rho=rho,
            h=self.h, V=1.0 / volume, u=umax, p=0.0, uhat=umax)

    def create_particles(self):
        fluid = self._create_fluid()
        solid = self._create_solid()
        outlet = self._create_io_array('outlet', self.Lt)
        inlet = self._create_io_array('inlet', -self.nl * self.dx)
        wall = self._create_wall()

        ghost_inlet = self.iom.create_ghost(inlet, inlet=True)
        ghost_outlet = self.iom.create_ghost(outlet, inlet=False)
        particles = [fluid, inlet, outlet, solid, wall]
        for g in (ghost_inlet, ghost_outlet):
            if g is not None:
                particles.append(g)
        self.scheme.setup_properties(particles)
        for p in ('xn', 'yn', 'zn'):
            wall.add_property(p)
        wall.yn[:] = np.where(np.asarray(wall.y) > 0, 1.0, -1.0)
        if self.io_method == 'hybrid':
            fluid.uag[:] = 1.0
            fluid.uta[:] = 1.0
            outlet.uta[:] = 1.0
        return particles


if __name__ == '__main__':
    app = FPCWithPackedCylinder()
    app.run()
    app.post_process(app.info_filename)
