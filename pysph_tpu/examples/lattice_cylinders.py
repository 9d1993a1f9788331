"""Incompressible flow past a doubly-periodic lattice of cylinders,
TVF scheme driven by a body force at Re = 1 (parity case for
/root/reference/pysph/examples/lattice_cylinders.py)."""

import os

import numpy as np

from pysph_tpu.base.domain import DomainManager
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.scheme import TVFScheme

L = 0.1
Umax = 5e-5
c0 = 10 * Umax
rho0 = 1000.0
p0 = c0 * c0 * rho0
a = 0.02
H = L
fx = 1.5e-7

Re = 1.0
nu = a * Umax / Re

nx = 100
dx = L / nx
hdx = 1.0
h0 = hdx * dx
dt_cfl = 0.25 * h0 / (c0 + Umax)
dt_viscous = 0.125 * h0 ** 2 / nu
dt_force = 0.25 * np.sqrt(h0 / abs(fx))

tf = 1000.0
dt = min(dt_cfl, dt_viscous, dt_force)


class LatticeCylinders(Application):
    def create_domain(self):
        return DomainManager(xmin=0, xmax=L, ymin=0, ymax=H,
                             periodic_in_x=True, periodic_in_y=True)

    def create_particles(self):
        _x = np.arange(dx / 2, L, dx)
        _y = np.arange(dx / 2, H, dx)
        x, y = np.meshgrid(_x, _y)
        x, y = x.ravel(), y.ravel()
        cx, cy = 0.5 * L, 0.5 * H
        outside = np.sqrt((x - cx) ** 2 + (y - cy) ** 2) > a
        indices = np.where(outside)[0]

        solid = get_particle_array(name='solid', x=x, y=y)
        fluid = solid.extract_particles(indices)
        fluid.set_name('fluid')
        solid.remove_particles(indices)
        print("Periodic cylinders :: Re = %g, nfluid = %d, "
              "nsolid=%d, dt = %g"
              % (Re, fluid.get_number_of_particles(),
                 solid.get_number_of_particles(), dt))
        self.scheme.setup_properties([fluid, solid])

        volume = dx * dx
        fluid.m[:] = volume * rho0
        solid.m[:] = volume * rho0
        solid.rho[:] = rho0
        fluid.rho[:] = rho0
        fluid.V[:] = 1.0 / volume
        solid.V[:] = 1.0 / volume
        fluid.h[:] = hdx * dx
        solid.h[:] = hdx * dx
        return [fluid, solid]

    def create_scheme(self):
        s = TVFScheme(
            ['fluid'], ['solid'], dim=2, rho0=rho0, c0=c0, nu=nu,
            p0=p0, pb=p0, h0=dx * hdx, gx=fx)
        s.configure_solver(tf=tf, dt=dt)
        return s

    def post_process(self, info_fname):
        if len(self.output_files) == 0:
            return
        from pysph_tpu.solver.output import load
        from pysph_tpu.tools.interpolator import Interpolator

        y = np.linspace(0.0, H, 100)
        x = np.ones_like(y) * L / 2
        data = load(self.output_files[-1])
        dm = self.create_domain()
        interp = Interpolator(list(data['arrays'].values()), x=x,
                              y=y, domain_manager=dm)
        ui_lby2 = interp.interpolate('u')
        interp.set_interpolation_points(x=np.ones_like(y) * L, y=y)
        ui_l = interp.interpolate('u')
        xx, yy = np.mgrid[0:L:100j, 0:H:100j]
        interp.set_interpolation_points(x=xx, y=yy)
        u = interp.interpolate('u')
        v = interp.interpolate('v')
        vmag = np.sqrt(u * u + v * v)
        res = os.path.join(self.output_dir, "results.npz")
        np.savez(res, y=y / H - 0.5, ui_l=ui_l, ui_lby2=ui_lby2,
                 xx=xx / L, yy=yy / H, vmag=vmag)


if __name__ == '__main__':
    app = LatticeCylinders()
    app.run()
    app.post_process(app.info_filename)
