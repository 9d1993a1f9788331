"""Flow past a circular cylinder in a wind tunnel with open
inlet/outlet boundaries (parity case for
/root/reference/pysph/examples/flow_past_cylinder_2d.py).

Exercises the full inlet/outlet framework (sph/bc/): choose the
strategy with --io-method from donothing / mirror / hybrid /
characteristic / mod_donothing."""

import os

import numpy as np

from pysph_tpu.base.kernels import QuinticSpline
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.bc.inlet_outlet_manager import (
    InletInfo, OutletInfo)
from pysph_tpu.sph.equation import Equation
from pysph_tpu.sph.wc.edac import EDACScheme
from pysph_tpu.tools import geometry as G

rho = 1000.0
umax = 1.0
c0 = 10 * umax
p0 = rho * c0 * c0


class ResetInletVelocity(Equation):
    def __init__(self, dest, sources, U, V, W):
        self.U = U
        self.V = V
        self.W = W
        super(ResetInletVelocity, self).__init__(dest, sources)

    def loop(self, d_idx, d_u, d_v, d_w, d_uref):
        d_uref[0] = abs(self.U)
        d_u[d_idx] = self.U
        d_v[d_idx] = self.V
        d_w[d_idx] = self.W


class WindTunnel(Application):
    def initialize(self):
        self.dc = 1.2            # cylinder diameter
        self.nl = 10
        self.io_method = 'donothing'

    def add_user_options(self, group):
        group.add_argument('--re', action='store', type=float,
                           dest='re', default=200)
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=1.2)
        group.add_argument('--nx', action='store', type=int,
                           dest='nx', default=12,
                           help='points across the cylinder')
        group.add_argument('--lt', action='store', type=float,
                           dest='Lt', default=30,
                           help='tunnel length in diameters')
        group.add_argument('--wt', action='store', type=float,
                           dest='Wt', default=15,
                           help='tunnel width in diameters')
        group.add_argument('--dc', action='store', type=float,
                           dest='dc', default=1.2)
        group.add_argument('--io-method', action='store', type=str,
                           dest='io_method', default='donothing',
                           choices=('donothing', 'mirror', 'hybrid',
                                    'characteristic',
                                    'mod_donothing'))

    def consume_user_options(self):
        self.dc = dc = self.options.dc
        self.Lt = self.options.Lt / 2 * dc
        self.Wt = self.options.Wt / 2 * dc
        self.io_method = self.options.io_method
        self.nu = nu = umax * self.dc / self.options.re
        self.cxy = 5.0 * self.dc, 0.0
        self.dx = dx = self.dc / self.options.nx
        hdx = self.options.hdx
        self.nl = int(6.0 * hdx)
        self.h = h = hdx * dx
        dt_cfl = 0.25 * h / (c0 + umax)
        dt_viscous = 0.125 * h ** 2 / nu
        self.dt = min(dt_cfl, dt_viscous)
        self.tf = 100.0

    def _create_fluid(self):
        dx = self.dx
        x, y = np.mgrid[dx / 2:self.Lt:dx,
                        -self.Wt + dx / 2:self.Wt:dx]
        x, y = x.ravel(), y.ravel()
        vol = dx * dx
        return get_particle_array(
            name='fluid', m=vol * rho * np.ones_like(x), x=x, y=y,
            h=self.h, V=1.0 / vol, u=umax, p=0.0, rho=rho)

    def _create_solid(self):
        dx = self.dx
        xs, ys = [0.0], [0.0]
        r = dx
        nt = 0
        while r - self.dc / 2 < 1e-5:
            nnew = int(np.pi * r ** 2 / dx ** 2 + 0.5)
            theta = np.linspace(0.0, 2 * np.pi, nnew - nt + 1)[:-1]
            xs.extend(r * np.cos(theta))
            ys.extend(r * np.sin(theta))
            nt = nnew
            r += dx
        x = np.asarray(xs) + self.cxy[0]
        y = np.asarray(ys)
        vol = dx * dx
        return get_particle_array(
            name='solid', x=x, y=y, m=vol * rho, rho=rho, h=self.h,
            V=1.0 / vol)

    def _create_wall(self):
        dx = self.dx
        nl = self.nl
        x0, y0 = np.mgrid[dx / 2:self.Lt + 2 * nl * dx:dx,
                          dx / 2:nl * dx:dx]
        x0 = x0.ravel() - nl * dx
        y0 = y0.ravel() - nl * dx - self.Wt
        x1 = x0.copy()
        y1 = y0 + nl * dx + 2 * self.Wt
        vol = dx * dx
        return get_particle_array(
            name='wall', x=np.concatenate([x0, x1]),
            y=np.concatenate([y0, y1]), m=vol * rho, rho=rho,
            h=self.h, V=1.0 / vol)

    def _create_io_array(self, name, xshift):
        dx = self.dx
        x, y = np.mgrid[dx / 2:self.nl * dx:dx,
                        -self.Wt + dx / 2:self.Wt:dx]
        x = x.ravel() + xshift
        y = y.ravel()
        vol = dx * dx
        return get_particle_array(
            name=name, x=x, y=y, m=vol * rho, h=self.h,
            V=1.0 / vol, u=umax, p=0.0, rho=rho)

    def create_particles(self):
        fluid = self._create_fluid()
        solid = self._create_solid()
        G.remove_overlap_particles(fluid, solid, self.dx, dim=2)
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
            fluid.uag[:] = umax
            fluid.uta[:] = umax
            outlet.uta[:] = umax
        return particles

    def create_scheme(self):
        return EDACScheme(
            ['fluid'], ['solid'], dim=2, rho0=rho, c0=c0, h=None,
            pb=p0, nu=None, inlet_outlet_manager=None,
            inviscid_solids=['wall'])

    def configure_scheme(self):
        self.iom = self._create_inlet_outlet_manager()
        scheme = self.scheme
        scheme.inlet_outlet_manager = self.iom
        self.iom.update_dx(self.dx)
        scheme.configure(h=self.h, nu=self.nu)
        scheme.configure_solver(kernel=QuinticSpline(dim=2),
                                tf=self.tf, dt=self.dt, pfreq=100,
                                n_damp=0)

    def _get_io_info(self):
        inleteqns = [
            ResetInletVelocity('ghost_inlet', [], U=-umax, V=0.0,
                               W=0.0),
            ResetInletVelocity('inlet', [], U=umax, V=0.0, W=0.0),
        ]
        i_has_ghost = True
        o_has_ghost = True
        props_to_copy = ['x0', 'y0', 'z0', 'uhat', 'vhat', 'what',
                         'x', 'y', 'z', 'u', 'v', 'w', 'm', 'h',
                         'rho', 'p', 'ioid']
        mod = 'pysph_tpu.sph.bc.%s' % self.io_method
        import importlib
        inlet_mod = importlib.import_module(mod + '.inlet')
        outlet_mod = importlib.import_module(mod + '.outlet')
        sio = importlib.import_module(mod + '.simple_inlet_outlet')
        if self.io_method in ('donothing', 'mod_donothing',
                              'characteristic', 'hybrid'):
            o_has_ghost = False
        if self.io_method == 'hybrid':
            props_to_copy += ['uta', 'pta', 'u0', 'v0', 'w0', 'p0']
        inlet_info = InletInfo(
            pa_name='inlet', normal=[-1.0, 0.0, 0.0],
            refpoint=[0.0, 0.0, 0.0], equations=inleteqns,
            has_ghost=i_has_ghost, update_cls=inlet_mod.Inlet,
            umax=umax)
        outlet_info = OutletInfo(
            pa_name='outlet', normal=[1.0, 0.0, 0.0],
            refpoint=[self.Lt, 0.0, 0.0], has_ghost=o_has_ghost,
            update_cls=outlet_mod.Outlet, equations=None,
            props_to_copy=props_to_copy)
        return inlet_info, outlet_info, sio.SimpleInletOutlet

    def _create_inlet_outlet_manager(self):
        inlet_info, outlet_info, manager = self._get_io_info()
        return manager(fluid_arrays=['fluid'],
                       inletinfo=[inlet_info],
                       outletinfo=[outlet_info])

    def create_inlet_outlet(self, particle_arrays):
        return self.iom.get_inlet_outlet(particle_arrays)

    def post_process(self, info_fname_or_dir='.'):
        """Drag/lift on the cylinder over time (pressure moments from
        the dumped solid array)."""
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        t, cd = [], []
        factor = 0.5 * rho * umax ** 2 * self.dc
        for f in files:
            data = load(f)
            solid = data['arrays']['solid']
            p = np.asarray(solid.p)
            x = np.asarray(solid.x) - self.cxy[0]
            y = np.asarray(solid.y)
            r = np.sqrt(x * x + y * y) + 1e-12
            surf = r > (self.dc / 2 - 1.5 * self.dx)
            # pressure-drag estimate from surface particles
            fx = -np.sum(p[surf] * (x[surf] / r[surf])) * self.dx
            t.append(data['solver_data']['t'])
            cd.append(fx / factor)
        np.savez(os.path.join(self.output_dir, 'results.npz'),
                 t=np.asarray(t), cd=np.asarray(cd))
        return t, cd


if __name__ == '__main__':
    app = WindTunnel()
    app.run()
    app.post_process(app.info_filename)
