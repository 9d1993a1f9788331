"""Lid-driven cavity using the transport-velocity formulation
(parity case for /root/reference/pysph/examples/cavity.py, ~10 min
serial CPU at the defaults there)."""

import numpy as np

from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.scheme import SchemeChooser, TVFScheme
from pysph_tpu.sph.wc.edac import EDACScheme

L = 1.0
Umax = 1.0
c0 = 10 * Umax
rho0 = 1.0
p0 = c0 * c0 * rho0
hdx = 1.0


class LidDrivenCavity(Application):
    def add_user_options(self, group):
        group.add_argument('--nx', action='store', type=int,
                           dest='nx', default=50,
                           help='Number of points along x.')
        group.add_argument('--re', action='store', type=float,
                           dest='re', default=100,
                           help='Reynolds number.')
        self.n_avg = 5
        group.add_argument('--n-vel-avg', action='store', type=int,
                           dest='n_avg', default=None,
                           help='Average velocities over these many '
                                'saved timesteps.')

    def consume_user_options(self):
        nx = self.options.nx
        if self.options.n_avg is not None:
            self.n_avg = self.options.n_avg
        self.dx = L / nx
        self.re = self.options.re
        h0 = hdx * self.dx
        self.nu = Umax * L / self.re
        dt_cfl = 0.25 * h0 / (c0 + Umax)
        dt_viscous = 0.125 * h0 ** 2 / self.nu
        self.tf = 10.0
        self.dt = min(dt_cfl, dt_viscous, 1.0)

    def create_scheme(self):
        tvf = TVFScheme(['fluid'], ['solid'], dim=2, rho0=rho0,
                        c0=c0, nu=None, p0=p0, pb=p0, h0=hdx)
        edac = EDACScheme(fluids=['fluid'], solids=['solid'], dim=2,
                          c0=c0, rho0=rho0, nu=0.0, pb=p0, eps=0.0,
                          h=0.0)
        return SchemeChooser(default='tvf', tvf=tvf, edac=edac)

    def configure_scheme(self):
        h0 = hdx * self.dx
        if self.options.scheme == 'tvf':
            self.scheme.configure(h0=h0, nu=self.nu)
        elif self.options.scheme == 'edac':
            self.scheme.configure(h=h0, nu=self.nu)
        self.scheme.configure_solver(tf=self.tf, dt=self.dt,
                                     pfreq=500)

    def create_particles(self):
        dx = self.dx
        ghost_extent = 5 * dx
        _x = np.arange(-ghost_extent - dx / 2,
                       L + ghost_extent + dx / 2, dx)
        x, y = np.meshgrid(_x, _x)
        x = x.ravel()
        y = y.ravel()

        inside = (x > 0.0) & (x < L) & (y > 0.0) & (y < L)
        fluid = get_particle_array(name='fluid', x=x[inside],
                                   y=y[inside])
        solid = get_particle_array(name='solid', x=x[~inside],
                                   y=y[~inside])
        print('Lid driven cavity :: Re = %d, dt = %g' %
              (self.re, self.dt))

        volume = dx * dx
        for pa in (fluid, solid):
            pa.m[:] = volume * rho0
            pa.rho[:] = rho0
            pa.h[:] = hdx * dx
        solid.u[:] = np.where(np.asarray(solid.y) > L, Umax, 0.0)
        solid.v[:] = 0.0
        self.scheme.setup_properties([fluid, solid])
        fluid.V[:] = 1.0 / volume
        solid.V[:] = 1.0 / volume
        return [fluid, solid]

    def post_process(self, info_fname_or_dir='.'):
        """Centerline velocity profiles averaged over the last n_avg
        dumps (reference cavity.py:139)."""
        from pysph_tpu.solver.output import load
        from pysph_tpu.tools.interpolator import Interpolator
        files = self.output_files
        if not files:
            return
        files = files[-self.n_avg:]
        u_c = None
        v_c = None
        xc = np.linspace(0, L, 101)
        for f in files:
            data = load(f)
            arrays = list(data['arrays'].values())
            interp = Interpolator(arrays, num_points=101 * 101)
            interp.set_interpolation_points(
                x=np.repeat(xc, 101), y=np.tile(xc, 101))
            ui = interp.interpolate('u').reshape(101, 101)
            vi = interp.interpolate('v').reshape(101, 101)
            u_c = ui[:, 50] if u_c is None else u_c + ui[:, 50]
            v_c = vi[50, :] if v_c is None else v_c + vi[50, :]
        u_c /= len(files)
        v_c /= len(files)
        np.savez(self.output_dir + '/results.npz', x=xc, u_c=u_c,
                 v_c=v_c)
        print('centerline u range: [%.4f, %.4f]' %
              (u_c.min(), u_c.max()))
        return xc, u_c, v_c


if __name__ == '__main__':
    app = LidDrivenCavity()
    app.run()
    app.post_process(app.info_filename)
