"""Two-dimensional dam break over a dry bed.

Parity case for /root/reference/pysph/examples/dam_break_2d.py
(Gomez-Gesteira et al. 2010): WCSPH with the Hughes-Graham corrected
boundary, adaptive timestep and damping.
"""

import numpy as np

from pysph_tpu.base.kernels import WendlandQuintic
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.iisph import IISPHScheme
from pysph_tpu.sph.scheme import SchemeChooser, WCSPHScheme
from pysph_tpu.sph.wc.edac import EDACScheme
from pysph_tpu.sph.wc.gtvf import GTVFScheme
from pysph_tpu.tools.geometry import get_2d_block, get_2d_tank

fluid_column_height = 2.0
fluid_column_width = 1.0
container_height = 4.0
container_width = 4.0
nu = 0.0
g = 9.81
ro = 1000.0
vref = np.sqrt(2 * 9.81 * fluid_column_height)
co = 10.0 * vref
gamma = 7.0
alpha = 0.1
beta = 0.0
hdx = 1.3


class DamBreak2D(Application):
    def add_user_options(self, group):
        group.add_argument('--dx', action='store', type=float, dest='dx',
                           default=0.03, help='Particle spacing.')
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=hdx, help='h = hdx * dx.')

    def consume_user_options(self):
        self.hdx = self.options.hdx
        self.dx = self.options.dx
        self.h = self.hdx * self.dx

    def create_scheme(self):
        wcsph = WCSPHScheme(
            ['fluid'], ['boundary'], dim=2, rho0=ro, c0=co, h0=None,
            hdx=hdx, gy=-g, alpha=alpha, beta=beta, gamma=gamma,
            hg_correction=True)
        edac = EDACScheme(
            fluids=['fluid'], solids=['boundary'], dim=2, c0=co,
            nu=nu, rho0=ro, h=hdx * 0.03, pb=0.0, gy=-g, eps=0.0,
            clamp_p=True)
        iisph = IISPHScheme(
            fluids=['fluid'], solids=['boundary'], dim=2, nu=nu,
            rho0=ro, gy=-g)
        gtvf = GTVFScheme(
            fluids=['fluid'], solids=['boundary'], dim=2, nu=nu,
            rho0=ro, gy=-g, h0=None, c0=co, pref=None)
        return SchemeChooser(default='wcsph', wcsph=wcsph, edac=edac,
                             iisph=iisph, gtvf=gtvf)

    def configure_scheme(self):
        from pysph_tpu.base.kernels import QuinticSpline
        from pysph_tpu.sph.integrator import PECIntegrator
        dt = 0.125 * self.h / co
        kw = dict(tf=2.5, output_at_times=[0.4, 0.6, 0.8, 1.0])
        if self.options.scheme == 'wcsph':
            self.scheme.configure(h0=self.h, hdx=self.hdx)
            self.scheme.configure_solver(
                integrator_cls=PECIntegrator,
                kernel=WendlandQuintic(dim=2), adaptive_timestep=True,
                n_damp=50, fixed_h=False, dt=dt, **kw)
        elif self.options.scheme == 'edac':
            self.scheme.configure(h=self.h)
            self.scheme.configure_solver(
                kernel=QuinticSpline(dim=2), dt=dt, **kw)
        elif self.options.scheme == 'iisph':
            self.scheme.configure_solver(
                kernel=QuinticSpline(dim=2), dt=10 * dt,
                adaptive_timestep=True, **kw)
        elif self.options.scheme == 'gtvf':
            self.scheme.configure(pref=ro * co * co / gamma, h0=self.h)
            self.scheme.configure_solver(dt=dt, **kw)

    def create_particles(self):
        dx = self.dx
        h = self.h
        m = dx * dx * ro
        xt, yt = get_2d_tank(dx=dx, length=container_width,
                             height=container_height, base_center=[2, 0],
                             num_layers=4)
        xf, yf = get_2d_block(dx=dx, length=fluid_column_width,
                              height=fluid_column_height,
                              center=[0.5, 1])
        xf += dx
        yf += dx
        fluid = get_particle_array(name='fluid', x=xf, y=yf, h=h, m=m,
                                   rho=ro)
        boundary = get_particle_array(name='boundary', x=xt, y=yt, h=h,
                                      m=m, rho=ro)
        self.scheme.setup_properties([fluid, boundary])
        print('dam_break_2d: %d fluid, %d boundary' %
              (fluid.get_number_of_particles(),
               boundary.get_number_of_particles()))
        return [fluid, boundary]

    def post_process(self, info_fname_or_dir='.'):
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        # toe position over time (front tracking, standard diagnostic)
        toe = []
        for f in files:
            data = load(f)
            fluid = data['arrays']['fluid']
            t = float(data['solver_data']['t'])
            toe.append((t, float(np.max(np.asarray(fluid.x)))))
        toe = np.array(toe)
        out = np.asarray(toe)
        np.savez(self.output_dir + '/results.npz', t=out[:, 0],
                 toe=out[:, 1])
        print('front at t=%.2f: x=%.3f' % tuple(out[-1]))
        return out


if __name__ == '__main__':
    app = DamBreak2D()
    app.run()
    app.post_process(app.info_filename)
