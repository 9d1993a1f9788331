"""Three-dimensional dam break with wall pressure probes.

Parity case for
/root/reference/pysph/examples/dam_break/dam_break_3d_lobovsky.py:
geometry and probe locations of Lobovsky et al., J. Fluids Struct. 48
(2014) 407-434 (DOI 10.1016/j.jfluidstructs.2014.03.009).
"""

import os

import numpy as np

from pysph_tpu.base.kernels import WendlandQuintic
from pysph_tpu.examples.db_geometry import DamBreak3DGeometry
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.integrator import EPECIntegrator
from pysph_tpu.sph.scheme import WCSPHScheme

H = 1.0
RO = 1000.0
GAMMA = 7.0
ALPHA, BETA = 0.25, 0.0
HDX = 1.3
C0 = 10.0 * np.sqrt(2.0 * 9.81 * 0.55)
TF = 2.5


class DamBreak3DLobovsky(Application):
    def add_user_options(self, group):
        group.add_argument('--dx', action='store', type=float,
                           dest='dx', default=H / 30.0,
                           help='Particle spacing.')
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=HDX,
                           help='h = hdx * dx.')

    def consume_user_options(self):
        self.dx = self.options.dx
        self.hdx = self.options.hdx
        self.geom = DamBreak3DGeometry(
            container_height=1.5 * H, container_width=H / 2.0,
            container_length=161 * H / 30,
            fluid_column_height=H, fluid_column_width=H / 2.0,
            fluid_column_length=2.0 * H, dx=self.dx,
            nboundary_layers=1, hdx=self.hdx, rho0=RO,
            with_obstacle=False)
        self.co = 10.0 * self.geom.get_max_speed(g=9.81)

    def create_scheme(self):
        return WCSPHScheme(
            ['fluid'], ['boundary'], dim=3, rho0=RO, c0=C0,
            h0=HDX * H / 30.0, hdx=HDX, gz=-9.81, alpha=ALPHA,
            beta=BETA, gamma=GAMMA, hg_correction=True,
            tensile_correction=False)

    def configure_scheme(self):
        h0 = self.dx * self.hdx
        self.scheme.configure(h0=h0, hdx=self.hdx)
        dt = 0.25 * h0 / (1.1 * self.co)
        self.scheme.configure_solver(
            kernel=WendlandQuintic(dim=3),
            integrator_cls=EPECIntegrator, tf=TF, dt=dt,
            adaptive_timestep=True, n_damp=50,
            output_at_times=[0.4, 0.6, 1.0])

    def create_particles(self):
        return self.geom.create_particles()

    def post_process(self, info_fname):
        self.read_info(info_fname)
        if len(self.output_files) == 0:
            return
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        from pysph_tpu.examples import db_exp_data as dbd
        from pysph_tpu.solver.utils import iter_output
        from pysph_tpu.tools.interpolator import Interpolator

        Hc = self.geom.fluid_column_height
        factor_y = 1 / (RO * 9.81 * Hc)
        factor_x = np.sqrt(9.81 / Hc)
        t1, t2, t3, data_p1, data_p2, data_p3 = \
            dbd.get_lobovsky_data()

        p_x = np.repeat(self.geom.container_length, 3)
        p_y = np.repeat(0, 3)
        p_z = np.array([Hc / 100, Hc / 10, 8 * Hc / 30])

        t, p0 = [], []
        interp = None
        for sd, fluid, boundary in iter_output(
                self.output_files, 'fluid', 'boundary'):
            t.append(sd['t'] * factor_x)
            if interp is None:
                interp = Interpolator([fluid, boundary], x=p_x,
                                      y=p_y, z=p_z, method='shepard')
            else:
                interp.update_particle_arrays([fluid, boundary])
            p0.append(interp.interpolate('p') * factor_y)

        t, p0 = np.asarray(t), np.asarray(p0)
        np.savez(os.path.join(self.output_dir, 'results.npz'),
                 t=t, p0=p0)

        idx = t <= 7
        for i, (te, pe) in enumerate(
                ((t1, data_p1), (t2, data_p2), (t3, data_p3))):
            fig = plt.figure()
            plt.plot(t[idx], p0[idx, i], label='p%d computed' %
                     (i + 1), figure=fig)
            plt.plot(te, pe, label='Lobovsky et al.', figure=fig)
            plt.legend()
            plt.ylabel(r'$\frac{P}{\rho gH}$')
            plt.xlabel(r'$t \sqrt{\frac{g}{H}}$')
            plt.title('P%d' % (i + 1))
            plt.savefig(os.path.join(self.output_dir,
                                     'p%d_vs_t.png' % (i + 1)))
            plt.close(fig)


if __name__ == '__main__':
    app = DamBreak3DLobovsky()
    app.run()
    app.post_process(app.info_filename)
