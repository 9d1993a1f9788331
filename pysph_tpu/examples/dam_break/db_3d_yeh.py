"""Dam break flow against a tall structure (Yeh & Petroff).

Parity case for /root/reference/pysph/examples/dam_break/db_3d_yeh.py:
delta-SPH WCSPH over the Yeh & Petroff tank with a tall obstacle and
a thin wet-bed sheet; a velocity probe is compared against the
experiment (Raad & Bidoae, JCP 203 (2005), DOI
10.1016/j.jcp.2004.09.013).
"""

import os

import numpy as np

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.examples.db_geometry import DamBreak3DGeometry
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.integrator import EPECIntegrator
from pysph_tpu.sph.scheme import WCSPHScheme
from pysph_tpu.tools.geometry import remove_overlap_particles

H = 0.3
RO = 1000.0
GAMMA = 7.0
ALPHA, BETA = 0.02, 0.0
HDX = 1.32
C0 = 16.0 * np.sqrt(9.81 * H)
TF = 1.4


class DamBreak3DYeh(Application):
    def add_user_options(self, group):
        group.add_argument('--dx', action='store', type=float,
                           dest='dx', default=H / 25,
                           help='Particle spacing.')
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=HDX,
                           help='h = hdx * dx.')

    def consume_user_options(self):
        self.dx = self.options.dx
        self.hdx = self.options.hdx
        self.h0 = self.hdx * self.dx
        self.geom = DamBreak3DGeometry(
            container_height=0.4, container_width=0.61,
            container_length=1.6, fluid_column_height=0.3,
            fluid_column_width=0.61, fluid_column_length=0.4,
            obstacle_center_x=0.96, obstacle_center_y=0,
            obstacle_length=0.12, obstacle_height=0.75,
            obstacle_width=0.12, nboundary_layers=2,
            with_obstacle=True, dx=self.dx, hdx=self.hdx, rho0=RO)

    def create_scheme(self):
        return WCSPHScheme(
            ['fluid'], ['boundary', 'obstacle'], dim=3, rho0=RO,
            c0=C0, h0=HDX * H / 25, hdx=HDX, gz=-9.81, alpha=ALPHA,
            beta=BETA, gamma=GAMMA, hg_correction=True,
            delta_sph=True, delta=0.1)

    def configure_scheme(self):
        h0 = self.dx * self.hdx
        self.scheme.configure(h0=h0, hdx=self.hdx)
        self.scheme.configure_solver(
            kernel=CubicSpline(dim=3),
            integrator_cls=EPECIntegrator, tf=TF,
            dt=0.125 * h0 / C0, adaptive_timestep=True)

    def create_particles(self):
        dx = self.dx
        fluid, boundary, obstacle = self.geom.create_particles()

        # thin 1 cm sheet of water wetting the bed downstream
        xs, ys, zs = np.mgrid[0.4:1.6:dx, -0.31:0.31:dx,
                              dx:dx + 0.01:dx]
        sheet = get_particle_array(
            name='sheet', x=xs.ravel(), y=ys.ravel(), z=zs.ravel(),
            h=self.h0, rho=RO, m=RO * dx ** 3)
        remove_overlap_particles(sheet, obstacle, dx_solid=dx)
        remove_overlap_particles(sheet, boundary, dx_solid=dx)
        remove_overlap_particles(sheet, fluid, dx_solid=dx)
        fluid.append_parray(sheet)

        particles = [fluid, boundary, obstacle]
        self.scheme.setup_properties(particles)
        return particles

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

        exp_vt, exp_v, exp_ft, exp_f = dbd.get_yeh_petroff_data()
        t, u = [], []
        interp = None
        for sd, fluid in iter_output(self.output_files, 'fluid'):
            t.append(sd['t'])
            if interp is None:
                interp = Interpolator([fluid], x=[0.814], y=[0.0],
                                      z=[0.026], method='shepard')
            else:
                interp.update_particle_arrays([fluid])
            u.append(interp.interpolate('u'))

        t, u = np.asarray(t), np.asarray(u)
        np.savez(os.path.join(self.output_dir, 'results.npz'),
                 t=t, u=u)
        plt.plot(t - 0.238, u, label='Computed')
        plt.scatter(exp_vt, exp_v, marker='^', color=(0, 0, 0),
                    label='Experiment, Yeh and Petroff')
        plt.legend()
        plt.ylabel('Horizontal Velocity (m/s)')
        plt.xlabel('Time (s)')
        left, _right = plt.xlim()
        plt.xlim(left, 1.4)
        plt.savefig(os.path.join(self.output_dir, 'v_vs_t.png'))
        plt.close()


if __name__ == '__main__':
    app = DamBreak3DYeh()
    app.run()
    app.post_process(app.info_filename)
