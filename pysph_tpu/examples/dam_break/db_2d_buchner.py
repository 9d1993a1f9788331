"""Two-dimensional dam break over a dry bed, Buchner geometry.

Parity case for
/root/reference/pysph/examples/dam_break/db_2d_buchner.py: the
container/fluid-column proportions of Buchner (2002, Appendix II),
with the wall pressure probe compared against the experiment in
post-processing.
"""

import os

import numpy as np

from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.examples.dam_break_2d import DamBreak2D
from pysph_tpu.tools.geometry import get_2d_block, get_2d_tank

H = 1.0
fluid_column_width = 2.0 * H
container_height = 3.0 * H
container_width = 5.366 * H
g = 9.81
ro = 1000.0
co = 10.0 * np.sqrt(2 * g * H)


class DamBreak2DBuchner(DamBreak2D):
    def add_user_options(self, group):
        super(DamBreak2DBuchner, self).add_user_options(group)
        group.add_argument(
            '--interp-method', action='store', type=str,
            dest='interp_method', default='shepard',
            choices=['shepard', 'sph', 'order1'],
            help='Interpolation method for the pressure probe.')

    def consume_user_options(self):
        super(DamBreak2DBuchner, self).consume_user_options()
        self.interp_method = self.options.interp_method
        if self.options.scheme != 'iisph':
            self.co = co
            self.scheme.configure(c0=co)

    def create_particles(self):
        dx = self.dx
        h = self.h
        m = dx * dx * ro
        xt, yt = get_2d_tank(
            dx=dx, length=container_width, height=container_height,
            base_center=[container_width / 2, 0], num_layers=4)
        xf, yf = get_2d_block(
            dx=dx, length=fluid_column_width, height=H,
            center=[fluid_column_width / 2, H / 2])
        xf += dx
        yf += dx
        fluid = get_particle_array(name='fluid', x=xf, y=yf, h=h,
                                   m=m, rho=ro)
        boundary = get_particle_array(name='boundary', x=xt, y=yt,
                                      h=h, m=m, rho=ro)
        self.scheme.setup_properties([fluid, boundary])
        if self.options.scheme == 'iisph':
            fluid.x += dx / 4
        print('db_2d_buchner: %d fluid, %d boundary' %
              (fluid.get_number_of_particles(),
               boundary.get_number_of_particles()))
        return [fluid, boundary]

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

        factor_y = 1 / (ro * g * H)
        factor_x = np.sqrt(g / H)
        data_t, data_p0 = dbd.get_buchner_data()

        t, p0 = [], []
        interp = None
        for sd, fluid, boundary in iter_output(
                self.output_files, 'fluid', 'boundary'):
            t.append(sd['t'] * factor_x)
            if interp is None:
                interp = Interpolator(
                    [fluid, boundary], x=[container_width],
                    y=[H * 0.2], method=self.interp_method)
            else:
                interp.update_particle_arrays([fluid, boundary])
            p0.append(interp.interpolate('p') * factor_y)

        t, p0 = np.asarray(t), np.asarray(p0)
        np.savez(os.path.join(self.output_dir, 'results.npz'),
                 t=t, p0=p0)
        plt.plot(t, p0, label='Computed')
        plt.scatter(data_t, data_p0, color=(0, 0, 0),
                    label='Experiment (Buchner, 2002)')
        plt.legend()
        plt.ylabel(r'$\frac{P}{\rho gH}$')
        plt.xlabel(r'$t \sqrt{\frac{g}{H}}$')
        plt.savefig(os.path.join(self.output_dir, 'p_vs_t.png'))
        plt.close()


if __name__ == '__main__':
    app = DamBreak2DBuchner()
    app.run()
    app.post_process(app.info_filename)
