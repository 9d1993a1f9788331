"""Still water over a submerged step, 1D SWE-SPH — the flat surface
must survive the bottom discontinuity (Vacondio, Rogers & Stansby
2012; parity case for /root/reference/pysph/examples/shallow_water/
still_water_over_a_step_1d.py)."""

from numpy import arange, array, ones_like, sqrt, where, zeros_like

from pysph_tpu.base.utils import get_particle_array_swe as gpa_swe
from pysph_tpu.examples.shallow_water.still_water_over_a_hump_1d import (
    StillWaterOverHump)

rho_w = 1000.0
g = 9.81
dim = 1


class StillWaterOveraStep(StillWaterOverHump):
    def add_user_options(self, group):
        super(StillWaterOveraStep, self).add_user_options(group)
        group.add_argument('--step_loc', action='store', type=float,
                           dest='step_loc', default=0.5,
                           help='Location of the step (m)')
        group.add_argument('--step_height', action='store',
                           type=float, dest='step_hei', default=0.5,
                           help='Height of the step (m)')

    def consume_user_options(self):
        super(StillWaterOveraStep, self).consume_user_options()
        # the reference's defaults for this case
        if self.options.fluid_surf_hei == 0.4:
            self.fluid_surf_hei = 1.0
        if self.options.dx == 0.005:
            self.dx = 0.01
        self.step_loc = self.options.step_loc
        self.step_hei = self.options.step_hei

    def _make_bed(self):
        dx = self.dx
        dxb = 0.25 * dx
        xb = arange(-dx, self.le + dx + 1e-4, dxb)
        b = zeros_like(xb)
        b[where(xb > self.step_loc)] = self.step_hei
        bed = gpa_swe(name='bed', x=xb, V=ones_like(xb) * dxb, b=b,
                      h=ones_like(xb) * self.hdx * dxb)
        bed.add_property('m_mat', stride=9)
        return bed

    def _boundary_dw(self, x_cb):
        # downstream water column sits on the step: half the depth
        return array([self.fluid_surf_hei, self.fluid_surf_hei,
                      0.5 * self.fluid_surf_hei,
                      0.5 * self.fluid_surf_hei])


if __name__ == '__main__':
    app = StillWaterOveraStep()
    app.run()
    app.post_process(app.info_filename)
