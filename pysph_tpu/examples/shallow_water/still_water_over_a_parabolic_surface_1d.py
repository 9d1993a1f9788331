"""Still water in a 1D parabolic basin, SWE-SPH — the free surface
must stay flat with no boundary particles at all (Vacondio, Rogers &
Stansby 2012; parity case for
/root/reference/pysph/examples/shallow_water/
still_water_over_a_parabolic_surface_1d.py)."""

from numpy import arange, ones_like

from pysph_tpu.base.utils import get_particle_array_swe as gpa_swe
from pysph_tpu.examples.shallow_water.still_water_over_a_hump_1d import (
    StillWaterOverHump, compute_fluid_elevation,
    compute_initial_props)
from pysph_tpu.solver.solver import Solver

rho_w = 1000.0
g = 9.81
dim = 1


class StillWaterOverParabola(StillWaterOverHump):
    def consume_user_options(self):
        super(StillWaterOverParabola, self).consume_user_options()
        # the reference's defaults for this case
        if self.options.dx == 0.005:
            self.dx = 20.0
        if self.options.fluid_surf_hei == 0.4:
            self.fluid_surf_hei = 10.0

    def _make_bed(self):
        dx = self.dx
        l_bed = 8000.0
        xb = arange(0, l_bed + 1e-4, dx)
        bo = 10.0
        a = 3000.0
        b = bo * ((xb - 0.5 * l_bed) / a) ** 2
        bed = gpa_swe(name='bed', x=xb, V=ones_like(xb) * dx, b=b,
                      h=ones_like(xb) * self.hdx * dx)
        bed.add_property('m_mat', stride=9)
        return bed

    def create_particles(self):
        hdx, dx = self.hdx, self.dx
        bed = self._make_bed()
        x = arange(1000 + 2 * dx, 7000 - 2 * dx + 1e-4, dx)
        h = ones_like(x) * hdx * dx
        fluid = gpa_swe(x=x, h=h, h0=h.copy(), name='fluid')
        compute_fluid_elevation([fluid, bed])
        dw = self.fluid_surf_hei - fluid.b
        fluid.m = dw * rho_w * dx
        fluid.rho = dw * rho_w
        fluid.rho0 = dw * rho_w
        fluid.dw = dw
        compute_initial_props([fluid])
        return [fluid, bed]

    def create_solver(self):
        from pysph_tpu.base.kernels import CubicSpline
        from pysph_tpu.sph.swe.basic import SWEIntegrator, SWEStep
        kernel = CubicSpline(dim=1)
        integrator = SWEIntegrator(fluid=SWEStep())
        return Solver(kernel=kernel, dim=1, integrator=integrator,
                      cfl=0.3, adaptive_timestep=True, tf=10)

    def create_equations(self):
        eqns = super(StillWaterOverParabola, self).create_equations()
        # no boundary array in this case: strip it from the sources
        def _strip(group):
            for eq in group.equations:
                from pysph_tpu.sph.equation import Group
                if isinstance(eq, Group):
                    _strip(eq)
                elif getattr(eq, 'sources', None) and \
                        'boundary' in eq.sources:
                    eq.sources = [s for s in eq.sources
                                  if s != 'boundary']
        for g in eqns:
            _strip(g)
        return eqns


if __name__ == '__main__':
    app = StillWaterOverParabola()
    app.run()
    app.post_process(app.info_filename)
