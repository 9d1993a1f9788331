"""Demonstrate the inlet and outlet feature in 2D (parity case for
/root/reference/pysph/examples/trivial_inlet_outlet.py).

An inlet block in (-1, 0) x (0, 1) streams particles rightward at a
prescribed speed; fluid particles entering (1, 2) x (0, 1) become
outlet particles and are removed as they leave."""

import numpy as np

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.basic_equations import SummationDensity
from pysph_tpu.sph.bc.donothing.simple_inlet_outlet import (
    SimpleInletOutlet)
from pysph_tpu.sph.bc.inlet_outlet_manager import (InletInfo,
                                                   InletStep,
                                                   OutletInfo,
                                                   OutletStep)
from pysph_tpu.sph.integrator import PECIntegrator


class InletOutletApp(Application):
    def add_user_options(self, group):
        group.add_argument(
            '--speed', action='store', type=float, dest='speed',
            default=0.25, help='Speed of inlet particles.')

    def create_particles(self):
        # fluid starts empty: the inlet generates it
        fluid = get_particle_array(name='fluid')
        dx = 0.1
        x, y = np.mgrid[-1 + dx / 2:0:dx, 0:1:dx]
        m = np.ones_like(x) * dx * dx
        h = np.ones_like(x) * dx * 1.5
        rho = np.ones_like(x)
        u = np.ones_like(x) * self.options.speed
        inlet = get_particle_array(name='inlet', x=x, y=y, m=m, h=h,
                                   u=u, rho=rho)
        outlet = get_particle_array(name='outlet', x=x + 2.0, y=y,
                                    m=m, h=h, u=u, rho=rho)
        particles = [inlet, fluid, outlet]
        for p in ('ioid', 'disp', 'x0'):
            for pa in particles:
                pa.add_property(p)
        return particles

    def _create_inlet_outlet_manager(self):
        from pysph_tpu.sph.bc.donothing.inlet import Inlet
        from pysph_tpu.sph.bc.donothing.outlet import Outlet
        props_to_copy = ['x', 'y', 'z', 'u', 'v', 'w', 'm', 'h',
                         'rho', 'p', 'ioid']
        inlet_info = InletInfo(
            pa_name='inlet', normal=[-1.0, 0.0, 0.0],
            refpoint=[0.0, 0.0, 0.0], has_ghost=False,
            update_cls=Inlet)
        outlet_info = OutletInfo(
            pa_name='outlet', normal=[1.0, 0.0, 0.0],
            refpoint=[1.0, 0.0, 0.0], update_cls=Outlet,
            props_to_copy=props_to_copy)
        return SimpleInletOutlet(
            fluid_arrays=['fluid'], inletinfo=[inlet_info],
            outletinfo=[outlet_info])

    def create_inlet_outlet(self, particle_arrays):
        return self.iom.get_inlet_outlet(particle_arrays)

    def create_equations(self):
        return [SummationDensity(
            dest='fluid', sources=['inlet', 'outlet', 'fluid'])]

    def create_solver(self):
        self.iom = self._create_inlet_outlet_manager()
        kernel = CubicSpline(dim=2)
        integrator = PECIntegrator(
            fluid=InletStep(), inlet=InletStep(),
            outlet=OutletStep())
        self.iom.active_stages = [2]
        self.iom.setup_iom(dim=2, kernel=kernel)
        self.iom.update_dx(dx=0.1)
        return Solver(kernel=kernel, dim=2, integrator=integrator,
                      dt=1e-2, tf=12, adaptive_timestep=False,
                      pfreq=20)


if __name__ == '__main__':
    app = InletOutletApp()
    app.run()
