"""Evolution of a circular patch of incompressible fluid, set up
with explicit equations, solver and integrator instead of a scheme
(parity case for
/root/reference/pysph/examples/elliptical_drop_no_scheme.py)."""

from numpy import mgrid, ones_like

from pysph_tpu.base.kernels import Gaussian
from pysph_tpu.base.utils import get_particle_array_wcsph
from pysph_tpu.examples.elliptical_drop import EllipticalDrop as EDScheme
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.basic_equations import (ContinuityEquation,
                                           XSPHCorrection)
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.integrator import EPECIntegrator
from pysph_tpu.sph.integrator_step import WCSPHStep
from pysph_tpu.sph.wc.basic import MomentumEquation, TaitEOS


class EllipticalDrop(EDScheme):
    def create_scheme(self):
        # equations/solver are built explicitly below
        return None

    def create_particles(self):
        dx = self.dx
        hdx = self.hdx
        ro = self.ro
        x, y = mgrid[-1.05:1.05 + 1e-4:dx, -1.05:1.05 + 1e-4:dx]
        condition = ~((x * x + y * y - 1.0) > 1e-10)
        x = x[condition].ravel()
        y = y[condition].ravel()

        m = ones_like(x) * dx * dx * ro
        h = ones_like(x) * hdx * dx
        rho = ones_like(x) * ro
        u = -100 * x
        v = 100 * y
        pa = get_particle_array_wcsph(x=x, y=y, m=m, rho=rho, h=h,
                                      u=u, v=v, name='fluid')
        print("Elliptical drop :: %d particles"
              % pa.get_number_of_particles())
        for name in ('arho', 'au', 'av', 'aw', 'ax', 'ay', 'az',
                     'rho0', 'u0', 'v0', 'w0', 'x0', 'y0', 'z0'):
            pa.add_property(name)
        pa.set_output_arrays(['x', 'y', 'u', 'v', 'rho', 'm', 'h',
                              'p', 'pid', 'tag', 'gid'])
        return [pa]

    def create_solver(self):
        print("Create our own solver.")
        kernel = Gaussian(dim=2)
        integrator = EPECIntegrator(fluid=WCSPHStep())
        return Solver(kernel=kernel, dim=2, integrator=integrator,
                      dt=5e-6, tf=0.0076, adaptive_timestep=True,
                      cfl=0.3, n_damp=50,
                      output_at_times=[0.0008, 0.0038])

    def create_equations(self):
        print("Create our own equations.")
        return [
            Group(equations=[
                TaitEOS(dest='fluid', sources=None, rho0=self.ro,
                        c0=self.co, gamma=7.0),
            ], real=False),
            Group(equations=[
                ContinuityEquation(dest='fluid', sources=['fluid']),
                MomentumEquation(dest='fluid', sources=['fluid'],
                                 alpha=self.alpha, beta=0.0,
                                 c0=self.co),
                XSPHCorrection(dest='fluid', sources=['fluid']),
            ]),
        ]


if __name__ == '__main__':
    app = EllipticalDrop()
    app.run()
    app.post_process(app.info_filename)
