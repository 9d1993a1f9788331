"""Deformation of a square droplet to a circle under surface tension
(parity case for
/root/reference/pysph/examples/surface_tension/square_droplet.py).

A square patch of color=1 fluid inside a periodic box of color=0
fluid relaxes toward a circle; exercises the surface-tension equation
assemblies ('morris', 'tvf', 'adami_stress', 'adami', 'shadloo')."""

import numpy as np

from pysph_tpu.base.domain import DomainManager
from pysph_tpu.base.kernels import QuinticSpline
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.integrator import PECIntegrator
from pysph_tpu.sph.integrator_step import (
    TransportVelocityStep, VelocityVerletSymplecticWCSPHStep)
from pysph_tpu.sph.surface_tension import (
    get_surface_tension_equations)

dim = 2
domain_width = 1.0
domain_height = 1.0
sigma = 1.0
factor1 = 0.8
factor2 = 1.0 / factor1

dx = 0.0125
volume = dx * dx
hdx = 1.3
h0 = hdx * dx
rho0 = 1.0
c0 = 20.0
p0 = c0 * c0 * rho0
nu = 0.2
epsilon = 0.01 / h0

tf = 1.0
dt_cfl = 0.25 * h0 / (1.1 * c0)
dt_viscous = 0.125 * h0 ** 2 / nu
dt = 0.9 * min(dt_cfl, dt_viscous)

EXTRA_PROPS = [
    'V', 'alpha', 'color', 'scolor', 'cx', 'cy', 'cz', 'cx2', 'cy2',
    'cz2', 'nx', 'ny', 'nz', 'ddelta', 'kappa', 'uhat', 'vhat',
    'what', 'auhat', 'avhat', 'awhat', 'ax', 'ay', 'az', 'wij',
    'vmag2', 'N', 'wij_sum', 'pi00', 'pi01', 'pi02', 'pi10', 'pi11',
    'pi12', 'pi20', 'pi21', 'pi22', 'nu']


class SquareDroplet(Application):
    def add_user_options(self, group):
        choices = ['morris', 'tvf', 'adami_stress', 'adami',
                   'shadloo']
        group.add_argument('--scheme', action='store', dest='scheme',
                           default='morris', choices=choices)

    def create_particles(self):
        x, y = np.mgrid[dx / 2:domain_width:dx,
                        dx / 2:domain_height:dx]
        x, y = x.ravel(), y.ravel()
        fluid = get_particle_array(
            name='fluid', x=x, y=y, h=np.full_like(x, h0),
            m=np.full_like(x, volume * rho0),
            rho=np.full_like(x, rho0), cs=np.full_like(x, c0),
            additional_props=EXTRA_PROPS)
        inner = ((x > 0.35) & (x < 0.65) & (y > 0.35) & (y < 0.65))
        fluid.color[:] = np.where(inner, 1.0, 0.0)
        fluid.V[:] = 1.0 / volume
        fluid.nu[:] = nu
        fluid.alpha[:] = sigma
        fluid.add_output_arrays(['V', 'color', 'cx', 'cy', 'nx',
                                 'ny', 'ddelta', 'kappa', 'N',
                                 'scolor', 'p'])
        print('Square droplet: %d particles'
              % fluid.get_number_of_particles())
        return [fluid]

    def create_domain(self):
        return DomainManager(
            xmin=0, xmax=domain_width, ymin=0, ymax=domain_height,
            periodic_in_x=True, periodic_in_y=True)

    def create_solver(self):
        kernel = QuinticSpline(dim=2)
        stepper = TransportVelocityStep()
        if self.options.scheme == 'shadloo':
            stepper = VelocityVerletSymplecticWCSPHStep()
        integrator = PECIntegrator(fluid=stepper)
        return Solver(kernel=kernel, dim=dim, integrator=integrator,
                      dt=dt, tf=tf, adaptive_timestep=False)

    def create_equations(self):
        return get_surface_tension_equations(
            ['fluid'], [], self.options.scheme, rho0, p0, c0, 0,
            factor1, factor2, nu, sigma, 2, epsilon, 1, real=False)


if __name__ == '__main__':
    app = SquareDroplet()
    app.run()
