"""Two-phase Kelvin–Helmholtz instability with surface tension set by
the Richardson number (Shadloo & Yildiz 2011 configuration; parity
case for /root/reference/pysph/examples/surface_tension/khi_sy11.py).
"""

import numpy

from pysph_tpu.base.domain import DomainManager
from pysph_tpu.base.kernels import QuinticSpline
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.integrator import PECIntegrator
from pysph_tpu.sph.integrator_step import TransportVelocityStep
from pysph_tpu.sph.surface_tension import get_surface_tension_equations

dim = 2
domain_width = 1.0
domain_height = 1.0

alpha = 0.0001
wavelength = 1.0
wavenumber = 2 * numpy.pi / wavelength
Ri = 0.1
rho1 = 1000.0
rho2 = 2000.0
U = 0.5
sigma = (Ri * (rho1 * rho2) * (2 * U) ** 2 /
         (wavenumber * (rho1 + rho2)))
psi0 = 0.03 * domain_height
gy = -9.81

nghost_layers = 5
dx = dy = 0.0125
dxb2 = 0.5 * dx
volume = dx * dx
hdx = 1.0
h0 = hdx * dx
epsilon = 0.01 / h0
rho0 = 1000.0
c0 = 10.0
p0 = c0 * c0 * rho0
nu = 0.125 * alpha * h0 * c0

tf = 3.0
dt1 = 0.25 * numpy.sqrt(rho0 * h0 ** 3 / (2.0 * numpy.pi * sigma))
dt2 = 0.25 * h0 / c0
dt3 = 0.125 * rho0 * h0 * h0 / nu
dt = 0.9 * min(dt1, dt2, dt3)

factor1 = 0.8
factor2 = 1 / factor1

ADDITIONAL_PROPS = [
    'V', 'pi00', 'pi01', 'pi02', 'pi10', 'pi11', 'pi12', 'pi20',
    'pi21', 'pi22', 'color', 'scolor', 'cx', 'cy', 'cz', 'cx2',
    'cy2', 'cz2', 'nx', 'ny', 'nz', 'ddelta', 'kappa', 'nu',
    'alpha', 'uf', 'vf', 'wf', 'uhat', 'vhat', 'what', 'auhat',
    'avhat', 'awhat', 'ax', 'ay', 'az', 'wij', 'vmag2', 'N',
    'wij_sum', 'wg', 'ug', 'vg']


class SquareDroplet(Application):
    def create_particles(self):
        ghost_extent = (nghost_layers + 0.5) * dx
        x, y = numpy.mgrid[
            dxb2:domain_width:dx,
            -ghost_extent:domain_height + ghost_extent:dy]
        x = x.ravel()
        y = y.ravel()
        fluid = get_particle_array(
            name='fluid', x=x, y=y, h=h0, m=volume * rho0, rho=rho0,
            cs=c0, p=p0, additional_props=ADDITIONAL_PROPS)
        fluid.u[:] = -U
        fluid.N[:] = 0.0
        fluid.nu[:] = nu
        fluid.alpha[:] = sigma
        xa = numpy.asarray(fluid.x)
        ya = numpy.asarray(fluid.y)
        ang = 2 * numpy.pi * xa / domain_width
        upper = ya >= (domain_height / 2 +
                       psi0 * domain_height * numpy.sin(ang))
        fluid.u[:] = numpy.where(upper, U, -U)
        fluid.color[:] = numpy.where(upper, 1.0, 0.0)
        fluid.rho[:] = numpy.where(upper, rho2, rho0)

        # top + bottom ghost bands become the wall array
        indices = numpy.where(numpy.asarray(fluid.y) >
                              domain_height)[0]
        wall = fluid.extract_particles(indices)
        fluid.remove_particles(indices)
        indices = numpy.where(numpy.asarray(fluid.y) < 0)[0]
        bottom = fluid.extract_particles(indices)
        fluid.remove_particles(indices)
        wall.append_parray(bottom)
        wall.set_name('wall')
        fluid.V[:] = 1.0 / volume
        wall.V[:] = 1.0 / volume
        wall.color[:] = numpy.where(numpy.asarray(wall.y) > 0.5,
                                    1.0, 0.0)
        out = ['V', 'color', 'cx', 'cy', 'nx', 'ny', 'ddelta', 'p',
               'rho', 'au', 'av']
        fluid.add_output_arrays(out)
        wall.add_output_arrays(out)
        print("2D KHI with %d fluid particles and %d wall particles"
              % (fluid.get_number_of_particles(),
                 wall.get_number_of_particles()))
        return [fluid, wall]

    def create_domain(self):
        return DomainManager(
            xmin=0, xmax=domain_width, ymin=0, ymax=domain_height,
            periodic_in_x=True, periodic_in_y=False, n_layers=5.0)

    def create_solver(self):
        kernel = QuinticSpline(dim=2)
        integrator = PECIntegrator(fluid=TransportVelocityStep())
        return Solver(kernel=kernel, dim=dim, integrator=integrator,
                      dt=dt, tf=tf, adaptive_timestep=False)

    def add_user_options(self, group):
        choices = ['morris', 'tvf', 'adami_stress', 'adami',
                   'shadloo']
        group.add_argument(
            '--scheme', action='store', dest='scheme',
            default='morris', choices=choices,
            help='Specify scheme to use among %s' % choices)

    def create_equations(self):
        return get_surface_tension_equations(
            ['fluid'], ['wall'], self.options.scheme, rho0, p0, c0,
            0, factor1, factor2, nu, sigma, 2, epsilon, 1,
            real=False)


if __name__ == '__main__':
    app = SquareDroplet()
    app.run()
