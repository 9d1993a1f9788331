"""Interface instability: a color band in a periodic box seeded with
a uniform kinetic-energy perturbation; the kinetic-energy decay
measures how well the surface-tension formulation preserves a flat
interface (parity case for
/root/reference/pysph/examples/surface_tension/interface_instability.py).
"""

import os

import numpy as np

from pysph_tpu.base.domain import DomainManager
from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.integrator import PECIntegrator
from pysph_tpu.sph.integrator_step import TransportVelocityStep
from pysph_tpu.sph.surface_tension import get_surface_tension_equations
from pysph_tpu.tools.geometry import get_2d_block

dim = 2
Lx = 0.5
Ly = 1.0
factor1 = 0.8
factor2 = 1.0 / factor1
nu = 0.0
sigma = 1.0
rho0 = 1.0
c0 = 20.0
gamma = 1.4
p0 = c0 ** 2 * rho0

nx = 50
dx = Lx / nx
volume = dx * dx
hdx = 1.5
h0 = hdx * dx
tf = 0.5
epsilon = 0.01 / h0

KE = (10 ** (-6.6) * p0 * p0 * gamma /
      (c0 * c0 * rho0 * rho0 * nx * nx * (gamma - 1)))
Vmax = np.sqrt(2 * KE / (rho0 * dx * dx))
dt1 = 0.25 * np.sqrt(rho0 * h0 ** 3 / (2.0 * np.pi * sigma))
dt2 = 0.25 * h0 / (c0 + Vmax)
dt = 0.9 * min(dt1, dt2)

ADDITIONAL_PROPS = [
    'V', 'color', 'scolor', 'cx', 'cy', 'cz', 'cx2', 'cy2', 'cz2',
    'nx', 'ny', 'nz', 'ddelta', 'uhat', 'vhat', 'what', 'auhat',
    'avhat', 'awhat', 'ax', 'ay', 'az', 'wij', 'vmag2', 'N',
    'wij_sum', 'rho0', 'u0', 'v0', 'w0', 'x0', 'y0', 'z0', 'kappa',
    'arho', 'nu', 'pi00', 'pi01', 'pi02', 'pi10', 'pi11', 'pi12',
    'pi20', 'pi21', 'pi22']


class MultiPhase(Application):
    def add_user_options(self, group):
        choices = ['morris', 'tvf', 'adami_stress', 'adami',
                   'shadloo']
        group.add_argument(
            '--scheme', action='store', dest='scheme',
            default='morris', choices=choices,
            help='Specify scheme to use among %s' % choices)

    def create_particles(self):
        fluid_x, fluid_y = get_2d_block(
            dx=dx, length=Lx - dx, height=Ly - dx,
            center=np.array([0., 0.5 * Ly]))
        fluid = get_particle_array(
            name='fluid', x=fluid_x, y=fluid_y, h=h0,
            m=rho0 * volume, rho=rho0, cs=c0,
            additional_props=ADDITIONAL_PROPS)
        y = np.asarray(fluid.y)
        fluid.color[:] = np.where((y > 0.25) & (y < 0.75), 1.0, 0.0)
        fluid.V[:] = 1.0 / volume
        fluid.add_output_arrays(['V', 'color', 'cx', 'cy', 'nx', 'ny',
                                 'ddelta', 'kappa', 'N', 'scolor',
                                 'p'])
        vel = np.sqrt(2 * KE / np.asarray(fluid.m))
        fluid.u[:] = vel
        fluid.v[:] = vel
        fluid.nu[:] = 0.0
        return [fluid]

    def create_domain(self):
        return DomainManager(
            xmin=-0.5 * Lx, xmax=0.5 * Lx, ymin=0.0, ymax=Ly,
            periodic_in_x=True, periodic_in_y=True, n_layers=6)

    def create_solver(self):
        kernel = CubicSpline(dim=2)
        integrator = PECIntegrator(fluid=TransportVelocityStep())
        return Solver(kernel=kernel, dim=dim, integrator=integrator,
                      dt=dt, tf=tf, adaptive_timestep=False)

    def create_equations(self):
        return get_surface_tension_equations(
            ['fluid'], [], self.options.scheme, rho0, p0, c0, 0,
            factor1, factor2, nu, sigma, 2, epsilon, gamma,
            real=False)

    def post_process(self):
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        ke, t = [], []
        for f in files:
            data = load(f)
            pa = data['arrays']['fluid']
            t.append(data['solver_data']['t'])
            m = np.asarray(pa.m)
            u = np.asarray(pa.u)
            v = np.asarray(pa.v)
            ke.append(np.log10(
                np.sum(0.5 * m * (u ** 2 + v ** 2)) / len(m)))
        fname = os.path.join(self.output_dir, 'results.npz')
        np.savez(fname, t=t, ke=ke)
        return t, ke


if __name__ == '__main__':
    app = MultiPhase()
    app.run()
    app.post_process()
