"""Equilibrium of a liquid rod (2D circle) under surface tension in a
fully periodic box: the Young–Laplace pressure jump dp = sigma/R
across the interface is the quantitative check (parity case for
/root/reference/pysph/examples/surface_tension/equilibrium_rod.py;
all five surface-tension formulations selectable)."""

import os

import numpy as np

from pysph_tpu.base.domain import DomainManager
from pysph_tpu.base.kernels import QuinticSpline
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.integrator import PECIntegrator
from pysph_tpu.sph.integrator_step import TransportVelocityStep
from pysph_tpu.sph.surface_tension import get_surface_tension_equations

dim = 2
Lx = 1.0
Ly = 1.0

nu = 0.05
sigma = 1.0
factor1 = 0.8
factor2 = 1 / factor1
rho0 = 1.0
c0 = 20.0
gamma = 1.4
tf = 10.0
p0 = c0 ** 2 * rho0

nx = 50
dx = Lx / nx
volume = dx * dx
hdx = 1.5
h0 = hdx * dx
epsilon = 0.01 / h0

dt1 = 0.25 * np.sqrt(rho0 * h0 ** 3 / (2.0 * np.pi * sigma))
dt2 = 0.25 * h0 / c0
dt3 = 0.125 * rho0 * h0 * h0 / nu
dt = 0.9 * min(dt1, dt2, dt3)

ADDITIONAL_PROPS = [
    'V', 'color', 'scolor', 'cx', 'cy', 'cz', 'cx2', 'cy2', 'cz2',
    'nx', 'ny', 'nz', 'ddelta', 'uhat', 'vhat', 'what', 'auhat',
    'avhat', 'awhat', 'ax', 'ay', 'az', 'wij', 'vmag2', 'N',
    'wij_sum', 'rho0', 'u0', 'v0', 'w0', 'x0', 'y0', 'z0', 'kappa',
    'arho', 'nu', 'pi00', 'pi01', 'pi02', 'pi10', 'pi11', 'pi12',
    'pi20', 'pi21', 'pi22', 'alpha']


class MultiPhase(Application):
    def add_user_options(self, group):
        choices = ['morris', 'tvf', 'adami_stress', 'adami',
                   'shadloo']
        group.add_argument(
            '--scheme', action='store', dest='scheme',
            default='morris', choices=choices,
            help='Specify scheme to use among %s' % choices)

    def _lattice(self):
        from pysph_tpu.tools.geometry import get_2d_block
        return get_2d_block(dx=dx, length=Lx - dx, height=Ly - dx,
                            center=np.array([0., 0.]))

    def _particle_mass(self):
        return rho0 * volume

    def create_particles(self):
        fluid_x, fluid_y = self._lattice()
        fluid = get_particle_array(
            name='fluid', x=fluid_x, y=fluid_y, h=h0,
            m=self._particle_mass(), rho=rho0, cs=c0,
            additional_props=ADDITIONAL_PROPS)
        r2 = np.asarray(fluid.x) ** 2 + np.asarray(fluid.y) ** 2
        fluid.color[:] = np.where(r2 < 0.0625, 1.0, 0.0)
        fluid.alpha[:] = sigma
        fluid.V[:] = 1.0 / volume
        fluid.nu[:] = nu
        fluid.add_output_arrays(['V', 'color', 'cx', 'cy', 'nx', 'ny',
                                 'ddelta', 'kappa', 'N', 'scolor',
                                 'p'])
        return [fluid]

    def create_domain(self):
        return DomainManager(
            xmin=-0.5 * Lx, xmax=0.5 * Lx, ymin=-0.5 * Ly,
            ymax=0.5 * Ly, periodic_in_x=True, periodic_in_y=True)

    def create_solver(self):
        kernel = QuinticSpline(dim=2)
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
        dp, t = [], []
        for f in files:
            data = load(f)
            pa = data['arrays']['fluid']
            t.append(data['solver_data']['t'])
            x = np.asarray(pa.x)
            y = np.asarray(pa.y)
            N = np.asarray(pa.N)
            p = np.asarray(pa.p)
            r2 = x * x + y * y
            bulk = N < 1
            inner = bulk & (r2 < 0.0625)
            outer = bulk & ~(r2 < 0.0625)
            dp.append(p[inner].mean() - p[outer].mean())
        fname = os.path.join(self.output_dir, 'results.npz')
        np.savez(fname, t=t, dp=dp)
        return t, dp


if __name__ == '__main__':
    app = MultiPhase()
    app.run()
    app.post_process()
