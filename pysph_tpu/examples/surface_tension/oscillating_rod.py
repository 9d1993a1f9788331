"""Oscillating liquid rod: a circular color patch deformed by an
initial vortical velocity field oscillates under surface tension; the
semi-major axis history is the quantitative output (parity case for
/root/reference/pysph/examples/surface_tension/oscillating_rod.py)."""

import os

import numpy as np

from pysph_tpu.base.kernels import QuinticSpline
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.integrator import PECIntegrator
from pysph_tpu.sph.integrator_step import TransportVelocityStep
from pysph_tpu.sph.surface_tension import get_surface_tension_equations
from pysph_tpu.tools.geometry import (get_2d_block,
                                      remove_overlap_particles)

dim = 2
Lx = 1.0
Ly = 1.0

nu = 0.05
sigma = 1.0
factor1 = 0.8
factor2 = 1 / factor1
rho0 = 1.0
gamma = 1.4

nx = 120
dx = Lx / nx
volume = dx * dx
tf = 0.5
r0 = 0.05
v0 = 10.0

ADDITIONAL_PROPS = [
    'V', 'color', 'scolor', 'cx', 'cy', 'cz', 'cx2', 'cy2', 'cz2',
    'nx', 'ny', 'nz', 'ddelta', 'uhat', 'vhat', 'what', 'auhat',
    'avhat', 'awhat', 'ax', 'ay', 'az', 'wij', 'vmag2', 'N',
    'wij_sum', 'rho0', 'u0', 'v0', 'w0', 'x0', 'y0', 'z0', 'kappa',
    'arho', 'nu', 'wg', 'ug', 'vg', 'pi00', 'pi01', 'pi02', 'pi10',
    'pi11', 'pi12', 'pi20', 'pi21', 'pi22', 'alpha']


def _dt(h0, c0):
    dt1 = 0.25 * np.sqrt(rho0 * h0 ** 3 / (2.0 * np.pi * sigma))
    dt2 = 0.25 * h0 / (c0 + v0)
    dt3 = 0.125 * rho0 * h0 * h0 / nu
    return 0.9 * min(dt1, dt2, dt3)


class MultiPhase(Application):
    def add_user_options(self, group):
        choices = ['morris', 'tvf', 'adami_stress', 'adami',
                   'shadloo']
        group.add_argument(
            '--scheme', action='store', dest='scheme',
            default='morris', choices=choices,
            help='Specify scheme to use among %s' % choices)

    def consume_user_options(self):
        # adami_stress runs at lower sound speed / tighter lattice
        if self.options.scheme == 'adami_stress':
            self.c0 = 10.0
            self.hdx = 1.0
        else:
            self.c0 = 20.0
            self.hdx = 1.5
        self.h0 = self.hdx * dx
        self.p0 = self.c0 ** 2 * rho0
        self.epsilon = 0.01 / self.h0
        self.dt = _dt(self.h0, self.c0)

    def create_particles(self):
        c0, h0 = self.c0, self.h0
        fluid_x, fluid_y = get_2d_block(
            dx=dx, length=Lx, height=Ly, center=np.array([0., 0.]))
        wall_x, wall_y = get_2d_block(
            dx=dx, length=Lx + 6 * dx, height=Ly + 6 * dx,
            center=np.array([0., 0.]))
        consts = {'max_ddelta': np.zeros(1, dtype=float)}
        fluid = get_particle_array(
            name='fluid', x=fluid_x, y=fluid_y, h=h0,
            m=rho0 * volume, rho=rho0, cs=c0,
            additional_props=ADDITIONAL_PROPS, constants=consts)
        r2 = np.asarray(fluid.x) ** 2 + np.asarray(fluid.y) ** 2
        fluid.color[:] = np.where(r2 < 0.04, 1.0, 0.0)
        fluid.alpha[:] = sigma
        wall = get_particle_array(
            name='wall', x=wall_x, y=wall_y, h=h0, m=rho0 * volume,
            rho=rho0, cs=c0, additional_props=ADDITIONAL_PROPS)
        wall.color[:] = 0.0
        remove_overlap_particles(wall, fluid, dx_solid=dx, dim=2)
        out = ['V', 'color', 'cx', 'cy', 'nx', 'ny', 'ddelta',
               'kappa', 'N', 'scolor', 'p']
        fluid.add_output_arrays(out)
        wall.add_output_arrays(out)
        x = np.asarray(fluid.x)
        y = np.asarray(fluid.y)
        h = np.asarray(fluid.h)
        R = np.sqrt(x * x + y * y + 1e-4 * h * h)
        f = np.exp(-R / r0) / r0
        fluid.u[:] = v0 * x * (1.0 - y * y / (r0 * R)) * f
        fluid.v[:] = -v0 * y * (1.0 - x * x / (r0 * R)) * f
        fluid.nu[:] = nu
        return [fluid, wall]

    def create_solver(self):
        kernel = QuinticSpline(dim=2)
        integrator = PECIntegrator(fluid=TransportVelocityStep())
        return Solver(kernel=kernel, dim=dim, integrator=integrator,
                      dt=self.dt, tf=tf, adaptive_timestep=False,
                      output_at_times=[0., 0.08, 0.16, 0.26])

    def create_equations(self):
        return get_surface_tension_equations(
            ['fluid'], ['wall'], self.options.scheme, rho0, self.p0,
            self.c0, 0, factor1, factor2, nu, sigma, 2, self.epsilon,
            gamma, real=True)

    def post_process(self):
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        amat, t = [], []
        centerx, centery, velx, vely = [], [], [], []
        for f in files:
            data = load(f)
            pa = data['arrays']['fluid']
            t.append(data['solver_data']['t'])
            x = np.asarray(pa.x)
            y = np.asarray(pa.y)
            u = np.asarray(pa.u)
            v = np.asarray(pa.v)
            color = np.asarray(pa.color)
            drop = color == 1
            amat.append(0.5 * (max(x[drop].max(), 0.0) -
                               min(x[drop].min(), 0.0)))
            q = drop & (x > 0) & (y > 0)
            centerx.append(x[q].mean())
            centery.append(y[q].mean())
            velx.append(u[q].mean())
            vely.append(v[q].mean())
        fname = os.path.join(self.output_dir, 'results.npz')
        np.savez(fname, t=t, semimajor=amat, centerx=centerx,
                 centery=centery, velx=velx, vely=vely)


if __name__ == '__main__':
    app = MultiPhase()
    app.run()
    app.post_process()
