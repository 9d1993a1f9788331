"""Two-phase capillary wave: a dense liquid circle in a light gas,
driven by an initial vortical velocity perturbation, held together by
the Adami surface-tension formulation (parity case for
/root/reference/pysph/examples/surface_tension/capillary_wave.py)."""

import os

import numpy as np

from pysph_tpu.base.kernels import QuinticSpline
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.integrator import PECIntegrator
from pysph_tpu.sph.integrator_step import TransportVelocityStep
from pysph_tpu.sph.surface_tension import (
    ColorGradientAdami, ConstructStressMatrix,
    MomentumEquationPressureGradientAdami,
    MomentumEquationViscosityAdami, SolidWallPressureBCnoDensity,
    SurfaceForceAdami)
from pysph_tpu.sph.wc.basic import TaitEOS
from pysph_tpu.sph.wc.transport_velocity import (
    SolidWallNoSlipBC, SummationDensity)
from pysph_tpu.tools.geometry import (get_2d_block, get_2d_circle,
                                      remove_overlap_particles)

dim = 2
Lx = 1.0
Ly = 1.0

nu1 = 0.05
nu2 = 0.0005
sigma = 1.0
rho1 = 1.0
c0 = 20.0
rho2 = 0.001
p1 = c0 * c0 * rho1

nx = 60
dx = Lx / nx
volume = dx * dx
hdx = 1.0
h0 = hdx * dx
tf = 0.5
v0 = 10.0
r0 = 0.05

dt1 = 0.25 * np.sqrt(rho2 * h0 ** 3 / (2.0 * np.pi * sigma))
dt2 = 0.25 * h0 / (c0 + v0)
dt3 = 0.125 * rho2 * h0 * h0 / nu2
dt = 0.9 * min(dt1, dt2, dt3)

ADDITIONAL_PROPS = [
    'V', 'color', 'scolor', 'cx', 'cy', 'cz', 'cx2', 'cy2', 'cz2',
    'nx', 'ny', 'nz', 'ddelta', 'uhat', 'vhat', 'what', 'auhat',
    'avhat', 'awhat', 'ax', 'ay', 'az', 'wij', 'vmag2', 'N',
    'wij_sum', 'rho0', 'u0', 'v0', 'w0', 'x0', 'y0', 'z0', 'kappa',
    'arho', 'nu', 'wg', 'ug', 'vg', 'pi00', 'pi01', 'pi02', 'pi10',
    'pi11', 'pi12', 'pi20', 'pi21', 'pi22']


def _perturbation(x, y, h):
    R = np.sqrt(x * x + y * y + 1e-4 * h * h)
    f = np.exp(-R / r0)
    u = v0 * x * (1.0 - y * y / (r0 * R)) * f / r0
    v = -v0 * y * (1.0 - x * x / (r0 * R)) * f / r0
    return u, v


class MultiPhase(Application):
    def create_particles(self):
        fluid_x, fluid_y = get_2d_block(
            dx=dx, length=Lx, height=Ly, center=np.array([0., 0.]))
        circle_x, circle_y = get_2d_circle(
            dx=dx, r=0.2, center=np.array([0.0, 0.0]))
        wall_x, wall_y = get_2d_block(
            dx=dx, length=Lx + 6 * dx, height=Ly + 6 * dx,
            center=np.array([0., 0.]))
        gas = get_particle_array(
            name='gas', x=fluid_x, y=fluid_y, h=h0,
            m=rho2 * volume, rho=rho2, cs=c0,
            additional_props=ADDITIONAL_PROPS)
        gas.nu[:] = nu2
        gas.color[:] = 0.0
        liquid = get_particle_array(
            name='liquid', x=circle_x, y=circle_y, h=h0,
            m=rho1 * volume, rho=rho1, cs=c0,
            additional_props=ADDITIONAL_PROPS)
        liquid.nu[:] = nu1
        liquid.color[:] = 1.0
        wall = get_particle_array(
            name='wall', x=wall_x, y=wall_y, h=h0, m=rho2 * volume,
            rho=rho2, cs=c0, additional_props=ADDITIONAL_PROPS)
        wall.color[:] = 0.0
        remove_overlap_particles(wall, liquid, dx_solid=dx, dim=2)
        remove_overlap_particles(wall, gas, dx_solid=dx, dim=2)
        remove_overlap_particles(gas, liquid, dx_solid=dx, dim=2)
        out = ['V', 'color', 'cx', 'cy', 'nx', 'ny', 'ddelta',
               'kappa', 'N', 'scolor', 'p']
        for pa in (gas, liquid, wall):
            pa.add_output_arrays(out)
        u, v = _perturbation(np.asarray(gas.x), np.asarray(gas.y),
                             np.asarray(gas.h))
        gas.u[:], gas.v[:] = u, v
        u, v = _perturbation(np.asarray(liquid.x),
                             np.asarray(liquid.y),
                             np.asarray(liquid.h))
        liquid.u[:], liquid.v[:] = u, v
        return [liquid, gas, wall]

    def create_solver(self):
        kernel = QuinticSpline(dim=2)
        integrator = PECIntegrator(liquid=TransportVelocityStep(),
                                   gas=TransportVelocityStep())
        return Solver(kernel=kernel, dim=dim, integrator=integrator,
                      dt=dt, tf=tf, adaptive_timestep=False)

    def create_equations(self):
        all_names = ['liquid', 'wall', 'gas']
        return [
            Group(equations=[
                SummationDensity(dest=n, sources=all_names)
                for n in all_names]),
            Group(equations=[
                TaitEOS(dest='liquid', sources=None, rho0=rho1,
                        c0=c0, gamma=1, p0=p1),
                TaitEOS(dest='gas', sources=None, rho0=rho2, c0=c0,
                        gamma=1, p0=p1),
                SolidWallPressureBCnoDensity(
                    dest='wall', sources=['liquid', 'gas']),
            ]),
            Group(equations=[
                ColorGradientAdami(dest='liquid', sources=all_names),
                ColorGradientAdami(dest='gas', sources=all_names),
            ]),
            Group(equations=[
                ConstructStressMatrix(dest='liquid', sources=None,
                                      sigma=sigma, d=2),
                ConstructStressMatrix(dest='gas', sources=None,
                                      sigma=sigma, d=2)]),
            Group(equations=[
                MomentumEquationPressureGradientAdami(
                    dest='liquid', sources=all_names),
                MomentumEquationPressureGradientAdami(
                    dest='gas', sources=all_names),
                MomentumEquationViscosityAdami(
                    dest='liquid', sources=['liquid', 'gas']),
                MomentumEquationViscosityAdami(
                    dest='gas', sources=['liquid', 'gas']),
                SurfaceForceAdami(dest='liquid', sources=all_names),
                SurfaceForceAdami(dest='gas', sources=all_names),
                SolidWallNoSlipBC(dest='liquid', sources=['wall'],
                                  nu=nu1),
                SolidWallNoSlipBC(dest='gas', sources=['wall'],
                                  nu=nu2),
            ]),
        ]

    def post_process(self):
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        t, centerx, centery = [], [], []
        for f in files:
            data = load(f)
            pa = data['arrays']['liquid']
            t.append(data['solver_data']['t'])
            x = np.asarray(pa.x)
            y = np.asarray(pa.y)
            sel = (x > 0) & (y > 0)
            centerx.append(x[sel].mean())
            centery.append(y[sel].mean())
        fname = os.path.join(self.output_dir, 'results.npz')
        np.savez(fname, t=t, centerx=centerx, centery=centery)


if __name__ == '__main__':
    app = MultiPhase()
    app.run()
    app.post_process()
