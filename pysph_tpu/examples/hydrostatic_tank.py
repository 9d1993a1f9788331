"""Hydrostatic tank with three wall-boundary treatments (parity case
for /root/reference/pysph/examples/hydrostatic_tank.py, ~2 min serial
CPU there).  bc-type 1 = Adami solid-wall pressure BC, 2 = Monaghan-
Kajtar repulsive force, 3 = dummy particles with their own EOS."""

import numpy as np

from pysph_tpu.base.kernels import QuinticSpline
from pysph_tpu.base.utils import get_particle_array_wcsph as gpa
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.basic_equations import XSPHCorrection
from pysph_tpu.sph.boundary_equations import (
    MonaghanKajtarBoundaryForce)
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.integrator import PECIntegrator
from pysph_tpu.sph.integrator_step import WCSPHStep
from pysph_tpu.sph.wc.basic import TaitEOS
from pysph_tpu.sph.wc.transport_velocity import (
    ContinuityEquation, MomentumEquationArtificialViscosity,
    MomentumEquationPressureGradient, SolidWallPressureBC,
    VolumeFromMassDensity)

Lx = 2.0
Ly = 1.0
H = 0.9
gy = -1.0
Vmax = np.sqrt(abs(gy) * H)
c0 = 10 * Vmax
rho0 = 1000.0
p0 = c0 * c0 * rho0
gamma = 1.0
Re = 100
nu = Vmax * Ly / Re

nx = 100
dx = Lx / nx
ghost_extent = 5.5 * dx
hdx = 1.2
h0 = hdx * dx
dt_cfl = 0.25 * h0 / (c0 + Vmax)
dt_viscous = 0.125 * h0 ** 2 / nu
dt_force = 0.25 * np.sqrt(h0 / abs(gy))
tdamp = 1.0
tf = 2.0
dt = 0.75 * min(dt_cfl, dt_viscous, dt_force)
output_at_times = np.arange(0.25, 2.1, 0.25)


class HydrostaticTank(Application):
    def add_user_options(self, group):
        group.add_argument('--bc-type', action='store', type=int,
                           dest='bc_type', default=1,
                           help='Boundary treatment: one of 1, 2, 3.')

    def create_particles(self):
        _x = np.arange(-ghost_extent, Lx + ghost_extent, dx)
        _y = np.arange(-ghost_extent, Ly, dx)
        x, y = np.meshgrid(_x, _y)
        x, y = x.ravel(), y.ravel()

        inside = (x > 0.0) & (x < Lx) & (y > 0.0) & (y < H)
        above = (y > H) & (x > 0) & (x < Lx)
        fluid = gpa(name='fluid', x=x[inside], y=y[inside])
        keep = ~inside & ~above
        solid = gpa(name='solid', x=x[keep], y=y[keep])
        print('Hydrostatic tank :: nfluid = %d, nsolid = %d, '
              'dt = %g' % (fluid.get_number_of_particles(),
                           solid.get_number_of_particles(), dt))

        fluid.add_property('V')
        solid.add_property('V')
        solid.add_property('wij')
        for name in ('auhat', 'avhat', 'awhat'):
            fluid.add_property(name)
        volume = dx * dx
        for pa in (fluid, solid):
            pa.rho[:] = rho0
            pa.rho0[:] = rho0
            pa.V[:] = 1.0 / volume
            pa.m[:] = volume * rho0
            pa.h[:] = hdx * dx
        return [fluid, solid]

    def create_solver(self):
        kernel = QuinticSpline(dim=2)
        integrator = PECIntegrator(fluid=WCSPHStep())
        return Solver(kernel=kernel, dim=2, integrator=integrator,
                      tf=tf, dt=dt, output_at_times=output_at_times)

    def create_equations(self):
        bc = self.options.bc_type
        core = [
            MomentumEquationPressureGradient(
                dest='fluid', sources=['fluid', 'solid'], pb=0.0,
                gy=gy, tdamp=tdamp),
            MomentumEquationArtificialViscosity(
                dest='fluid', sources=['fluid', 'solid'], alpha=0.24,
                c0=c0),
            XSPHCorrection(dest='fluid', sources=['fluid'], eps=0.0),
        ]
        if bc == 1:
            return [
                Group(equations=[VolumeFromMassDensity(
                    dest='fluid', sources=None)]),
                Group(equations=[TaitEOS(
                    dest='fluid', sources=None, rho0=rho0, c0=c0,
                    gamma=gamma)]),
                Group(equations=[SolidWallPressureBC(
                    dest='solid', sources=['fluid'], b=1.0, gy=gy,
                    rho0=rho0, p0=p0)]),
                Group(equations=[ContinuityEquation(
                    dest='fluid', sources=['fluid', 'solid'])] + core),
            ]
        elif bc == 2:
            return [
                Group(equations=[VolumeFromMassDensity(
                    dest='fluid', sources=None)]),
                Group(equations=[TaitEOS(
                    dest='fluid', sources=None, rho0=rho0, c0=c0,
                    gamma=gamma)]),
                Group(equations=[
                    MonaghanKajtarBoundaryForce(
                        dest='fluid', sources=['solid'], K=0.02,
                        beta=1.0, h=hdx * dx),
                    ContinuityEquation(dest='fluid',
                                       sources=['fluid']),
                    MomentumEquationPressureGradient(
                        dest='fluid', sources=['fluid'], pb=0.0,
                        gy=gy, tdamp=tdamp),
                    MomentumEquationArtificialViscosity(
                        dest='fluid', sources=['fluid'], alpha=0.24,
                        c0=c0),
                    XSPHCorrection(dest='fluid', sources=['fluid'],
                                   eps=0.0),
                ]),
            ]
        else:
            return [
                Group(equations=[VolumeFromMassDensity(
                    dest='fluid', sources=None)]),
                Group(equations=[
                    TaitEOS(dest='fluid', sources=None, rho0=rho0,
                            c0=c0, gamma=gamma),
                    TaitEOS(dest='solid', sources=None, rho0=rho0,
                            c0=c0, gamma=gamma)]),
                Group(equations=[
                    ContinuityEquation(dest='fluid',
                                       sources=['fluid', 'solid']),
                    ContinuityEquation(dest='solid',
                                       sources=['fluid'])] + core),
            ]

    def post_process(self, info_fname_or_dir='.'):
        """Pressure at the tank bottom vs rho0*g*H."""
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        data = load(files[-1])
        fluid = data['arrays']['fluid']
        y = np.asarray(fluid.y)
        p = np.asarray(fluid.p)
        bottom = y < 3 * dx
        p_exact = rho0 * abs(gy) * H
        p_bottom = p[bottom].mean()
        print('bottom pressure %.1f vs hydrostatic %.1f (err %.2f%%)'
              % (p_bottom, p_exact,
                 100 * abs(p_bottom - p_exact) / p_exact))
        np.savez(self.output_dir + '/results.npz', y=y, p=p)
        return p_bottom, p_exact


if __name__ == '__main__':
    app = HydrostaticTank()
    app.run()
    app.post_process(app.info_filename)
