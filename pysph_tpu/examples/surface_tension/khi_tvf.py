"""2D Kelvin–Helmholtz instability using TVF with the SY11 surface
tension formulation (parity case for
/root/reference/pysph/examples/surface_tension/khi_tvf.py)."""

import numpy

from pysph_tpu.base.domain import DomainManager
from pysph_tpu.base.kernels import WendlandQuintic
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.gas_dynamics.basic import ScaleSmoothingLength
from pysph_tpu.sph.integrator import PECIntegrator
from pysph_tpu.sph.integrator_step import TransportVelocityStep
from pysph_tpu.sph.surface_tension import (
    ColorGradientUsingNumberDensity,
    InterfaceCurvatureFromNumberDensity,
    ShadlooYildizSurfaceTensionForce, SmoothedColor)
from pysph_tpu.sph.wc.transport_velocity import (
    MomentumEquationArtificialStress,
    MomentumEquationPressureGradient, MomentumEquationViscosity,
    SetWallVelocity, SolidWallNoSlipBC, SolidWallPressureBC,
    StateEquation, SummationDensity)

dim = 2
domain_width = 1.0
domain_height = 1.0

gy = -9.81
alpha = 0.001
wavelength = 1.0
wavenumber = 2 * numpy.pi / wavelength
Ri = 0.05
rho0 = rho1 = 1000.0
rho2 = 1 * rho1
U = 0.5
sigma = (Ri * (rho1 * rho2) * (2 * U) ** 2 /
         (wavenumber * (rho1 + rho2)))
psi0 = 0.03 * domain_height

nghost_layers = 5
dx = dy = 0.01
dxb2 = 0.5 * dx
volume = dx * dx
hdx = 1.5
h0 = hdx * dx
c0 = 25.0
p0 = c0 * c0 * rho0
nu = 0.125 * alpha * h0 * c0

tf = 3.0
dt_cfl = 0.25 * h0 / (1.1 * c0)
dt_viscous = 0.125 * h0 ** 2 / nu
dt_force = 1.0
dt = 0.8 * min(dt_cfl, dt_viscous, dt_force)

ADDITIONAL_PROPS = [
    'V', 'color', 'scolor', 'cx', 'cy', 'cz', 'cx2', 'cy2', 'cz2',
    'nx', 'ny', 'nz', 'ddelta', 'kappa', 'uhat', 'vhat', 'what',
    'auhat', 'avhat', 'awhat', 'ax', 'ay', 'az', 'wij', 'vmag2',
    'N', 'wij_sum']


class KHITVF(Application):
    def create_particles(self):
        ghost_extent = (nghost_layers + 0.5) * dx
        x, y = numpy.mgrid[
            dxb2:domain_width:dx,
            -ghost_extent:domain_height + ghost_extent:dy]
        x = x.ravel()
        y = y.ravel()
        fluid = get_particle_array(
            name='fluid', x=x, y=y, h=h0, m=volume * rho0, rho=rho0,
            cs=c0, additional_props=ADDITIONAL_PROPS)
        xa = numpy.asarray(fluid.x)
        ya = numpy.asarray(fluid.y)
        ang = 2 * numpy.pi * xa / domain_width
        temp = (domain_height / 2 +
                psi0 * domain_height * numpy.sin(ang))
        upper = ya > temp
        fluid.u[:] = numpy.where(upper, U, -U)
        fluid.color[:] = numpy.where(upper, 1.0, 0.0)
        fluid.rho[:] = numpy.where(upper, rho1, rho2)
        fluid.m[:] = numpy.where(upper, volume * rho1,
                                 rho2 / rho1 * volume * rho2)

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
        fluid.add_output_arrays(['V', 'color', 'cx', 'cy', 'nx', 'ny',
                                 'ddelta', 'kappa', 'N', 'p', 'rho'])
        for name in ('uf', 'vf', 'wf', 'ug', 'vg', 'wg'):
            wall.add_property(name)
        print("2D KHI with %d fluid particles and %d wall particles"
              % (fluid.get_number_of_particles(),
                 wall.get_number_of_particles()))
        return [fluid, wall]

    def create_domain(self):
        return DomainManager(
            xmin=0, xmax=domain_width, ymin=0, ymax=domain_height,
            periodic_in_x=True, periodic_in_y=False)

    def create_solver(self):
        kernel = WendlandQuintic(dim=2)
        integrator = PECIntegrator(fluid=TransportVelocityStep())
        return Solver(kernel=kernel, dim=dim, integrator=integrator,
                      dt=dt, tf=tf, adaptive_timestep=False)

    def create_equations(self):
        return [
            Group(equations=[
                SummationDensity(dest='fluid',
                                 sources=['fluid', 'wall'])]),
            Group(equations=[
                StateEquation(dest='fluid', sources=None, rho0=rho0,
                              p0=p0, b=1.0),
                SetWallVelocity(dest='wall', sources=['fluid']),
                SmoothedColor(dest='fluid', sources=['fluid']),
            ]),
            # shrink h to evaluate interface quantities, then restore
            Group(equations=[
                ScaleSmoothingLength(dest='fluid', sources=None,
                                     factor=0.8)],
                  update_nnps=False),
            Group(equations=[
                ColorGradientUsingNumberDensity(
                    dest='fluid', sources=['fluid', 'wall'],
                    epsilon=0.01 / h0)]),
            Group(equations=[
                InterfaceCurvatureFromNumberDensity(
                    dest='fluid', sources=['fluid'],
                    with_morris_correction=True)]),
            Group(equations=[
                ScaleSmoothingLength(dest='fluid', sources=None,
                                     factor=1.25)],
                  update_nnps=False),
            Group(equations=[
                SolidWallPressureBC(dest='wall', sources=['fluid'],
                                    p0=p0, rho0=rho0, gy=gy)]),
            Group(equations=[
                MomentumEquationPressureGradient(
                    dest='fluid', sources=['fluid', 'wall'], pb=p0,
                    gy=gy),
                MomentumEquationViscosity(
                    dest='fluid', sources=['fluid'], nu=nu),
                SolidWallNoSlipBC(dest='fluid', sources=['wall'],
                                  nu=nu),
                ShadlooYildizSurfaceTensionForce(
                    dest='fluid', sources=None, sigma=sigma),
                MomentumEquationArtificialStress(
                    dest='fluid', sources=['fluid']),
            ]),
        ]


if __name__ == '__main__':
    app = KHITVF()
    app.run()
