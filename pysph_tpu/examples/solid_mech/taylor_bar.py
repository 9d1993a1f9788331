"""Taylor bar impact: an elastic-plastic bar hitting a rigid plate.

Parity case for /root/reference/pysph/examples/solid_mech/taylor_bar.py
(Mie-Gruneisen EOS, von Mises plasticity, Monaghan boundary force on
a line of boundary particles).
"""

import numpy

from pysph_tpu.base.kernels import WendlandQuintic
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.examples.solid_mech.impact import SOLID_PROPS
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.basic_equations import (
    ContinuityEquation, MonaghanArtificialViscosity,
    VelocityGradient2D, XSPHCorrection)
from pysph_tpu.sph.boundary_equations import MonaghanBoundaryForce
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.integrator import PECIntegrator
from pysph_tpu.sph.integrator_step import SolidMechStep
from pysph_tpu.sph.solid_mech.basic import (
    EnergyEquationWithStress, HookesDeviatoricStressRate,
    MomentumEquationWithStress)
from pysph_tpu.sph.solid_mech.hvi import (
    MieGruneisenEOS, VonMisesPlasticity2D)

R0 = 7850.0          # bar reference density
V_S = 200.0          # impact velocity
SS = 4699.0          # sound speed in the bar
C, S, GAMMA = 3630.0, 1800.0, 1.81
G, YO = 8e10, 6e8
BAR_WIDTH = 0.0076


class TaylorBar(Application):
    def initialize(self):
        self.dx = 0.000384848
        self.hdx = 2.0

    def add_user_options(self, group):
        group.add_argument('--dx', action='store', type=float,
                           dest='dx', default=0.000384848,
                           help='Particle spacing.')

    def consume_user_options(self):
        self.dx = self.options.dx

    def create_particles(self):
        dx = self.dx
        h = self.hdx * dx

        # rigid plate: a line of boundary particles with normals
        xp = numpy.arange(-2 * BAR_WIDTH, 2 * BAR_WIDTH + dx, dx)
        yp = numpy.zeros_like(xp)
        plate = get_particle_array(
            name='plate', x=xp, y=yp,
            tx=numpy.ones_like(xp), ty=numpy.zeros_like(xp),
            tz=numpy.zeros_like(xp), nx=numpy.zeros_like(xp),
            ny=numpy.ones_like(xp), nz=numpy.zeros_like(xp),
            cs=numpy.full_like(xp, SS))
        plate.m[:] = dx * dx * R0

        xa = numpy.arange(-BAR_WIDTH / 2, BAR_WIDTH / 2 + dx, dx)
        ya = numpy.arange(4 * dx, 0.0254 + 4 * dx, dx)
        x, y = numpy.meshgrid(xa, ya)
        x, y = x.ravel(), y.ravel()
        print('%d bar particles' % x.size)
        bar = get_particle_array(
            name='bar', x=x, y=y, h=numpy.full_like(x, h),
            m=numpy.full_like(x, dx * dx * R0),
            rho=numpy.full_like(x, R0),
            cs=numpy.full_like(x, SS),
            v=numpy.full_like(x, -V_S))
        for prop in SOLID_PROPS:
            bar.add_property(prop)
        bar.add_constant('G', G)
        bar.add_constant('n', 4)
        kernel = WendlandQuintic(dim=2)
        bar.add_constant('wdeltap',
                         float(kernel.kernel(rij=dx, h=h)))
        return [bar, plate]

    def create_solver(self):
        kernel = WendlandQuintic(dim=2)
        integrator = PECIntegrator(bar=SolidMechStep())
        solver = Solver(kernel=kernel, dim=2, integrator=integrator,
                        dt=1e-9, tf=2.5e-5)
        return solver

    def create_equations(self):
        return [
            Group(equations=[
                MieGruneisenEOS(dest='bar', sources=None,
                                gamma=GAMMA, r0=R0, c0=C, S=S),
                VelocityGradient2D(dest='bar', sources=['bar']),
                VonMisesPlasticity2D(flow_stress=YO, dest='bar',
                                     sources=None),
            ]),
            Group(equations=[
                ContinuityEquation(dest='bar', sources=['bar']),
                MomentumEquationWithStress(dest='bar',
                                           sources=['bar']),
                MonaghanArtificialViscosity(dest='bar',
                                            sources=['bar'],
                                            alpha=0.5, beta=0.5),
                MonaghanBoundaryForce(dest='bar', sources=['plate'],
                                      deltap=self.dx),
                EnergyEquationWithStress(dest='bar', sources=['bar'],
                                         alpha=0.5, beta=0.5,
                                         eta=0.01),
                HookesDeviatoricStressRate(dest='bar', sources=None),
                XSPHCorrection(dest='bar', sources=['bar'], eps=0.5),
            ]),
        ]


if __name__ == '__main__':
    app = TaylorBar()
    app.run()
