"""High-velocity impact of a steel projectile on an aluminium plate.

Parity case for /root/reference/pysph/examples/solid_mech/impact.py:
2D HVI with the stiffened-gas EOS, von Mises plasticity and
Monaghan artificial stress (material data from Howell & Ball, JCP
2002, Table 1).
"""

import numpy

from pysph_tpu.base.kernels import Gaussian
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.basic_equations import (
    ContinuityEquation, MonaghanArtificialViscosity,
    VelocityGradient2D, XSPHCorrection)
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.integrator import EPECIntegrator
from pysph_tpu.sph.integrator_step import SolidMechStep
from pysph_tpu.sph.solid_mech.basic import (
    EnergyEquationWithStress, HookesDeviatoricStressRate,
    MomentumEquationWithStress, MonaghanArtificialStress)
from pysph_tpu.sph.solid_mech.hvi import (
    StiffenedGasEOS, VonMisesPlasticity2D)

# aluminium plate / steel projectile (Howell & Ball 2002, Table 1)
RO1, C1, GAMMA1, G1, YO1 = 2785.0, 5328.0, 2.0, 2.76e7, 0.3e6
RO2, C2, GAMMA2, G2, YO2 = 7900.0, 4600.0, 2.17, 8.530e7, 0.979e6
V_S = 3100.0
AVISC_ALPHA, AVISC_BETA, AVISC_ETA = 1.0, 1.5, 0.1
XSPH_EPS = 0.5

SOLID_PROPS = (
    ['e', 'cs', 'arho', 'au', 'av', 'aw', 'ax', 'ay', 'az', 'ae',
     'rho0', 'u0', 'v0', 'w0', 'x0', 'y0', 'z0', 'e0'] +
    ['v%d%d' % (i, j) for i in range(3) for j in range(3)] +
    ['r00', 'r01', 'r02', 'r11', 'r12', 'r22'] +
    ['s00', 's01', 's02', 's11', 's12', 's22'] +
    ['as00', 'as01', 'as02', 'as11', 'as12', 'as22'] +
    ['s000', 's010', 's020', 's110', 's120', 's220'])


def _solid_array(name, x, y, dx, hdx, rho_ref, cs_ref, G, u=0.0):
    h = numpy.full_like(x, hdx * dx)
    m = numpy.full_like(x, dx * dx * rho_ref)
    rho = numpy.full_like(x, rho_ref)
    cs = numpy.full_like(x, cs_ref)
    pa = get_particle_array(name=name, x=x, y=y, h=h, m=m, rho=rho,
                            cs=cs, u=numpy.full_like(x, u))
    for prop in SOLID_PROPS:
        pa.add_property(prop)
    pa.add_constant('G', G)
    pa.add_constant('n', 4)
    kernel = Gaussian(dim=2)
    pa.add_constant('wdeltap', float(kernel.kernel(rij=dx, h=hdx * dx)))
    return pa


class Impact(Application):
    def initialize(self):
        self.dx = 0.0001
        self.hdx = 1.3
        self.r = 0.005

    def add_user_options(self, group):
        group.add_argument('--dx', action='store', type=float,
                           dest='dx', default=0.0001,
                           help='Particle spacing.')

    def consume_user_options(self):
        self.dx = self.options.dx

    def create_particles(self):
        dx, r = self.dx, self.r
        # circular projectile moving at V_S toward the plate
        x, y = numpy.mgrid[-r:r:dx, -r:r:dx]
        x, y = x.ravel(), y.ravel()
        keep = numpy.flatnonzero(x * x + y * y <= r * r)
        x, y = x[keep] - (r + 2 * dx), y[keep]
        # note: G assignments (projectile<-G1, plate<-G2) follow the
        # reference example verbatim (impact.py:240,199)
        projectile = _solid_array('projectile', x, y, dx, self.hdx,
                                  RO2, C2, G1, u=V_S)
        print('%d projectile particles' % x.size)

        # rectangular plate
        xa = numpy.arange(0, 0.002 + dx, dx)
        ya = numpy.arange(-0.020, 0.02 + dx, dx)
        x, y = numpy.meshgrid(xa, ya)
        x, y = x.ravel(), y.ravel()
        plate = _solid_array('plate', x, y, dx, self.hdx, RO1, C1, G2)
        print('%d plate particles' % x.size)
        return [plate, projectile]

    def create_solver(self):
        kernel = Gaussian(dim=2)
        integrator = EPECIntegrator(projectile=SolidMechStep(),
                                    plate=SolidMechStep())
        solver = Solver(kernel=kernel, dim=2, integrator=integrator,
                        dt=1e-9, tf=8e-6)
        solver.pfreq = 100
        return solver

    def create_equations(self):
        both = ['projectile', 'plate']
        return [
            Group(equations=[
                StiffenedGasEOS(dest='plate', sources=None,
                                gamma=GAMMA1, r0=RO1, c0=C1),
                StiffenedGasEOS(dest='projectile', sources=None,
                                gamma=GAMMA2, r0=RO2, c0=C2),
                VelocityGradient2D(dest='plate', sources=['plate']),
                VelocityGradient2D(dest='projectile',
                                   sources=['projectile']),
                VonMisesPlasticity2D(dest='plate', sources=None,
                                     flow_stress=YO1),
                VonMisesPlasticity2D(dest='projectile', sources=None,
                                     flow_stress=YO2),
                MonaghanArtificialStress(dest='plate', sources=None,
                                         eps=0.3),
                MonaghanArtificialStress(dest='projectile',
                                         sources=None, eps=0.3),
            ]),
            Group(equations=[
                ContinuityEquation(dest='plate', sources=both),
                ContinuityEquation(dest='projectile', sources=both),
                MomentumEquationWithStress(dest='projectile',
                                           sources=both),
                MomentumEquationWithStress(dest='plate', sources=both),
                EnergyEquationWithStress(
                    dest='plate', sources=both, alpha=AVISC_ALPHA,
                    beta=AVISC_BETA, eta=AVISC_ETA),
                EnergyEquationWithStress(
                    dest='projectile', sources=both,
                    alpha=AVISC_ALPHA, beta=AVISC_BETA,
                    eta=AVISC_ETA),
                MonaghanArtificialViscosity(
                    dest='plate', sources=both, alpha=AVISC_ALPHA,
                    beta=AVISC_BETA),
                MonaghanArtificialViscosity(
                    dest='projectile', sources=both,
                    alpha=AVISC_ALPHA, beta=AVISC_BETA),
                HookesDeviatoricStressRate(dest='plate',
                                           sources=None),
                HookesDeviatoricStressRate(dest='projectile',
                                           sources=None),
                XSPHCorrection(dest='plate', sources=['plate'],
                               eps=XSPH_EPS),
                XSPHCorrection(dest='projectile',
                               sources=['projectile'], eps=XSPH_EPS),
            ]),
        ]


if __name__ == '__main__':
    app = Impact()
    app.run()
