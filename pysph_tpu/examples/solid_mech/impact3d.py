"""3D high-velocity impact of a steel sphere on an aluminium plate.

Parity case for /root/reference/pysph/examples/solid_mech/impact3d.py
(same material model as the 2D impact case with VelocityGradient3D).
"""

import numpy

from pysph_tpu.base.kernels import Gaussian
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.examples.solid_mech.impact import (
    AVISC_ALPHA, AVISC_BETA, AVISC_ETA, C1, C2, G1, G2, GAMMA1,
    GAMMA2, RO1, RO2, SOLID_PROPS, V_S, XSPH_EPS, YO1, YO2)
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.basic_equations import (
    ContinuityEquation, MonaghanArtificialViscosity,
    VelocityGradient3D, XSPHCorrection)
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.integrator import EPECIntegrator
from pysph_tpu.sph.integrator_step import SolidMechStep
from pysph_tpu.sph.solid_mech.basic import (
    EnergyEquationWithStress, HookesDeviatoricStressRate,
    MomentumEquationWithStress, MonaghanArtificialStress)
from pysph_tpu.sph.solid_mech.hvi import (
    StiffenedGasEOS, VonMisesPlasticity2D)


def _solid_array3(name, x, y, z, dx, hdx, rho_ref, cs_ref, G, u=0.0):
    h = numpy.full_like(x, hdx * dx)
    m = numpy.full_like(x, dx ** 3 * rho_ref)
    rho = numpy.full_like(x, rho_ref)
    cs = numpy.full_like(x, cs_ref)
    pa = get_particle_array(name=name, x=x, y=y, z=z, h=h, m=m,
                            rho=rho, cs=cs,
                            u=numpy.full_like(x, u))
    for prop in SOLID_PROPS:
        pa.add_property(prop)
    pa.add_constant('G', G)
    pa.add_constant('n', 4)
    kernel = Gaussian(dim=3)
    pa.add_constant('wdeltap',
                    float(kernel.kernel(rij=dx, h=hdx * dx)))
    return pa


class Impact3D(Application):
    def initialize(self):
        self.dx = 0.0002
        self.hdx = 1.3
        self.r = 0.002

    def add_user_options(self, group):
        group.add_argument('--dx', action='store', type=float,
                           dest='dx', default=0.0002,
                           help='Particle spacing.')

    def consume_user_options(self):
        self.dx = self.options.dx

    def create_particles(self):
        dx, r = self.dx, self.r
        x, y, z = numpy.mgrid[-r:r + 1e-9:dx, -r:r + 1e-9:dx,
                              -r:r + 1e-9:dx]
        x, y, z = x.ravel(), y.ravel(), z.ravel()
        keep = numpy.flatnonzero(x * x + y * y + z * z <= r * r)
        x, y, z = x[keep] - (r + 2 * dx), y[keep], z[keep]
        projectile = _solid_array3('projectile', x, y, z, dx,
                                   self.hdx, RO2, C2, G1, u=V_S)
        print('%d projectile particles' % x.size)

        xa = numpy.arange(0, 0.001 + dx, dx)
        ya = numpy.arange(-0.005, 0.005 + dx, dx)
        za = numpy.arange(-0.005, 0.005 + dx, dx)
        x, y, z = numpy.meshgrid(xa, ya, za)
        x, y, z = x.ravel(), y.ravel(), z.ravel()
        plate = _solid_array3('plate', x, y, z, dx, self.hdx, RO1,
                              C1, G2)
        print('%d plate particles' % x.size)
        return [plate, projectile]

    def create_solver(self):
        kernel = Gaussian(dim=3)
        integrator = EPECIntegrator(projectile=SolidMechStep(),
                                    plate=SolidMechStep())
        solver = Solver(kernel=kernel, dim=3, integrator=integrator,
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
                VelocityGradient3D(dest='plate', sources=['plate']),
                VelocityGradient3D(dest='projectile',
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
                MomentumEquationWithStress(dest='plate',
                                           sources=both),
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
                               sources=['projectile'],
                               eps=XSPH_EPS),
            ]),
        ]


if __name__ == '__main__':
    app = Impact3D()
    app.run()
