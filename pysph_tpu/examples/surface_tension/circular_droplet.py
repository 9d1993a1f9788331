"""Curvature computation for a circular droplet (parity case for
/root/reference/pysph/examples/surface_tension/circular_droplet.py).

A circle of color=1 inside a periodic box of color=0 fluid; a few
steps of the Morris interface machinery must reproduce the analytic
interface curvature kappa = 1/r on the interface band."""

import numpy as np

from pysph_tpu.base.domain import DomainManager
from pysph_tpu.base.kernels import QuinticSpline
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.gas_dynamics.basic import ScaleSmoothingLength
from pysph_tpu.sph.integrator import PECIntegrator
from pysph_tpu.sph.integrator_step import TransportVelocityStep
from pysph_tpu.sph.surface_tension import (
    InterfaceCurvatureFromNumberDensity, MorrisColorGradient,
    ShadlooYildizSurfaceTensionForce, SmoothedColor)
from pysph_tpu.sph.wc.transport_velocity import (
    MomentumEquationArtificialStress, MomentumEquationPressureGradient,
    MomentumEquationViscosity, StateEquation, SummationDensity)

dim = 2
L = 1.0
radius = 0.25
rho0 = 1000.0
c0 = 20.0
p0 = c0 * c0 * rho0
nu = 0.01
sigma = 1.0
dx = 0.0125
hdx = 1.5
h0 = hdx * dx
factor1 = 1.0
factor2 = 1.0 / factor1

EXTRA_PROPS = [
    'V', 'color', 'scolor', 'cx', 'cy', 'cz', 'cx2', 'cy2', 'cz2',
    'nx', 'ny', 'nz', 'ddelta', 'kappa', 'uf', 'vf', 'wf', 'uhat',
    'vhat', 'what', 'auhat', 'avhat', 'awhat', 'ax', 'ay', 'az',
    'wij', 'vmag2', 'N', 'wij_sum']


class CircularDroplet(Application):
    def create_domain(self):
        return DomainManager(xmin=0, xmax=L, ymin=0, ymax=L,
                             periodic_in_x=True, periodic_in_y=True)

    def create_particles(self):
        x, y = np.mgrid[dx / 2:L:dx, dx / 2:L:dx]
        x, y = x.ravel(), y.ravel()
        volume = dx * dx
        fluid = get_particle_array(
            name='fluid', x=x, y=y, h=np.full_like(x, h0),
            m=np.full_like(x, volume * rho0),
            rho=np.full_like(x, rho0), cs=np.full_like(x, c0),
            additional_props=EXTRA_PROPS)
        inner = (x - 0.5) ** 2 + (y - 0.5) ** 2 <= radius ** 2
        fluid.color[:] = np.where(inner, 1.0, 0.0)
        fluid.V[:] = 1.0 / volume
        fluid.add_output_arrays(['V', 'color', 'cx', 'cy', 'nx',
                                 'ny', 'ddelta', 'p', 'kappa', 'N',
                                 'scolor'])
        print('Circular droplet: %d particles'
              % fluid.get_number_of_particles())
        return [fluid]

    def create_solver(self):
        dt = 0.9 * min(0.25 * h0 / (1.1 * c0),
                       0.125 * h0 ** 2 / nu)
        return Solver(kernel=QuinticSpline(dim=2), dim=dim,
                      integrator=PECIntegrator(
                          fluid=TransportVelocityStep()),
                      dt=dt, tf=5 * dt, pfreq=5)

    def create_equations(self):
        return [
            Group(equations=[
                SummationDensity(dest='fluid', sources=['fluid'])]),
            Group(equations=[
                StateEquation(dest='fluid', sources=None, rho0=rho0,
                              p0=p0, b=1.0),
                SmoothedColor(dest='fluid', sources=['fluid']),
            ]),
            Group(equations=[
                ScaleSmoothingLength(dest='fluid', sources=None,
                                     factor=factor1)]),
            Group(equations=[
                MorrisColorGradient(dest='fluid', sources=['fluid'],
                                    epsilon=0.01 / h0)]),
            Group(equations=[
                InterfaceCurvatureFromNumberDensity(
                    dest='fluid', sources=['fluid'],
                    with_morris_correction=True)]),
            Group(equations=[
                ScaleSmoothingLength(dest='fluid', sources=None,
                                     factor=factor2)]),
            Group(equations=[
                MomentumEquationPressureGradient(
                    dest='fluid', sources=['fluid'], pb=p0),
                MomentumEquationViscosity(dest='fluid',
                                          sources=['fluid'], nu=nu),
                ShadlooYildizSurfaceTensionForce(dest='fluid',
                                                 sources=None,
                                                 sigma=sigma),
                MomentumEquationArtificialStress(
                    dest='fluid', sources=['fluid']),
            ]),
        ]

    def post_process(self, info_fname_or_dir='.'):
        """Mean curvature on the interface band vs 1/r."""
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        data = load(files[-1])
        fluid = data['arrays']['fluid']
        kappa = np.asarray(fluid.kappa)
        N = np.asarray(fluid.N)
        band = N > 0
        if band.any():
            mean_kappa = float(np.mean(np.abs(kappa[band])))
            print('mean |kappa| on interface: %.3f (exact %.3f)'
                  % (mean_kappa, 1.0 / radius))
            return mean_kappa
        return None


if __name__ == '__main__':
    app = CircularDroplet()
    app.run()
    app.post_process(app.info_filename)
