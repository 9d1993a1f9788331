"""Dam break past an obstacle using geometry and discretization from
SPHysics Case 5 input files (parity case for
/root/reference/pysph/examples/sphysics/dambreak_sphysics.py).

The run is driven by SPHysics' own INDAT/IPART files (numerical
parameters and initial particle data, optionally gzipped); pass them
with ``--indat/--ipart`` or drop them next to this script.  They are
produced by the SPHysics case generator — see
https://wiki.manchester.ac.uk/sphysics."""

import os

import numpy

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.basic_equations import (ContinuityEquation,
                                           XSPHCorrection)
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.integrator import EPECIntegrator, PECIntegrator
from pysph_tpu.sph.integrator_step import WCSPHStep
from pysph_tpu.sph.wc.basic import (MomentumEquation, TaitEOS,
                                    TaitEOSHGCorrection)
from pysph_tpu.tools.sphysics import sphysics2pysph

MY_DIR = os.path.dirname(__file__)

dim = 3
dt = 1e-5
tf = 2.0


class DamBreak3DSPhysics(Application):
    def add_user_options(self, group):
        group.add_argument(
            '--test', action='store_true', dest='test',
            default=False,
            help='For use while testing of results, uses PEC '
                 'integrator.')
        group.add_argument(
            '--indat', action='store', dest='indat',
            default=os.path.join(MY_DIR, 'INDAT.gz'),
            help='SPHysics INDAT parameter file.')
        group.add_argument(
            '--ipart', action='store', dest='ipart',
            default=os.path.join(MY_DIR, 'IPART.gz'),
            help='SPHysics IPART initial-particle file.')

    def consume_user_options(self):
        self.indat = self.options.indat
        self.ipart = self.options.ipart
        for f in (self.indat, self.ipart):
            if not os.path.exists(f):
                raise RuntimeError(
                    'SPHysics input file %r not found: generate it '
                    'with the SPHysics case tools and pass '
                    '--indat/--ipart.' % f)
        ind = numpy.loadtxt(self.indat)
        self.B = float(ind[11])
        self.gamma = float(ind[12])
        self.eps = float(ind[14])
        self.rho0 = float(ind[15])
        self.alpha = float(ind[16])
        self.beta = 0.0
        self.c0 = numpy.sqrt(self.B * self.gamma / self.rho0)

    def create_particles(self):
        return sphysics2pysph(self.ipart, self.indat, vtk=False)

    def create_solver(self):
        kernel = CubicSpline(dim=3)
        if self.options.test:
            integrator = PECIntegrator(fluid=WCSPHStep(),
                                       boundary=WCSPHStep())
            adaptive = False
        else:
            integrator = EPECIntegrator(fluid=WCSPHStep(),
                                        boundary=WCSPHStep())
            adaptive = True
        return Solver(dim=dim, kernel=kernel, integrator=integrator,
                      adaptive_timestep=adaptive, tf=tf, dt=dt,
                      n_damp=0)

    def create_equations(self):
        return [
            Group(equations=[
                TaitEOS(dest='fluid', sources=None, rho0=self.rho0,
                        c0=self.c0, gamma=self.gamma),
                TaitEOSHGCorrection(dest='boundary', sources=None,
                                    rho0=self.rho0, c0=self.c0,
                                    gamma=self.gamma),
            ], real=False),
            Group(equations=[
                ContinuityEquation(dest='fluid',
                                   sources=['fluid', 'boundary']),
                ContinuityEquation(dest='boundary',
                                   sources=['fluid']),
                MomentumEquation(
                    dest='fluid', sources=['fluid', 'boundary'],
                    c0=self.c0, alpha=self.alpha, beta=self.beta,
                    gz=-9.81, tensile_correction=True),
                XSPHCorrection(dest='fluid', sources=['fluid'],
                               eps=self.eps),
            ]),
        ]


if __name__ == '__main__':
    app = DamBreak3DSPhysics()
    app.run()
