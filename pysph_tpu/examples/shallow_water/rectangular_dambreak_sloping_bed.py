"""Rectangular dam break over a sloping dry bed discretized with bed
particles (parity case for
/root/reference/pysph/examples/shallow_water/rectangular_dambreak_sloping_bed.py).

Unlike the analytic-bed variant, the bottom here is a particle array:
the bed's own gradient is evaluated with BedGradient, then Shepard-
interpolated onto the fluid every step."""

import numpy as np

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array_swe as gpa_swe
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.swe.basic import (
    BedGradient, CheckConvergence,
    CorrectionFactorVariableSmoothingLength,
    DensityNewtonRaphsonIteration, DensityResidual,
    FluidBottomElevation, FluidBottomGradient, InitialGuessDensity,
    ParticleAcceleration, SummationDensity, SWEIntegrator, SWEOS,
    SWEStep, UpdateSmoothingLength)
from pysph_tpu.tools.sph_evaluator import SPHEvaluator

rho_w = 1000.0
g = 9.81
dim = 2


class RectangularDamBreakSlopingBed(Application):
    def add_user_options(self, group):
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=1.5)
        group.add_argument('--dw0', action='store', type=float,
                           dest='dw0', default=1.0,
                           help='Initial depth (m).')
        group.add_argument('--le', action='store', type=float,
                           dest='le', default=2.0,
                           help='Column length (m).')
        group.add_argument('--w', action='store', type=float,
                           dest='w', default=1.0,
                           help='Column width (m).')
        group.add_argument('--dx', action='store', type=float,
                           dest='dx', default=0.05)
        group.add_argument('--theta', action='store', type=float,
                           dest='theta', default=10.0,
                           help='Bed slope (deg).')

    def consume_user_options(self):
        o = self.options
        self.hdx, self.dw0 = o.hdx, o.dw0
        self.le, self.w, self.dx = o.le, o.w, o.dx
        self.theta = o.theta

    def create_particles(self):
        dx = self.dx
        # symmetry column to the left of the wall at x = 0
        x, y = np.mgrid[-self.le:self.le + 1e-9:dx,
                        -self.w / 2:self.w / 2 + 1e-9:dx]
        x, y = x.ravel(), y.ravel()
        m = np.full_like(x, dx * dx * rho_w * self.dw0)
        rho = np.full_like(x, rho_w * self.dw0)
        h = np.full_like(x, self.hdx * dx)
        fluid = gpa_swe(x=x, y=y, m=m, rho=rho, rho0=rho.copy(),
                        h=h, h0=h.copy(), name='fluid')

        dxb = dx / 2.0
        xb, yb = np.mgrid[-3 * self.le:3 * self.le + 1e-9:dxb,
                          -self.w / 2 - 4 * dxb:
                          self.w / 2 + 4 * dxb + 1e-9:dxb]
        xb, yb = xb.ravel(), yb.ravel()
        b = (xb.max() - xb) * np.tan(np.deg2rad(self.theta))
        bed = gpa_swe(name='bed', x=xb, y=yb,
                      V=np.full_like(xb, dxb * dxb), b=b,
                      h=np.full_like(xb, self.hdx * dxb))
        print('Sloping-bed dam break: %d fluid, %d bed particles'
              % (fluid.get_number_of_particles(),
                 bed.get_number_of_particles()))
        compute_initial_props([fluid, bed])
        return [fluid, bed]

    def create_solver(self):
        return Solver(kernel=CubicSpline(dim=2), dim=2,
                      integrator=SWEIntegrator(fluid=SWEStep()),
                      cfl=0.3, adaptive_timestep=True, dt=1e-4,
                      tf=0.5)

    def create_equations(self):
        return [
            Group(equations=[
                InitialGuessDensity(dim=dim, dest='fluid',
                                    sources=['fluid']),
                UpdateSmoothingLength(dim=dim, dest='fluid'),
            ], update_nnps=True),
            Group(equations=[
                CorrectionFactorVariableSmoothingLength(
                    dest='fluid', sources=['fluid']),
                SummationDensity(dest='fluid', sources=['fluid']),
                DensityResidual('fluid'),
            ]),
            Group(equations=[
                Group(equations=[
                    DensityNewtonRaphsonIteration(dim=dim,
                                                  dest='fluid'),
                    UpdateSmoothingLength(dim=dim, dest='fluid'),
                ], update_nnps=True),
                Group(equations=[
                    CorrectionFactorVariableSmoothingLength(
                        dest='fluid', sources=['fluid']),
                    SummationDensity(dest='fluid',
                                     sources=['fluid']),
                    DensityResidual(dest='fluid'),
                    CheckConvergence(dest='fluid'),
                ]),
            ], iterate=True, max_iterations=10),
            Group(equations=[
                CorrectionFactorVariableSmoothingLength(
                    dest='fluid', sources=['fluid']),
                SWEOS(dest='fluid'),
            ]),
            Group(equations=[
                FluidBottomElevation(dest='fluid', sources=['bed']),
                FluidBottomGradient(dest='fluid', sources=['bed']),
                ParticleAcceleration(dim=dim, dest='fluid',
                                     sources=['fluid'],
                                     u_only=True),
            ]),
        ]

    def post_process(self, info_fname_or_dir='.'):
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        data = load(files[-1])
        fluid = data['arrays']['fluid']
        t = float(data['solver_data']['t'])
        np.savez(self.output_dir + '/results.npz',
                 x=np.asarray(fluid.x),
                 dw=np.asarray(fluid.rho) / rho_w, t=t)
        print('front at t=%.2f: x=%.3f'
              % (t, float(np.max(np.asarray(fluid.x)))))


def compute_initial_props(particles):
    sph_eval = SPHEvaluator(particles, [Group(equations=[
        FluidBottomElevation(dest='fluid', sources=['bed']),
        BedGradient(dest='bed', sources=['bed']),
        CorrectionFactorVariableSmoothingLength(dest='fluid',
                                                sources=['fluid']),
        SWEOS(dest='fluid'),
    ])], dim=2, kernel=CubicSpline(dim=2))
    sph_eval.evaluate()


if __name__ == '__main__':
    app = RectangularDamBreakSlopingBed()
    app.run()
    app.post_process(app.info_filename)
