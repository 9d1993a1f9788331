"""SPHERIC benchmark case 6: an accelerated square obstacle dragged
through initially still fluid in a closed channel (parity case for
/root/reference/pysph/examples/spheric/moving_square.py;
http://spheric-sph.org/tests/test-6).

TVF fluid + generalized-wall channel and obstacle; the obstacle is
moved with a prescribed Gaussian acceleration (fit of the benchmark's
Motion.dat) using two-stage rigid-body kinematics."""

import numpy as np
import jax.numpy as jnp

from pysph_tpu.base.kernels import QuinticSpline
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.equation import Equation, Group
from pysph_tpu.sph.integrator import Integrator
from pysph_tpu.sph.integrator_step import (
    TransportVelocityStep, TwoStageRigidBodyStep)
from pysph_tpu.sph.wc.transport_velocity import (
    MomentumEquationArtificialStress, MomentumEquationPressureGradient,
    MomentumEquationViscosity, SetWallVelocity, SolidWallNoSlipBC,
    SolidWallPressureBC, StateEquation, SummationDensity)

Lx, Ly = 10.0, 5.0
Umax = 1.0
c0 = 25.0 * Umax
rho0 = 1.0
p0 = c0 * c0 * rho0
obstacle_width = 1.0
Re = 150
nu = Umax * obstacle_width / Re
hdx = 1.2


class SPHERICBenchmarkAcceleration(Equation):
    """Prescribed obstacle acceleration: Gaussian fit
    a*exp(-(t-b)^2/(2 c^2)) + d of the SPHERIC Motion.dat
    (reference spheric/moving_square.py:60)."""

    def loop(self, d_idx, d_au, t=0.0):
        a = 2.8209512
        b = 0.525652151
        c = 0.14142151
        d = -2.55580905e-08
        d_au[d_idx] = a * jnp.exp(-(t - b) * (t - b) /
                                  (2.0 * c * c)) + d


class MovingSquare(Application):
    def add_user_options(self, group):
        group.add_argument('--nx', action='store', type=int,
                           dest='nx', default=50,
                           help='Particles per 0.2*Lx.')

    def consume_user_options(self):
        self.dx = 0.2 * Lx / self.options.nx
        self.h0 = hdx * self.dx

    def create_particles(self):
        dx = self.dx
        ghost_extent = 4 * dx
        span_x = np.arange(-ghost_extent + dx / 2, Lx + ghost_extent,
                           dx)
        span_y = np.arange(-ghost_extent + dx / 2, Ly + ghost_extent,
                           dx)
        x, y = np.meshgrid(span_x, span_y)
        x, y = x.ravel(), y.ravel()

        interior = (x > 0.0) & (x < Lx) & (y > 0.0) & (y < Ly)
        obst = interior & (x >= 1.0) & (x <= 2.0) & (y >= 2.0) & \
            (y <= 3.0)
        fluid_m = interior & ~obst
        solid_m = ~interior

        extra = ['V', 'uf', 'vf', 'wf', 'ug', 'vg', 'wg', 'uhat',
                 'vhat', 'what', 'auhat', 'avhat', 'awhat', 'au',
                 'av', 'aw', 'wij', 'u0', 'v0', 'w0', 'x0', 'y0',
                 'z0', 'ax', 'ay', 'az', 'vmag2']
        volume = dx * dx

        def make(name, mask):
            pa = get_particle_array(
                name=name, x=x[mask], y=y[mask],
                m=np.full(mask.sum(), volume * rho0),
                rho=np.full(mask.sum(), rho0),
                h=np.full(mask.sum(), self.h0),
                additional_props=extra)
            pa.V[:] = 1.0 / volume
            return pa

        fluid = make('fluid', fluid_m)
        solid = make('solid', solid_m)
        obstacle = make('obstacle', obst)
        fluid.set_output_arrays(['x', 'y', 'u', 'v', 'vmag2', 'rho',
                                 'p', 'V', 'm', 'h'])
        solid.set_output_arrays(['x', 'y', 'rho', 'p'])
        obstacle.set_output_arrays(['x', 'y', 'u0', 'rho', 'p', 'u'])
        print('SPHERIC benchmark 6 :: Re=%d nfluid=%d nsolid=%d '
              'nobstacle=%d' % (Re, fluid.get_number_of_particles(),
                                solid.get_number_of_particles(),
                                obstacle.get_number_of_particles()))
        return [fluid, solid, obstacle]

    def create_solver(self):
        dt_cfl = 0.25 * self.h0 / (c0 + Umax)
        dt_viscous = 0.125 * self.h0 ** 2 / nu
        dt = 0.8 * min(dt_cfl, dt_viscous)
        integrator = Integrator(fluid=TransportVelocityStep(),
                                obstacle=TwoStageRigidBodyStep())
        return Solver(kernel=QuinticSpline(dim=2), dim=2,
                      integrator=integrator, tf=8.0, dt=dt,
                      adaptive_timestep=False,
                      output_at_times=list(range(1, 8)))

    def create_equations(self):
        return [
            Group(equations=[
                SPHERICBenchmarkAcceleration(dest='obstacle',
                                             sources=None),
            ], real=False),
            Group(equations=[
                SummationDensity(dest='fluid',
                                 sources=['fluid', 'solid',
                                          'obstacle']),
            ], real=False),
            Group(equations=[
                StateEquation(dest='fluid', sources=None, p0=p0,
                              rho0=rho0, b=1.0),
                SetWallVelocity(dest='solid', sources=['fluid']),
                SetWallVelocity(dest='obstacle', sources=['fluid']),
            ], real=False),
            Group(equations=[
                SolidWallPressureBC(dest='obstacle',
                                    sources=['fluid'], b=1.0,
                                    rho0=rho0, p0=p0),
                SolidWallPressureBC(dest='solid', sources=['fluid'],
                                    b=1.0, rho0=rho0, p0=p0),
            ], real=False),
            Group(equations=[
                MomentumEquationPressureGradient(
                    dest='fluid',
                    sources=['fluid', 'solid', 'obstacle'], pb=p0),
                MomentumEquationViscosity(dest='fluid',
                                          sources=['fluid'], nu=nu),
                SolidWallNoSlipBC(dest='fluid',
                                  sources=['solid', 'obstacle'],
                                  nu=nu),
                MomentumEquationArtificialStress(dest='fluid',
                                                 sources=['fluid']),
            ]),
        ]

    def post_process(self, info_fname_or_dir='.'):
        """Obstacle trajectory over time."""
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        rows = []
        for f in files:
            data = load(f)
            obst = data['arrays']['obstacle']
            rows.append((float(data['solver_data']['t']),
                         float(np.mean(np.asarray(obst.x))),
                         float(np.mean(np.asarray(obst.u)))))
        out = np.array(rows)
        np.savez(self.output_dir + '/results.npz', t=out[:, 0],
                 xcen=out[:, 1], ucen=out[:, 2])
        print('obstacle center x at t=%.2f: %.3f' % (out[-1, 0],
                                                     out[-1, 1]))
        return out


if __name__ == '__main__':
    app = MovingSquare()
    app.run()
    app.post_process(app.info_filename)
