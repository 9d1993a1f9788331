"""Pitching sloshing tank (Akyildiz & Unal 2006): 3D rectangular tank
75% filled, pitch amplitude 4 deg at 2 rad/s (parity case for
/root/reference/pysph/examples/sloshing/sloshing_tank_pitch.py).

The tank boundary follows a prescribed pitching rotation (tangential +
centripetal acceleration field) integrated with one-stage rigid-body
kinematics; the fluid is delta-SPH WCSPH."""

import numpy as np
import jax.numpy as jnp

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.examples.db_geometry import DamBreak3DGeometry
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.solver.tools import DensityCorrection
from pysph_tpu.sph.equation import Equation, Group
from pysph_tpu.sph.integrator import PECIntegrator
from pysph_tpu.sph.integrator_step import (
    OneStageRigidBodyStep, WCSPHStep)
from pysph_tpu.sph.scheme import WCSPHScheme

Umax = np.sqrt(9.81 * 0.75 * 0.62)
c0 = 10.0 * Umax
rho0 = 1000.0
length, width, height = 0.92, 0.46, 0.62
n_layers = 3
theta_0 = 4 * np.pi / 180
omega_r = 2.0
tf = 10.0


class PitchingMotion(Equation):
    """Prescribed pitch: tangential + centripetal acceleration of the
    tank about the y axis (reference sloshing_tank_pitch.py:56)."""

    def __init__(self, dest, sources, theta_0, omega_r):
        self.theta_0 = theta_0
        self.omega_r = omega_r
        super(PitchingMotion, self).__init__(dest, sources)

    def initialize(self, d_idx, d_au, d_aw, t, d_z, d_x):
        omega = self.theta_0 * self.omega_r * jnp.cos(
            self.omega_r * t)
        alpha = -self.theta_0 * self.omega_r ** 2 * jnp.sin(
            self.omega_r * t)
        d_au[d_idx] = d_z[d_idx] * alpha - d_x[d_idx] * omega * omega
        d_aw[d_idx] = -d_x[d_idx] * alpha - d_z[d_idx] * omega * omega


class SloshingTankPitch(Application):
    def add_user_options(self, group):
        group.add_argument('--dx', action='store', type=float,
                           dest='dx', default=0.02)
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=1.2)

    def consume_user_options(self):
        self.dx = self.options.dx
        self.hdx = self.options.hdx
        self.h0 = self.hdx * self.dx

    def create_scheme(self):
        return WCSPHScheme(
            ['fluid'], ['boundary'], dim=3, rho0=rho0, c0=c0,
            h0=1.2 * 0.02, hdx=1.2, gz=-9.81, alpha=0.1, beta=0.0,
            gamma=7.0, hg_correction=True, tensile_correction=False,
            delta_sph=True)

    def create_particles(self):
        geom = DamBreak3DGeometry(
            container_height=height, container_width=width,
            container_length=length,
            fluid_column_height=height * 0.75,
            fluid_column_width=width, fluid_column_length=length,
            nboundary_layers=n_layers, with_obstacle=False,
            dx=self.dx, hdx=self.hdx, rho0=rho0)
        fluid, boundary = geom.create_particles()
        fluid.x[:] = fluid.x - length * 0.5
        boundary.x[:] = boundary.x - length * 0.5
        omega0 = theta_0 * omega_r
        boundary.u[:] = boundary.z * omega0
        boundary.w[:] = -boundary.x * omega0
        self.scheme.setup_properties([fluid, boundary])
        return [fluid, boundary]

    def create_solver(self):
        integrator = PECIntegrator(fluid=WCSPHStep(),
                                   boundary=OneStageRigidBodyStep())
        self.scheme.configure(h0=self.h0, hdx=self.hdx)
        return Solver(kernel=CubicSpline(dim=3), dim=3,
                      integrator=integrator, tf=tf,
                      dt=0.125 * self.h0 / c0,
                      adaptive_timestep=True, fixed_h=False)

    def create_equations(self):
        eqns = self.scheme.get_equations()
        eqns.insert(0, Group(equations=[
            PitchingMotion(dest='boundary', sources=None,
                           theta_0=theta_0, omega_r=omega_r),
        ], real=False))
        return eqns

    def create_tools(self):
        return [DensityCorrection(self, ['fluid', 'boundary'],
                                  corr='shepard', freq=10,
                                  kernel=CubicSpline)]

    def post_process(self, info_fname_or_dir='.'):
        """Pressure probe near the right wall mid-height."""
        from pysph_tpu.solver.output import load
        from pysph_tpu.tools.interpolator import Interpolator
        files = self.output_files
        if not files:
            return
        rows = []
        interp = None
        for f in files:
            data = load(f)
            arrays = list(data['arrays'].values())
            t = float(data['solver_data']['t'])
            if interp is None:
                interp = Interpolator(
                    arrays, x=np.array([length * 0.42]),
                    y=np.array([0.0]), z=np.array([0.93 * height]))
            else:
                interp.update_particle_arrays(arrays)
            p = float(np.asarray(interp.interpolate('p'))[0])
            rows.append((t, p))
        out = np.array(rows)
        np.savez(self.output_dir + '/results.npz', t=out[:, 0],
                 p=out[:, 1])
        print('probe pressure at t=%.2f: %.1f Pa' % tuple(out[-1]))
        return out


if __name__ == '__main__':
    app = SloshingTankPitch()
    app.run()
    app.post_process(app.info_filename)
