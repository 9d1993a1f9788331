"""A rigid cube bouncing inside a rigid tank under gravity (parity
case for /root/reference/pysph/examples/rigid_body/bouncing_cube.py).
Exercises the rigid-body moments/motion pipeline and DEM collisions."""

import numpy as np

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array_rigid_body
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.integrator import EPECIntegrator
from pysph_tpu.sph.rigid_body import (BodyForce, RigidBodyCollision,
                                      RigidBodyMoments,
                                      RigidBodyMotion,
                                      RK2StepRigidBody)

dim = 3
dt = 5e-3
tf = 5.0
gz = -9.81
hdx = 1.0
rho0 = 10.0


class BouncingCube(Application):
    def add_user_options(self, group):
        group.add_argument('--tank-nx', action='store', type=int,
                           dest='tank_nx', default=40,
                           help='Tank lattice resolution.')

    def create_particles(self):
        nx, ny, nz = 10, 10, 10
        dx = 1.0 / (nx - 1)
        x, y, z = np.mgrid[0:1:nx * 1j, 0:1:ny * 1j, 0:1:nz * 1j]
        x = x.ravel()
        y = y.ravel()
        z = (z - 1).ravel()
        m = np.ones_like(x) * dx * dx * rho0
        h = np.ones_like(x) * hdx * dx
        rad_s = np.ones_like(x) * dx
        body = get_particle_array_rigid_body(
            name='body', x=x, y=y, z=z, h=h, m=m, rad_s=rad_s)
        body.vc[0] = -5.0
        body.vc[2] = -5.0

        nx = ny = nz = self.options.tank_nx
        dxt = 1.0 / (nx - 1)
        x, y, z = np.mgrid[-2:2:nx * 1j, -2:2:ny * 1j,
                           -2:2:nz * 1j]
        interior = ((x < 1.8) & (x > -1.8) & (y < 1.8) & (y > -1.8) &
                    (z > -1.8) & (z <= 2))
        keep = ~interior
        x, y, z = x[keep].ravel(), y[keep].ravel(), z[keep].ravel()
        m = np.ones_like(x) * dxt * dxt * rho0
        h = np.ones_like(x) * hdx * dxt
        rad_s = np.ones_like(x) * dxt
        tank = get_particle_array_rigid_body(
            name='tank', x=x, y=y, z=z, h=h, m=m, rad_s=rad_s)
        tank.total_mass[0] = np.sum(m)
        return [body, tank]

    def create_solver(self):
        kernel = CubicSpline(dim=dim)
        integrator = EPECIntegrator(body=RK2StepRigidBody())
        solver = Solver(kernel=kernel, dim=dim, integrator=integrator,
                        dt=dt, tf=tf, adaptive_timestep=False)
        solver.set_print_freq(10)
        return solver

    def create_equations(self):
        return [
            Group(equations=[
                BodyForce(dest='body', sources=None, gz=gz),
                RigidBodyCollision(dest='body', sources=['tank'],
                                   kn=1e4, en=1),
            ]),
            Group(equations=[RigidBodyMoments(dest='body',
                                              sources=None)]),
            Group(equations=[RigidBodyMotion(dest='body',
                                             sources=None)]),
        ]

    def post_process(self, info_fname_or_dir='.'):
        """Track the body's center-of-mass height over time."""
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        rows = []
        for f in files:
            data = load(f)
            body = data['arrays']['body']
            t = float(data['solver_data']['t'])
            rows.append((t, float(np.mean(np.asarray(body.z)))))
        out = np.array(rows)
        np.savez(self.output_dir + '/results.npz', t=out[:, 0],
                 zcm=out[:, 1])
        print('z_cm range: [%.3f, %.3f]' % (out[:, 1].min(),
                                            out[:, 1].max()))
        return out


if __name__ == '__main__':
    app = BouncingCube()
    app.run()
    app.post_process(app.info_filename)
