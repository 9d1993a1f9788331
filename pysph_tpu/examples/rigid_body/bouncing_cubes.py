"""Four cubes bouncing inside a box — tests the rigid-body equations
with multiple bodies in one array (parity case for
/root/reference/pysph/examples/rigid_body/bouncing_cubes.py)."""

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
rho0 = 100.0


def make_cube(lx, ly, lz, dx):
    """Points of a cube centered at the origin with given lengths."""
    lx, ly, lz = float(lx), float(ly), float(lz)
    x, y, z = np.mgrid[-lx / 2:lx / 2 + dx:dx,
                       -ly / 2:ly / 2 + dx:dx,
                       -lz / 2:lz / 2 + dx:dx]
    return x.ravel(), y.ravel(), z.ravel()


class BouncingCubes(Application):
    def create_particles(self):
        dx = 1.0 / 9.0
        _x, _y, _z = make_cube(0.5, 0.5, 0.5, dx)
        _z = _z + 1.0
        _id = np.ones(_x.shape, dtype=int)
        xs, ys, zs, ids = [], [], [], []
        disp = [(0.4, 0, 0), (-0.4, 0, 0), (0.0, 1.0, 0.0),
                (0.0, -1.0, 0.0)]
        for i, d in enumerate(disp):
            xs.append(_x + d[0])
            ys.append(_y + d[1])
            zs.append(_z + d[2])
            ids.append(_id * i)
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        z = np.concatenate(zs)
        body_id = np.concatenate(ids)
        m = np.ones_like(x) * dx ** 3 * rho0
        h = np.ones_like(x) * hdx * dx
        body = get_particle_array_rigid_body(
            name='body', x=x, y=y, z=z, h=h, rho=rho0, m=m,
            body_id=body_id, rad_s=np.full_like(x, dx))
        body.vc[0] = 5.0
        body.vc[2] = -5.0
        body.vc[6] = -5.0
        body.vc[7] = -5.0
        body.vc[10] = 5.0

        nx, ny, nz = 40, 40, 40
        xmin, xmax = -2.1, 2.1
        dx = (xmax - xmin) / (nx - 1)
        x, y, z = np.mgrid[xmin:xmax:nx * 1j, xmin:xmax:ny * 1j,
                           xmin:xmax:nz * 1j]
        interior = (((x < 1.8) & (x > -1.8)) &
                    ((y < 1.8) & (y > -1.8)) &
                    ((z > -1.8) & (z <= 2)))
        sel = ~interior
        x, y, z = x[sel].ravel(), y[sel].ravel(), z[sel].ravel()
        m = np.ones_like(x) * dx ** 3 * rho0
        h = np.ones_like(x) * hdx * dx
        tank = get_particle_array_rigid_body(
            name='tank', x=x, y=y, z=z, h=h, m=m,
            rad_s=np.full_like(x, dx), rho=rho0)
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
                RigidBodyCollision(dest='body',
                                   sources=['tank', 'body'],
                                   kn=1e4, en=0.8)]),
            Group(equations=[RigidBodyMoments(dest='body',
                                              sources=None)]),
            Group(equations=[RigidBodyMotion(dest='body',
                                             sources=None)]),
        ]


if __name__ == '__main__':
    app = BouncingCubes()
    app.run()
