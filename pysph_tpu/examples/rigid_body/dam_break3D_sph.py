"""3D dam break impacting a rigid block: fluid-rigid coupling at
scale (parity case for
/root/reference/pysph/examples/rigid_body/dam_break3D_sph.py; the
reference's "SPH"-lettered obstacle mesh is replaced by a solid block
since the mesh data file isn't shipped).

WCSPH fluid + wall boundary + a rigid body integrated with RK2 rigid
kinematics; the fluid pushes the body (PressureRigidBody) and the
body collides with the wall (GPU-Gems penalty force)."""

import numpy as np

from pysph_tpu.base.kernels import WendlandQuintic
from pysph_tpu.base.utils import get_particle_array_rigid_body
from pysph_tpu.examples.db_geometry import DamBreak3DGeometry
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.basic_equations import (
    ContinuityEquation, XSPHCorrection)
from pysph_tpu.sph.equation import Group
from pysph_tpu.sph.integrator import EPECIntegrator
from pysph_tpu.sph.integrator_step import WCSPHStep
from pysph_tpu.sph.rigid_body import (
    BodyForce, NumberDensity, PressureRigidBody, RigidBodyForceGPUGems,
    RigidBodyMoments, RigidBodyMotion, RK2StepRigidBody)
from pysph_tpu.sph.wc.basic import (
    MomentumEquation, TaitEOS, TaitEOSHGCorrection)

dim = 3
tf = 2.0
nboundary_layers = 3
hdx = 1.2
rho0 = 1000.0
gamma = 7.0
alpha = 0.5
beta = 0.0


class DamBreak3DRigid(Application):
    def add_user_options(self, group):
        group.add_argument('--dx', action='store', type=float,
                           dest='dx', default=0.02)

    def consume_user_options(self):
        self.dx = self.options.dx
        self.geom = DamBreak3DGeometry(
            dx=self.dx, nboundary_layers=nboundary_layers, hdx=hdx,
            rho0=rho0, with_obstacle=False)
        self.co = 10.0 * self.geom.get_max_speed(g=9.81)

    def create_particles(self):
        fluid, boundary = self.geom.create_particles()
        dx = self.dx
        # a floating rigid block downstream of the dam
        bx, by, bz = np.mgrid[2.3:2.3 + 8 * dx:dx,
                              -0.2:0.2 + 1e-9:dx,
                              0.05:0.05 + 10 * dx:dx]
        bx, by, bz = bx.ravel(), by.ravel(), bz.ravel()
        m0 = float(np.asarray(fluid.m)[0])
        h0 = float(np.asarray(fluid.h)[0])
        obstacle = get_particle_array_rigid_body(
            name='obstacle', x=bx, y=by, z=bz,
            m=np.full_like(bx, 0.5 * m0),
            h=np.full_like(bx, h0),
            rho=np.full_like(bx, 0.5 * rho0))
        obstacle.total_mass[0] = float(np.sum(0.5 * m0 *
                                              np.ones_like(bx)))
        obstacle.add_property('cs')
        obstacle.add_property('arho')
        boundary.add_property('V')
        for p in ('fx', 'fy', 'fz'):
            boundary.add_property(p)
        print('rigid dam break: %d fluid, %d boundary, %d obstacle'
              % (fluid.get_number_of_particles(),
                 boundary.get_number_of_particles(),
                 obstacle.get_number_of_particles()))
        return [fluid, boundary, obstacle]

    def create_solver(self):
        integrator = EPECIntegrator(fluid=WCSPHStep(),
                                    obstacle=RK2StepRigidBody(),
                                    boundary=WCSPHStep())
        return Solver(kernel=WendlandQuintic(dim=dim), dim=dim,
                      tf=tf, dt=1e-5, integrator=integrator,
                      adaptive_timestep=True, n_damp=0)

    def create_equations(self):
        co = self.co
        return [
            Group(equations=[
                BodyForce(dest='obstacle', sources=None, gz=-9.81),
                NumberDensity(dest='obstacle', sources=['obstacle']),
                NumberDensity(dest='boundary', sources=['boundary']),
            ]),
            Group(equations=[
                TaitEOS(dest='fluid', sources=None, rho0=rho0,
                        c0=co, gamma=gamma),
                TaitEOSHGCorrection(dest='boundary', sources=None,
                                    rho0=rho0, c0=co, gamma=gamma),
                TaitEOSHGCorrection(dest='obstacle', sources=None,
                                    rho0=rho0, c0=co, gamma=gamma),
            ], real=False),
            Group(equations=[
                ContinuityEquation(
                    dest='fluid',
                    sources=['fluid', 'boundary', 'obstacle']),
                ContinuityEquation(dest='boundary',
                                   sources=['fluid']),
                ContinuityEquation(dest='obstacle',
                                   sources=['fluid']),
                MomentumEquation(dest='fluid',
                                 sources=['fluid', 'boundary'],
                                 alpha=alpha, beta=beta, gz=-9.81,
                                 c0=co, tensile_correction=True),
                PressureRigidBody(dest='fluid',
                                  sources=['obstacle'], rho0=rho0),
                XSPHCorrection(dest='fluid', sources=['fluid']),
                RigidBodyForceGPUGems(dest='obstacle',
                                      sources=['boundary'], k=1.0,
                                      d=2.0, eta=0.1, kt=0.1),
            ]),
            Group(equations=[RigidBodyMoments(dest='obstacle',
                                              sources=None)]),
            Group(equations=[RigidBodyMotion(dest='obstacle',
                                             sources=None)]),
        ]

    def post_process(self, info_fname_or_dir='.'):
        """Track the rigid body's center of mass over time."""
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
                         float(np.mean(np.asarray(obst.z)))))
        out = np.array(rows)
        np.savez(self.output_dir + '/results.npz', t=out[:, 0],
                 xcm=out[:, 1], zcm=out[:, 2])
        print('body center at t=%.2f: x=%.3f z=%.3f' % tuple(out[-1]))
        return out


if __name__ == '__main__':
    app = DamBreak3DRigid()
    app.run()
    app.post_process(app.info_filename)
