"""Liquid sloshing in a rectangular tank under horizontal excitation
(parity case for
/root/reference/pysph/examples/sloshing_tank_horizontal.py).

Faltinsen et al., "Multidimensional modal analysis of nonlinear
sloshing in a rectangular tank with finite water depth", JFM 407
(2000) 201-234; water depth h = 0.6 m, forcing period T = 1.3 s."""

import numpy as np
import jax.numpy as jnp

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.equation import Equation, Group
from pysph_tpu.sph.integrator import PECIntegrator
from pysph_tpu.sph.integrator_step import (
    OneStageRigidBodyStep, WCSPHStep)
from pysph_tpu.sph.scheme import WCSPHScheme
from pysph_tpu.tools.geometry import get_2d_block, get_2d_tank

Umax = 2 * np.sqrt(9.81 * 0.6)
c0 = 10.0 * Umax
dx = 0.01
hdx = 1.3
h0 = hdx * dx
n_layers = 3
tf = 10.0
rho = 1000.0
alpha = 0.1
beta = 0.0
gamma = 7.0

length = 1.73
h_tank = 1.15
h_liquid = 0.6
amp = 0.032
T = 1.3
M_PI = np.pi


class HorizontalExcitation(Equation):
    """Prescribed horizontal acceleration of the tank walls."""

    def __init__(self, dest, sources, amp, T):
        self.amp = amp
        self.T = T
        super(HorizontalExcitation, self).__init__(dest, sources)

    def initialize(self, d_idx, d_au, t):
        w = 2 * M_PI / self.T
        d_au[d_idx] = -self.amp * w * w * jnp.cos(w * t)


class SloshingTank(Application):
    def add_user_options(self, group):
        group.add_argument('--dx', action='store', type=float,
                           dest='dx', default=dx)
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=hdx)

    def consume_user_options(self):
        self.dx = self.options.dx
        self.hdx = self.options.hdx
        self.h0 = self.hdx * self.dx

    def create_particles(self):
        dx = self.dx
        m = rho * dx * dx
        xt, yt = get_2d_tank(dx=dx, length=length, height=h_tank,
                             num_layers=n_layers,
                             base_center=[0.0, -dx])
        xf, yf = get_2d_block(dx=dx, length=length - 2 * dx,
                              height=h_liquid,
                              center=[0.0, h_liquid * 0.5])
        fluid = get_particle_array(name='fluid', x=xf, y=yf,
                                   h=self.h0, m=m, rho=rho)
        solid = get_particle_array(name='solid', x=xt, y=yt,
                                   h=self.h0, m=m, rho=rho)
        self.scheme.setup_properties([fluid, solid])
        return [fluid, solid]

    def create_solver(self):
        kernel = CubicSpline(dim=2)
        integrator = PECIntegrator(fluid=WCSPHStep(),
                                   solid=OneStageRigidBodyStep())
        dt = 0.5 * self.dx / (1.1 * c0)
        self.scheme.configure(h0=self.h0, hdx=self.hdx)
        return Solver(kernel=kernel, dim=2, integrator=integrator,
                      tf=tf, dt=dt, adaptive_timestep=True,
                      fixed_h=False)

    def create_scheme(self):
        return WCSPHScheme(
            ['fluid'], ['solid'], dim=2, rho0=rho, c0=c0, h0=h0,
            hdx=hdx, gy=-9.81, alpha=alpha, beta=beta, gamma=gamma,
            hg_correction=True, tensile_correction=False)

    def create_equations(self):
        eqns = self.scheme.get_equations()
        eqns.insert(0, Group(equations=[
            HorizontalExcitation(dest='solid', sources=None, amp=amp,
                                 T=T)], real=False))
        return eqns

    def post_process(self, info_fname_or_dir='.'):
        """Wave height 0.05 m from the left wall over time."""
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        probe_x = -length / 2 + 0.05
        t, eta = [], []
        for f in files:
            data = load(f)
            fl = data['arrays']['fluid']
            x = np.asarray(fl.x)
            y = np.asarray(fl.y)
            near = np.abs(x - probe_x) < 2 * self.dx
            t.append(data['solver_data']['t'])
            eta.append(float(y[near].max()) if near.any() else np.nan)
        np.savez(self.output_dir + '/results.npz', t=np.asarray(t),
                 eta=np.asarray(eta))
        return t, eta


if __name__ == '__main__':
    app = SloshingTank()
    app.run()
    app.post_process(app.info_filename)
