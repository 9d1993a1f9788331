"""Shallow-water sloshing: large-amplitude sway motion of a tank with
a shallow water layer — Series 5 of Bouscasse, Antuono, Colagrossi &
Lugni (2013), DOI:10.1515/ijnsns-2012-0100 (parity case for
/root/reference/pysph/examples/sloshing/st_bouscasse.py)."""

import os
from math import pi, sqrt, tanh

import numpy as np
import jax.numpy as jnp

from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.solver.solver import Solver
from pysph_tpu.sph.equation import Equation
from pysph_tpu.sph.integrator import EPECIntegrator
from pysph_tpu.sph.wc.edac import EDACScheme, EDACStep
from pysph_tpu.tools.geometry import get_2d_block, get_2d_tank

L = 1  # length of tank
h = 0.03 * L  # water height
amp = 2.333 * h  # sway amplitude

u_max = 1.3
c0 = 10.0 * u_max

dx = h / 6
hdx = 1.2
h0 = hdx * dx
n_layers = 4

tf = 33
rho = 1000.0

k = pi / L
omega_r = sqrt(9.81 * k * tanh(k * h))
omega = omega_r * 1.231


class HorizontalExcitation(Equation):
    """Sway acceleration of the (non-inertial) tank frame."""

    def __init__(self, dest, sources):
        self.amp = amp
        self.omega = omega
        super(HorizontalExcitation, self).__init__(dest, sources)

    def initialize(self, d_idx, d_au, t=0.0):
        w = self.omega
        d_au[d_idx] += self.amp * w * w * jnp.sin(w * t)


class SloshingTank(Application):
    def add_user_options(self, group):
        group.add_argument('--dx', action='store', type=float,
                           dest='dx', default=dx,
                           help='Particle spacing.')
        group.add_argument('--hdx', action='store', type=float,
                           dest='hdx', default=hdx,
                           help='h = hdx * dx.')

    def consume_user_options(self):
        self.hdx = self.options.hdx
        self.dx = self.options.dx
        self.h0 = self.hdx * self.dx

    def create_particles(self):
        dxl = self.dx
        m = rho * dxl * dxl
        xt, yt = get_2d_tank(dx=dxl, length=L, height=0.2 * L,
                             num_layers=n_layers,
                             base_center=[L / 2, -dxl])
        xf, yf = get_2d_block(dx=dxl, length=L - 2 * dxl, height=h,
                              center=[L / 2, h / 2])
        fluid = get_particle_array(name='fluid', x=xf, y=yf,
                                   h=self.h0, m=m, rho=rho)
        solid = get_particle_array(name='solid', x=xt, y=yt,
                                   h=self.h0, m=m, rho=rho)
        fluid.u = -amp * omega * np.ones_like(xf)
        self.scheme.setup_properties([fluid, solid])
        return [fluid, solid]

    def create_solver(self):
        kernel = CubicSpline(dim=2)
        integrator = EPECIntegrator(fluid=EDACStep())
        dt = 0.125 * self.h0 / c0
        self.scheme.configure(h=self.h0)
        return Solver(kernel=kernel, dim=2, integrator=integrator,
                      tf=tf, dt=dt)

    def create_scheme(self):
        return EDACScheme(['fluid'], ['solid'], dim=2, rho0=rho,
                          c0=c0, gy=-9.81, alpha=0.0, nu=0.0, h=h0,
                          clamp_p=True)

    def create_equations(self):
        eqns = self.scheme.get_equations()
        eqns[1].equations.insert(
            -1, HorizontalExcitation(dest='fluid', sources=None))
        return eqns

    def post_process(self, info_fname):
        """Wave height 0.05 m from the left wall vs time, against
        the Bouscasse et al. (2013) experiment."""
        if len(self.output_files) == 0:
            return
        from pysph_tpu.solver.output import load
        wave_height, t = [], []
        for fname in self.output_files:
            data = load(fname)
            fluid = data['arrays']['fluid']
            solid = data['arrays']['solid']
            t.append(data['solver_data']['t'])
            x_left = np.asarray(solid.x).min()
            probe_x = x_left + 0.05 + self.dx * (n_layers - 1)
            x = np.asarray(fluid.x)
            y = np.asarray(fluid.y)
            near = np.abs(x - probe_x) < self.dx
            wave_height.append(y[near].max() if near.any() else 0.0)
        wave_height = np.array(wave_height) - h
        T = 2 * pi / omega
        t = np.array(t) / T
        fname_res = os.path.join(self.output_dir, 'results.npz')
        np.savez(fname_res, t=t, wave_height=wave_height)
        return t, wave_height


if __name__ == '__main__':
    app = SloshingTank()
    app.run()
    app.post_process(app.info_filename)
