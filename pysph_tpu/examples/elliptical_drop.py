"""Evolution of a circular patch of incompressible fluid (Monaghan 1994).

Parity case for /root/reference/pysph/examples/elliptical_drop.py: an
initially circular fluid patch under an incompressible velocity field
deforms into an ellipse of conserved area; the semi-axis evolution has an
exact ODE solution used for validation.
"""

import os

import numpy as np

from pysph_tpu.base.kernels import Gaussian
from pysph_tpu.base.utils import get_particle_array
from pysph_tpu.solver.application import Application
from pysph_tpu.sph.integrator import EPECIntegrator
from pysph_tpu.sph.iisph import IISPHScheme
from pysph_tpu.sph.scheme import SchemeChooser, WCSPHScheme


def _axis_rate(state, t):
    A, a = state
    return np.array([A * A * (a ** 4 - 1) / (a ** 4 + 1), -a * A])


def exact_solution(tf=0.0075, dt=1e-6, n=101):
    """Integrate the semi-axis ODE (reference elliptical_drop.py:54-80).

    Returns (a, A, p0, x, y) with x/y tracing the ellipse."""
    y = np.array([100.0, 1.0])
    t = 0.0
    while t <= tf:
        t += dt
        y = y + dt * _axis_rate(y, t)
    Anew, anew = y
    dadt = _axis_rate([Anew, anew], tf)[0]
    po = 0.5 * -anew ** 2 * (dadt - Anew ** 2)
    theta = np.linspace(0, 2 * np.pi, n)
    return anew, Anew, po, anew * np.cos(theta), \
        1 / anew * np.sin(theta)


class EllipticalDrop(Application):
    def initialize(self):
        self.co = 1400.0
        self.ro = 1.0
        self.hdx = 1.3
        self.dx = 0.025
        self.alpha = 0.1

    def add_user_options(self, group):
        group.add_argument(
            '--nx', action='store', type=int, dest='nx', default=40,
            help='Number of points along x direction.')

    def consume_user_options(self):
        self.dx = 1.0 / self.options.nx

    def create_scheme(self):
        wcsph = WCSPHScheme(
            ['fluid'], [], dim=2, rho0=self.ro, c0=self.co,
            h0=self.dx * self.hdx, hdx=self.hdx, gamma=7.0, alpha=0.1,
            beta=0.0)
        iisph = IISPHScheme(['fluid'], [], dim=2, rho0=self.ro)
        return SchemeChooser(default='wcsph', wcsph=wcsph, iisph=iisph)

    def configure_scheme(self):
        scheme = self.scheme
        kernel = Gaussian(dim=2)
        tf = 0.0076
        dt = 0.25 * self.hdx * self.dx / (141 + self.co)
        if self.options.scheme == 'iisph':
            dt = 2e-4
            scheme.configure_solver(
                kernel=kernel, dt=dt, tf=tf, adaptive_timestep=True)
        else:
            scheme.configure(h0=self.hdx * self.dx)
            scheme.configure_solver(
                kernel=kernel, integrator_cls=EPECIntegrator, dt=dt,
                tf=tf, adaptive_timestep=True, cfl=0.3, n_damp=50,
                output_at_times=[0.0008, 0.0038])

    def create_particles(self):
        """Circular patch of particles with the initial strain field."""
        dx = self.dx
        hdx = self.hdx
        co = self.co
        ro = self.ro
        span = np.arange(-1.05, 1.05 + 1e-9, dx)
        x, y = np.meshgrid(span, span)
        x = x.ravel()
        y = y.ravel()
        r2 = x * x + y * y
        keep = r2 < 1.0
        x = x[keep]
        y = y[keep]
        m = np.ones_like(x) * dx * dx
        h = np.ones_like(x) * hdx * dx
        rho = np.ones_like(x) * ro
        u = -100.0 * x
        v = 100.0 * y
        cs = np.ones_like(x) * co
        pa = get_particle_array(name='fluid', x=x, y=y, m=m, rho=rho,
                                h=h, u=u, v=v, cs=cs)
        print('Elliptical drop: %d particles' % len(x))
        return [pa]

    def _compute_semi_axes(self, pa):
        x = pa.x
        y = pa.y
        return np.max(np.abs(x)), np.max(np.abs(y))

    def post_process(self, info_fname_or_dir='.'):
        """Compare the semi-major axis with the exact solution."""
        from pysph_tpu.solver.output import load
        files = self.output_files
        if not files:
            return
        data = load(files[-1])
        fluid = data['arrays']['fluid']
        tf = float(data['solver_data']['t'])
        a_exact = exact_solution(tf)[0]
        # measured semi-minor axis from particle extents along x
        a_num = np.max(np.abs(np.asarray(fluid.x))) - self.dx * 0.5
        result = dict(t=tf, a_exact=float(a_exact), a_num=float(a_num))
        out = os.path.join(self.output_dir, 'results.npz')
        np.savez(out, **result)
        print('Exact semi-minor axis: %.5f, computed: %.5f' %
              (a_exact, a_num))
        return result


if __name__ == '__main__':
    app = EllipticalDrop()
    app.run()
    app.post_process(app.info_filename)
