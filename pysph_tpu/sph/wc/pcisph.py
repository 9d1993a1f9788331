"""Predictive-Corrective Incompressible SPH [SolPaj2009] (parity with
/root/reference/pysph/sph/wc/pcisph.py).

The prediction-correction loop is the engine's iterated group
(``lax.while_loop``); the density-error convergence test runs on
device through the ``pcisph_err`` constant instead of the reference's
host-side ``self.rho_err`` attribute.  The reference's
``s_m[d_idx]`` read in the pressure gradient (pcisph.py:224) is
written as ``d_m[d_idx]`` here — identical when dest and source are
the same fluid array, which is the only configuration the scheme
supports.
"""

import numpy as np

from pysph_tpu.sph.equation import Equation, Group


def get_particle_array_pcisph(constants=None, **props):
    """PCISPH particle array factory (reference pcisph.py:30)."""
    from pysph_tpu.base.utils import get_particle_array
    pcisph_props = [
        'au', 'av', 'aw', 'arho', 'dwij2', 'u0', 'v0', 'w0', 'aup',
        'avp', 'awp', 'x0', 'y0', 'z0', 'rho0',
    ]
    pa = get_particle_array(constants=constants,
                            additional_props=pcisph_props, **props)
    pa.add_constant('iters', np.zeros(2))
    pa.add_constant('pcisph_err', np.zeros(1))
    pa.add_property('dw', stride=3)
    pa.add_output_arrays(['p', 'dwij2'])
    return pa


class MomentumEquationViscosity(Equation):
    """Viscous + body-force acceleration, then a velocity predictor
    (reference pcisph.py:100)."""

    def __init__(self, dest, sources, nu=0.0, gx=0.0, gy=0.0, gz=0.0):
        self.nu = nu
        self.gx = gx
        self.gy = gy
        self.gz = gz
        super(MomentumEquationViscosity, self).__init__(dest, sources)

    def initialize(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] = self.gx
        d_av[d_idx] = self.gy
        d_aw[d_idx] = self.gz

    def loop(self, d_idx, s_idx, s_m, d_rho, s_rho, d_au, d_av, d_aw,
             DWIJ, XIJ, VIJ, R2IJ, EPS):
        mb = s_m[s_idx]
        rhoij = d_rho[d_idx] + s_rho[s_idx]
        xdotdwij = (DWIJ[0] * XIJ[0] + DWIJ[1] * XIJ[1] +
                    DWIJ[2] * XIJ[2])
        tmp = mb * 4 * self.nu * xdotdwij / (rhoij * (R2IJ + EPS))
        d_au[d_idx] += tmp * VIJ[0]
        d_av[d_idx] += tmp * VIJ[1]
        d_aw[d_idx] += tmp * VIJ[2]

    def post_loop(self, d_idx, d_au, d_av, d_aw, d_u, d_v, d_w, d_aup,
                  d_avp, d_awp, dt):
        d_u[d_idx] += dt * d_au[d_idx]
        d_v[d_idx] += dt * d_av[d_idx]
        d_w[d_idx] += dt * d_aw[d_idx]
        d_aup[d_idx] = 0.0
        d_avp[d_idx] = 0.0
        d_awp[d_idx] = 0.0


class Predict(Equation):
    """Advance positions/velocities with the current pressure force
    (reference pcisph.py:127)."""

    def initialize(self, d_idx, d_u, d_v, d_w, d_aup, d_avp, d_awp,
                   d_x, d_y, d_z, d_au, d_av, d_aw, d_u0, d_v0, d_w0,
                   d_x0, d_y0, d_z0, dt):
        d_u[d_idx] = d_u0[d_idx] + dt * (d_au[d_idx] + d_aup[d_idx])
        d_v[d_idx] = d_v0[d_idx] + dt * (d_av[d_idx] + d_avp[d_idx])
        d_w[d_idx] = d_w0[d_idx] + dt * (d_aw[d_idx] + d_awp[d_idx])
        d_x[d_idx] = d_x0[d_idx] + dt * d_u[d_idx]
        d_y[d_idx] = d_y0[d_idx] + dt * d_v[d_idx]
        d_z[d_idx] = d_z0[d_idx] + dt * d_w[d_idx]


class ComputePressure(Equation):
    """Pressure correction from the density error and the PCISPH
    delta factor (reference pcisph.py:142)."""

    def __init__(self, dest, sources, rho0):
        self.rho0 = rho0
        super(ComputePressure, self).__init__(dest, sources)

    def initialize(self, d_idx, d_dw, d_dwij2):
        d_dw[3 * d_idx + 0] = 0.0
        d_dw[3 * d_idx + 1] = 0.0
        d_dw[3 * d_idx + 2] = 0.0
        d_dwij2[d_idx] = 0.0

    def loop(self, d_idx, d_dw, d_dwij2, DWIJ):
        d_dw[3 * d_idx + 0] += DWIJ[0]
        d_dw[3 * d_idx + 1] += DWIJ[1]
        d_dw[3 * d_idx + 2] += DWIJ[2]
        d_dwij2[d_idx] += (DWIJ[0] * DWIJ[0] + DWIJ[1] * DWIJ[1] +
                           DWIJ[2] * DWIJ[2])

    def post_loop(self, d_idx, d_dw, d_m, dt, d_dwij2, d_p, d_rho):
        import jax.numpy as jnp
        dwx = d_dw[3 * d_idx + 0]
        dwy = d_dw[3 * d_idx + 1]
        dwz = d_dw[3 * d_idx + 2]
        tmp = dwx * dwx + dwy * dwy + dwz * dwz

        mi = d_m[d_idx]
        rho0 = self.rho0
        beta = 2 * mi * mi * (dt / rho0) * (dt / rho0)
        denom = beta * (tmp + d_dwij2[d_idx])
        delta = jnp.where(denom > 0.0, 1.0 / jnp.where(denom > 0.0,
                                                       denom, 1.0),
                          0.0)
        rho_err = d_rho[d_idx] - rho0
        d_p[d_idx] += delta * rho_err


class MomentumEquationPressureGradient(Equation):
    """Pressure-gradient acceleration + device-side convergence check
    (reference pcisph.py:174)."""

    def __init__(self, dest, sources, rho0, tolerance, debug):
        self.rho0 = rho0
        self.tolerance = tolerance
        self.debug = debug
        super(MomentumEquationPressureGradient,
              self).__init__(dest, sources)

    def initialize(self, d_idx, d_aup, d_avp, d_awp):
        d_aup[d_idx] = 0.0
        d_avp[d_idx] = 0.0
        d_awp[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_p, s_p, d_rho, s_rho, d_m, d_aup,
             d_avp, d_awp, DWIJ):
        rhoi2 = 1.0 / (d_rho[d_idx] * d_rho[d_idx])
        rhoj2 = 1.0 / (s_rho[s_idx] * s_rho[s_idx])
        mj = d_m[d_idx]
        pij = -1.0 * mj * (d_p[d_idx] * rhoi2 + s_p[s_idx] * rhoj2)
        d_aup[d_idx] += pij * DWIJ[0]
        d_avp[d_idx] += pij * DWIJ[1]
        d_awp[d_idx] += pij * DWIJ[2]

    def reduce(self, dst, t, dt):
        import jax.numpy as jnp
        mask = dst.active
        n = jnp.maximum(jnp.sum(jnp.where(mask, 1.0, 0.0)), 1.0)
        err = jnp.sum(jnp.where(
            mask, jnp.abs(dst.rho[:] / self.rho0 - 1.0), 0.0)) / n
        dst.pcisph_err[0] = err
        dst.iters[0] = dst.iters[0] + 1.0

    def converged(self, dst):
        import jax.numpy as jnp
        return jnp.where(dst.pcisph_err[0] > self.tolerance, -1.0, 1.0)


from pysph_tpu.sph.integrator import Integrator  # noqa: E402
from pysph_tpu.sph.integrator_step import IntegratorStep  # noqa: E402
from pysph_tpu.sph.scheme import Scheme, add_bool_argument  # noqa: E402


class PCISPHIntegrator(Integrator):
    """Single-evaluation integrator; the prediction-correction loop
    lives inside the equation groups (reference pcisph.py:39)."""

    def one_timestep(self, t, dt):
        self.initialize()
        self.compute_accelerations(0)
        self.stage1()
        self.update_domain()
        self.do_post_stage(dt, 1)

    def initial_acceleration(self, states, t, dt):
        """No-op (reference pcisph.py:47): the predictor needs x0/u0
        set by the stepper first, so no evaluation before step one."""
        return dict(states), self._fresh_diag(), None


class PCISPHStep(IntegratorStep):
    """PCISPH stepper (reference pcisph.py:54)."""

    def __init__(self, show_itercount=False):
        self.show_itercount = show_itercount

    def initialize(self, d_idx, d_u, d_v, d_w, d_u0, d_v0, d_w0, d_x,
                   d_y, d_z, d_x0, d_y0, d_z0, d_rho, d_rho0):
        d_u0[d_idx] = d_u[d_idx]
        d_v0[d_idx] = d_v[d_idx]
        d_w0[d_idx] = d_w[d_idx]
        d_x0[d_idx] = d_x[d_idx]
        d_y0[d_idx] = d_y[d_idx]
        d_z0[d_idx] = d_z[d_idx]
        d_rho0[d_idx] = d_rho[d_idx]

    def stage1(self, d_idx, d_u, d_v, d_w, d_au, d_av, d_aw, d_x, d_y,
               d_z, d_aup, d_avp, d_awp, d_u0, d_v0, d_w0, d_x0, d_y0,
               d_z0, dt):
        d_u[d_idx] = d_u0[d_idx] + dt * (d_au[d_idx] + d_aup[d_idx])
        d_v[d_idx] = d_v0[d_idx] + dt * (d_av[d_idx] + d_avp[d_idx])
        d_w[d_idx] = d_w0[d_idx] + dt * (d_aw[d_idx] + d_awp[d_idx])
        d_x[d_idx] = d_x0[d_idx] + dt * d_u[d_idx]
        d_y[d_idx] = d_y0[d_idx] + dt * d_v[d_idx]
        d_z[d_idx] = d_z0[d_idx] + dt * d_w[d_idx]


class PCISPHScheme(Scheme):
    """PCISPH scheme (reference pcisph.py:251)."""

    def __init__(self, fluids, dim, rho0, nu, gx=0.0, gy=0.0, gz=0.0,
                 tolerance=0.1, debug=False, show_itercount=False):
        self.fluids = fluids
        self.solver = None
        self.dim = dim
        self.rho0 = rho0
        self.nu = nu
        self.gx = gx
        self.gy = gy
        self.gz = gz
        self.tolerance = tolerance
        self.debug = debug
        self.show_itercount = show_itercount

    def add_user_options(self, group):
        group.add_argument(
            '--pcisph-tol', action='store', type=float,
            dest='tolerance', default=None,
            help='Relative density-error tolerance for convergence.')
        add_bool_argument(
            group, 'pcisph-debug', dest='debug', default=None,
            help='Debug output on convergence of iterations.')
        add_bool_argument(
            group, 'pcisph-itercount', dest='show_itercount',
            default=False, help='Print the iteration count.')

    def consume_user_options(self, options):
        data = dict((var, self._smart_getattr(options, var)) for var in
                    ('tolerance', 'debug', 'show_itercount'))
        self.configure(**data)

    def configure_solver(self, kernel=None, integrator_cls=None,
                         extra_steppers=None, **kw):
        from pysph_tpu.base.kernels import QuinticSpline
        from pysph_tpu.solver.solver import Solver
        if kernel is None:
            kernel = QuinticSpline(dim=self.dim)
        steppers = {}
        if extra_steppers is not None:
            steppers.update(extra_steppers)
        for fluid in self.fluids:
            if fluid not in steppers:
                steppers[fluid] = PCISPHStep(self.show_itercount)
        cls = PCISPHIntegrator if integrator_cls is None else \
            integrator_cls
        integrator = cls(**steppers)
        self.solver = Solver(dim=self.dim, integrator=integrator,
                             kernel=kernel, **kw)

    def get_equations(self):
        from pysph_tpu.sph.basic_equations import SummationDensity
        all = self.fluids
        equations = []
        equations.append(Group(equations=[
            MomentumEquationViscosity(
                dest=fluid, sources=all, nu=self.nu, gx=self.gx,
                gy=self.gy, gz=self.gz)
            for fluid in self.fluids]))

        g2 = []
        g2.append(Group(equations=[
            Predict(dest=fluid, sources=None)
            for fluid in self.fluids], update_nnps=True))
        g2.append(Group(equations=[
            SummationDensity(dest=fluid, sources=all)
            for fluid in self.fluids]))
        g2.append(Group(equations=[
            ComputePressure(dest=fluid, sources=all, rho0=self.rho0)
            for fluid in self.fluids], update_nnps=True))
        g2.append(Group(equations=[
            MomentumEquationPressureGradient(
                dest=fluid, sources=all, rho0=self.rho0,
                tolerance=self.tolerance, debug=self.debug)
            for fluid in self.fluids]))
        equations.append(Group(equations=g2, iterate=True,
                               max_iterations=500, min_iterations=2))
        return equations

    def setup_properties(self, particles, clean=True):
        particle_arrays = dict((p.name, p) for p in particles)
        dummy = get_particle_array_pcisph(name='junk')
        props = list(dummy.properties.keys())
        output_props = dummy.output_property_arrays
        for fluid in self.fluids:
            pa = particle_arrays[fluid]
            for prop in props:
                if prop not in pa.properties:
                    pa.add_property(prop, stride=dummy.stride.get(
                        prop, 1))
            pa.set_output_arrays(output_props)
            for cname, cval in dummy.constants.items():
                if cname not in pa.constants:
                    pa.add_constant(cname, np.array(cval))
