"""Incompressible SPH — divergence-free projection (parity with
/root/reference/pysph/sph/isph/isph.py, Cummins & Rudman 1999).

TPU-native redesign of the pressure Poisson solve: the reference
assembles an explicit scipy CSR matrix on the host (``coeff``/
``col_idx``/``row_idx`` strided properties, isph.py:157) and calls
``bicgstab`` in ``py_initialize``.  Here the PPE is solved MATRIX-FREE
on device: the Laplacian row sum

    (A p)_i = diag_i p_i - sum_j fac_ij p_j

is itself an SPH pair operator, so the conjugate-gradient iteration is
expressed as an iterated equation group — each matvec is one stencil
sweep (dense, gather-free), and the CG scalars live in particle-array
constants.  ``PressureCoeffMatrix`` therefore only accumulates the
diagonal; the off-diagonal action is recomputed on the fly each
iteration (cheaper on TPU than materializing a 100-wide sparse row
block per particle).

The default scheme path has a symmetric operator, so CG applies; the
free-surface Dirichlet rows (``FreeSurfaceBoundaryCondition``) are
honored matrix-free through the ``fsurf`` flag.
"""

import jax.numpy as jnp
import numpy

from pysph_tpu.sph.equation import Equation, Group


def get_particle_array_isph(constants=None, **props):
    """ISPH particle array factory (reference isph.py:17).  The sparse
    matrix row storage of the reference is replaced by the CG work
    vectors."""
    from pysph_tpu.base.utils import get_particle_array
    isph_props = [
        'u0', 'v0', 'w0', 'x0', 'y0', 'z0', 'rho0', 'diag', 'rhs',
        'V0', 'V', 'au', 'av', 'aw',
        'cg_r', 'cg_d', 'cg_ap', 'fsurf',
    ]
    consts = {'cg_scal': numpy.zeros(4)}
    if constants:
        consts.update(constants)
    pa = get_particle_array(additional_props=isph_props,
                            constants=consts, **props)
    pa.add_output_arrays(['p'])
    return pa


class MomentumEquationBodyForce(Equation):
    """(reference isph.py:103)"""

    def __init__(self, dest, sources, gx=0.0, gy=0.0, gz=0.0):
        self.gx = gx
        self.gy = gy
        self.gz = gz
        super(MomentumEquationBodyForce, self).__init__(dest, sources)

    def initialize(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0

    def post_loop(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] += self.gx
        d_av[d_idx] += self.gy
        d_aw[d_idx] += self.gz


class VelocityDivergence(Equation):
    """PPE right-hand side from the predicted velocity divergence
    (reference isph.py:121)."""

    def initialize(self, d_idx, d_rhs):
        d_rhs[d_idx] = 0.0

    def loop(self, d_idx, s_idx, s_m, s_rho, d_rhs, dt, VIJ, DWIJ):
        Vj = s_m[s_idx] / s_rho[s_idx]
        vdotdwij = (VIJ[0] * DWIJ[0] + VIJ[1] * DWIJ[1] +
                    VIJ[2] * DWIJ[2])
        d_rhs[d_idx] += -Vj * vdotdwij / dt


class VelocityDivergenceDFDI(Equation):
    """(reference isph.py:131)"""

    def initialize(self, d_idx, d_rhs):
        d_rhs[d_idx] = 0.0

    def loop(self, d_idx, s_idx, s_m, s_rho, d_rhs, dt, VIJ, DWIJ):
        Vj = s_m[s_idx] / s_rho[s_idx]
        vdotdwij = (VIJ[0] * DWIJ[0] + VIJ[1] * DWIJ[1] +
                    VIJ[2] * DWIJ[2])
        d_rhs[d_idx] += -2 * Vj * vdotdwij / dt


class DensityInvariance(Equation):
    """(reference isph.py:141)"""

    def __init__(self, dest, sources, rho0):
        self.rho0 = rho0
        super(DensityInvariance, self).__init__(dest, sources)

    def post_loop(self, d_idx, d_rho, d_rhs, dt):
        rho0 = self.rho0
        d_rhs[d_idx] = (rho0 - d_rho[d_idx]) / (dt * dt * rho0)


class DensityInvarianceDFDI(Equation):
    """(reference isph.py:151)"""

    def post_loop(self, d_idx, d_V, d_V0, d_rhs, dt):
        V0 = d_V0[d_idx]
        d_rhs[d_idx] = 2 * (V0 - d_V[d_idx]) / (dt * dt * V0)


def _ppe_fac(s_m, s_rho, d_rho, d_idx, s_idx, XIJ, DWIJ, R2IJ, EPS):
    """Off-diagonal PPE coefficient fac_ij (reference isph.py:163)."""
    rhoij = s_rho[s_idx] + d_rho[d_idx]
    rhoij2_1 = 1.0 / (rhoij * rhoij)
    xdotdwij = (XIJ[0] * DWIJ[0] + XIJ[1] * DWIJ[1] +
                XIJ[2] * DWIJ[2])
    return 8.0 * s_m[s_idx] * rhoij2_1 * xdotdwij / (R2IJ + EPS)


class PressureCoeffMatrix(Equation):
    """Accumulate the PPE diagonal; the off-diagonal action is applied
    matrix-free by the CG matvec (reference isph.py:157)."""

    def initialize(self, d_idx, d_diag, d_fsurf):
        d_diag[d_idx] = 0.0
        d_fsurf[d_idx] = 0.0

    def loop(self, d_idx, s_idx, s_m, d_rho, s_rho, d_diag, XIJ, DWIJ,
             R2IJ, EPS):
        fac = _ppe_fac(s_m, s_rho, d_rho, d_idx, s_idx, XIJ, DWIJ,
                       R2IJ, EPS)
        d_diag[d_idx] += fac


class FreeSurfaceBoundaryCondition(Equation):
    """Dirichlet p=0 on detected free-surface particles; matrix-free
    the row becomes the identity via the ``fsurf`` flag (reference
    isph.py:280)."""

    def initialize(self, d_rho, d_rho0, d_rhs, d_diag, d_idx, d_fsurf):
        fs = d_rho[d_idx] / d_rho0[d_idx] < 0.98
        d_fsurf[d_idx] = jnp.where(fs, 1.0, d_fsurf[d_idx])
        d_rhs[d_idx] = jnp.where(fs, 0.0, d_rhs[d_idx])
        d_diag[d_idx] = jnp.where(fs, 1.0, d_diag[d_idx])


class PPESolveInit(Equation):
    """CG setup: de-mean the RHS (the PPE fixes p only up to a
    constant; the reference subtracts the mean too, isph.py:204),
    compute r = b - A p with the warm-started p, set the first search
    direction."""

    def initialize(self, d_idx, d_cg_ap):
        d_cg_ap[d_idx] = 0.0

    def loop(self, d_idx, s_idx, s_m, d_rho, s_rho, s_p, d_cg_ap, XIJ,
             DWIJ, R2IJ, EPS):
        fac = _ppe_fac(s_m, s_rho, d_rho, d_idx, s_idx, XIJ, DWIJ,
                       R2IJ, EPS)
        d_cg_ap[d_idx] += fac * s_p[s_idx]

    def reduce(self, dst, t, dt):
        mask = dst.active
        n = jnp.maximum(jnp.sum(jnp.where(mask, 1.0, 0.0)), 1.0)
        fs = dst.fsurf[:] > 0.5
        rhs = dst.rhs[:]
        mean = jnp.sum(jnp.where(mask & ~fs, rhs, 0.0)) / n
        rhs = jnp.where(mask & ~fs, rhs - mean, rhs)
        dst.rhs[:] = rhs
        # positive-definite form: A_pos = -A, b_pos = -rhs
        ap = dst.diag[:] * dst.p[:] - dst.cg_ap[:]   # (A p)
        ap = jnp.where(fs, dst.p[:], ap)             # identity rows
        r = jnp.where(mask, -rhs - (-ap), 0.0)
        dst.cg_r[:] = r
        dst.cg_d[:] = r
        dst.cg_scal[0] = jnp.sum(r * r)
        dst.cg_scal[1] = jnp.sum(jnp.where(mask, rhs * rhs, 0.0))


class PPESolve(Equation):
    """One CG iteration on the PPE; run inside an iterated group
    (replaces the reference's host-side scipy bicgstab,
    isph.py:190)."""

    def __init__(self, dest, sources, tol=1e-5):
        self.tol = tol
        super(PPESolve, self).__init__(dest, sources)

    def initialize(self, d_idx, d_cg_ap):
        d_cg_ap[d_idx] = 0.0

    def loop(self, d_idx, s_idx, s_m, d_rho, s_rho, s_cg_d, d_cg_ap,
             XIJ, DWIJ, R2IJ, EPS):
        fac = _ppe_fac(s_m, s_rho, d_rho, d_idx, s_idx, XIJ, DWIJ,
                       R2IJ, EPS)
        d_cg_ap[d_idx] += fac * s_cg_d[s_idx]

    def reduce(self, dst, t, dt):
        mask = dst.active
        fs = dst.fsurf[:] > 0.5
        d = dst.cg_d[:]
        ad = dst.diag[:] * d - dst.cg_ap[:]          # (A d)
        ad = jnp.where(fs, d, ad)
        ad_pos = jnp.where(mask, -ad, 0.0)           # A_pos d
        rs = dst.cg_scal[0]
        denom = jnp.sum(d * ad_pos)
        alpha = jnp.where(jnp.abs(denom) > 1e-30,
                          rs / jnp.where(jnp.abs(denom) > 1e-30,
                                         denom, 1.0), 0.0)
        p = dst.p[:] + alpha * d
        r = dst.cg_r[:] - alpha * ad_pos
        rs_new = jnp.sum(r * r)
        beta = jnp.where(rs > 1e-30,
                         rs_new / jnp.where(rs > 1e-30, rs, 1.0), 0.0)
        dst.p[:] = jnp.where(mask, p, dst.p[:])
        dst.cg_r[:] = r
        dst.cg_d[:] = r + beta * d
        dst.cg_scal[0] = rs_new

    def converged(self, dst):
        rs = dst.cg_scal[0]
        b2 = dst.cg_scal[1]
        done = rs <= (self.tol * self.tol) * jnp.maximum(b2, 1e-30)
        return jnp.where(done, 1.0, -1.0)


class MomentumEquationPressureGradient(Equation):
    """(reference isph.py:220)"""

    def initialize(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0

    def loop(self, d_idx, s_idx, s_m, d_p, s_p, d_rho, s_rho, d_au,
             d_av, d_aw, DWIJ):
        Vj = s_m[s_idx] / s_rho[s_idx]
        pij = d_p[d_idx] - s_p[s_idx]
        fac = Vj * pij / d_rho[d_idx]
        d_au[d_idx] += fac * DWIJ[0]
        d_av[d_idx] += fac * DWIJ[1]
        d_aw[d_idx] += fac * DWIJ[2]


class MomentumEquationPressureGradientSymmetric(Equation):
    """(reference isph.py:237)"""

    def initialize(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0

    def loop(self, d_idx, s_idx, s_m, d_p, s_p, d_rho, s_rho, d_au,
             d_av, d_aw, DWIJ):
        rhoi2 = d_rho[d_idx] * d_rho[d_idx]
        rhoj2 = s_rho[s_idx] * s_rho[s_idx]
        pij = d_p[d_idx] / rhoi2 + s_p[s_idx] / rhoj2
        fac = -s_m[s_idx] * pij
        d_au[d_idx] += fac * DWIJ[0]
        d_av[d_idx] += fac * DWIJ[1]
        d_aw[d_idx] += fac * DWIJ[2]


class MomentumEquationPressureGradientSymmetricMirror(Equation):
    """Symmetric pressure gradient with the Shao & Lo free-surface
    mirror condition: a near-surface source particle (rho/rho0 < 0.98)
    reflects the dest pressure (Pj = -Pi) at doubled separation
    (reference isph/isph.py:294)."""

    def initialize(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0

    def loop(self, d_idx, s_idx, s_m, d_p, s_p, d_rho, s_rho, d_au,
             d_av, d_aw, s_rho0, DWIJ, XIJ, RIJ, HIJ, SPH_KERNEL):
        rhoi2 = d_rho[d_idx] * d_rho[d_idx]
        rhoj2 = s_rho[s_idx] * s_rho[s_idx]
        pij = d_p[d_idx] / rhoi2 + s_p[s_idx] / rhoj2
        fac = -s_m[s_idx] * pij
        # mirror branch: Pj = -Pi, kernel gradient at 2*xij
        pij_m = d_p[d_idx] / rhoi2 - d_p[d_idx] / rhoj2
        fac_m = -s_m[s_idx] * pij_m
        xij2 = [2.0 * XIJ[0], 2.0 * XIJ[1], 2.0 * XIJ[2]]
        dwij_m = SPH_KERNEL.gradient(xij2, 2.0 * RIJ, HIJ)
        mirror = s_rho[s_idx] / s_rho0[s_idx] < 0.98
        d_au[d_idx] += jnp.where(mirror, fac_m * dwij_m[0],
                                 fac * DWIJ[0])
        d_av[d_idx] += jnp.where(mirror, fac_m * dwij_m[1],
                                 fac * DWIJ[1])
        d_aw[d_idx] += jnp.where(mirror, fac_m * dwij_m[2],
                                 fac * DWIJ[2])


class UpdatePosition(Equation):
    """(reference isph.py:255)"""

    def post_loop(self, d_idx, d_au, d_av, d_aw, d_x, d_y, d_z, dt):
        d_x[d_idx] += d_au[d_idx] * dt * dt * 0.5
        d_y[d_idx] += d_av[d_idx] * dt * dt * 0.5
        d_z[d_idx] += d_aw[d_idx] * dt * dt * 0.5


class CheckDensityError(Equation):
    """Max density error into a constant + device-side convergence
    (reference isph.py:262 uses host py_initialize)."""

    def __init__(self, dest, sources, rho0, tol=0.01):
        self.rho0 = rho0
        self.tol = tol
        super(CheckDensityError, self).__init__(dest, sources)

    def reduce(self, dst, t, dt):
        mask = dst.active
        err = jnp.max(jnp.where(mask,
                                jnp.abs(dst.rho[:] - self.rho0), 0.0))
        dst.cg_scal[2] = err

    def converged(self, dst):
        return jnp.where(dst.cg_scal[2] < self.tol, 1.0, -1.0)


from pysph_tpu.sph.integrator import Integrator  # noqa: E402
from pysph_tpu.sph.integrator_step import IntegratorStep  # noqa: E402
from pysph_tpu.sph.scheme import Scheme, add_bool_argument  # noqa: E402


class ISPHIntegrator(Integrator):
    """Predict / project two-stage step (reference isph.py:43)."""

    def one_timestep(self, t, dt):
        self.initialize()
        self.compute_accelerations(0)
        self.stage1()
        self.update_domain()
        self.do_post_stage(0.5 * dt, 1)
        self.compute_accelerations(1)
        self.stage2()
        self.update_domain()
        self.do_post_stage(dt, 2)

    def initial_acceleration(self, states, t, dt):
        """No-op like the reference override (isph.py:64)."""
        return dict(states), self._fresh_diag(), None


class ISPHStep(IntegratorStep):
    """(reference isph.py:67)"""

    def initialize(self, d_idx, d_x, d_y, d_z, d_x0, d_y0, d_z0, d_u,
                   d_v, d_w, d_u0, d_v0, d_w0, dt, d_rho0, d_rho, d_V):
        d_x0[d_idx] = d_x[d_idx]
        d_y0[d_idx] = d_y[d_idx]
        d_z0[d_idx] = d_z[d_idx]
        d_u0[d_idx] = d_u[d_idx]
        d_v0[d_idx] = d_v[d_idx]
        d_w0[d_idx] = d_w[d_idx]
        d_rho0[d_idx] = d_rho[d_idx]

    def stage1(self, d_idx, d_x, d_y, d_z, d_u, d_v, d_w, d_au, d_av,
               d_aw, d_V0, d_V, dt):
        d_x[d_idx] += dt * d_u[d_idx]
        d_y[d_idx] += dt * d_v[d_idx]
        d_z[d_idx] += dt * d_w[d_idx]
        d_u[d_idx] += dt * d_au[d_idx]
        d_v[d_idx] += dt * d_av[d_idx]
        d_w[d_idx] += dt * d_aw[d_idx]
        d_V0[d_idx] = d_V[d_idx]

    def stage2(self, d_idx, d_x, d_y, d_z, d_u, d_v, d_w, d_u0, d_v0,
               d_w0, d_x0, d_y0, d_z0, dt, d_au, d_av, d_aw):
        d_u[d_idx] += dt * d_au[d_idx]
        d_v[d_idx] += dt * d_av[d_idx]
        d_w[d_idx] += dt * d_aw[d_idx]
        d_x[d_idx] = d_x0[d_idx] + 0.5 * dt * (d_u[d_idx] + d_u0[d_idx])
        d_y[d_idx] = d_y0[d_idx] + 0.5 * dt * (d_v[d_idx] + d_v0[d_idx])
        d_z[d_idx] = d_z0[d_idx] + 0.5 * dt * (d_w[d_idx] + d_w0[d_idx])


class ISPHScheme(Scheme):
    """ISPH scheme (reference isph.py:331) with the matrix-free CG
    pressure projection."""

    def __init__(self, fluids, solids, dim, nu, rho0, c0, alpha,
                 beta=0.0, gx=0.0, gy=0.0, gz=0.0, tolerance=0.01,
                 symmetric=False, ppe_tol=1e-5, ppe_max_iterations=300):
        self.fluids = fluids
        self.solids = solids
        self.solver = None
        self.dim = dim
        self.nu = nu
        self.gx = gx
        self.gy = gy
        self.gz = gz
        self.c0 = c0
        self.alpha = alpha
        self.beta = beta
        self.tolerance = tolerance
        self.rho0 = rho0
        self.symmetric = symmetric
        self.ppe_tol = ppe_tol
        self.ppe_max_iterations = ppe_max_iterations

    def add_user_options(self, group):
        group.add_argument('--alpha', action='store', type=float,
                           dest='alpha', default=None,
                           help='Artificial viscosity.')
        add_bool_argument(
            group, 'symmetric', dest='symmetric', default=None,
            help='Use symmetric form of pressure gradient.')

    def consume_user_options(self, options):
        data = dict((var, self._smart_getattr(options, var)) for var in
                    ('alpha', 'symmetric'))
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
                steppers[fluid] = ISPHStep()
        cls = integrator_cls if integrator_cls is not None else \
            ISPHIntegrator
        integrator = cls(**steppers)
        self.solver = Solver(dim=self.dim, integrator=integrator,
                             kernel=kernel, **kw)

    def _get_viscous_eqns(self):
        from pysph_tpu.sph.wc.transport_velocity import (
            MomentumEquationArtificialViscosity)
        from pysph_tpu.sph.wc.viscosity import LaminarViscosity
        eq = []
        for fluid in self.fluids:
            eq.append(LaminarViscosity(dest=fluid, sources=self.fluids,
                                       nu=self.nu))
            eq.append(MomentumEquationArtificialViscosity(
                dest=fluid, sources=self.fluids, c0=self.c0,
                alpha=self.alpha))
            eq.append(MomentumEquationBodyForce(
                dest=fluid, sources=self.fluids, gx=self.gx,
                gy=self.gy, gz=self.gz))
        return [Group(equations=eq)]

    def _get_ppe(self):
        all = self.fluids
        stg = []
        stg.append(Group(equations=[
            eq for fluid in self.fluids for eq in
            (VelocityDivergence(dest=fluid, sources=all),
             PressureCoeffMatrix(dest=fluid, sources=all))]))
        stg.append(Group(equations=[
            PPESolveInit(dest=fluid, sources=all)
            for fluid in self.fluids]))
        stg.append(Group(equations=[
            PPESolve(dest=fluid, sources=all, tol=self.ppe_tol)
            for fluid in self.fluids], iterate=True,
            max_iterations=self.ppe_max_iterations, min_iterations=2))
        return stg

    def get_equations(self):
        from pysph_tpu.sph.equation import MultiStageEquations
        all = self.fluids
        all_eqns = [self._get_viscous_eqns()]
        stg2 = self._get_ppe()
        eq4 = []
        for fluid in self.fluids:
            if self.symmetric:
                eq4.append(MomentumEquationPressureGradientSymmetric(
                    dest=fluid, sources=all))
            else:
                eq4.append(MomentumEquationPressureGradient(
                    dest=fluid, sources=all))
        stg2.append(Group(equations=eq4))
        all_eqns.append(stg2)
        return MultiStageEquations(all_eqns)

    def setup_properties(self, particles, clean=True):
        particle_arrays = dict((p.name, p) for p in particles)
        dummy = get_particle_array_isph(name='junk')
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
                    pa.add_constant(cname, numpy.array(cval))
