"""TSPH — the 'TraditionalSPH' grad-h gas-dynamics scheme of Hopkins'
comparison (parity with /root/reference/pysph/sph/gas_dynamics/tsph.py).

The number-density Newton-Raphson iteration runs vectorized with
per-particle convergence flags (the group's ``converged()`` reduces
them); the per-particle 3x3 velocity-gradient solves become one
batched ``jnp.linalg.solve``.
"""

import jax.numpy as jnp

from pysph_tpu.sph.equation import Equation
from pysph_tpu.sph.integrator_step import IntegratorStep
from pysph_tpu.sph.scheme import Scheme


class SummationDensity(Equation):
    """Summation density + grad-h terms with optional h iteration
    (reference tsph.py:232)."""

    def __init__(self, dest, sources, dim, density_iterations=False,
                 iterate_only_once=False, hfact=1.2, htol=1e-6):
        self.density_iterations = density_iterations
        self.iterate_only_once = iterate_only_once
        self.dim = dim
        self.hfact = hfact
        self.htol = htol
        super(SummationDensity, self).__init__(dest, sources)

    def initialize(self, d_idx, d_rho, d_arho, d_drhosumdh, d_n,
                   d_dndh, d_prevn, d_prevdndh, d_prevdrhosumdh, d_an):
        d_rho[d_idx] = 0.0
        d_arho[d_idx] = 0.0
        d_prevn[d_idx] = d_n[d_idx]
        d_prevdrhosumdh[d_idx] = d_drhosumdh[d_idx]
        d_prevdndh[d_idx] = d_dndh[d_idx]
        d_drhosumdh[d_idx] = 0.0
        d_n[d_idx] = 0.0
        d_an[d_idx] = 0.0
        d_dndh[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_rho, d_arho, d_drhosumdh, s_m, VIJ,
             WI, DWI, GHI, d_n, d_dndh, d_h, d_prevn, d_prevdndh,
             d_prevdrhosumdh, d_an):
        mj = s_m[s_idx]
        vijdotdwij = (VIJ[0] * DWI[0] + VIJ[1] * DWI[1] +
                      VIJ[2] * DWI[2])
        d_rho[d_idx] += mj * WI

        hibynidim = d_h[d_idx] / (d_prevn[d_idx] * self.dim)
        inbrkti = 1 + d_prevdndh[d_idx] * hibynidim
        inprthsi = d_prevdrhosumdh[d_idx] * hibynidim
        fij = 1 - inprthsi / (s_m[s_idx] * inbrkti)
        vijdotdwij_fij = vijdotdwij * fij
        d_arho[d_idx] += mj * vijdotdwij_fij
        d_an[d_idx] += vijdotdwij_fij

        d_drhosumdh[d_idx] += mj * GHI
        d_n[d_idx] += WI
        d_dndh[d_idx] += GHI

    def post_loop(self, d_idx, d_h0, d_h, d_ah, d_converged, d_n,
                  d_dndh, d_an):
        if not self.density_iterations:
            return
        active = d_converged[d_idx] != 1
        hi = d_h[d_idx]
        hi0 = d_h0[d_idx]
        ni = (self.hfact / hi) ** self.dim
        dndhi = -self.dim * d_n[d_idx] / hi
        func = d_n[d_idx] - ni
        dfdh = d_dndh[d_idx] - dndhi
        dfdh = jnp.where(dfdh != 0.0, dfdh, 1.0)
        hnew = jnp.clip(hi - func / dfdh, 0.8 * hi, 1.2 * hi)
        diff = jnp.abs(hnew - hi) / hi0
        done = (diff < self.htol) | bool(self.iterate_only_once)
        d_h[d_idx] = jnp.where(active & ~done, hnew, d_h[d_idx])
        d_ah[d_idx] = jnp.where(active & done,
                                d_an[d_idx] / dndhi, d_ah[d_idx])
        d_converged[d_idx] = jnp.where(
            active & done, 1.0,
            jnp.where(active, 0.0, d_converged[d_idx]))

    def converged(self, dst):
        if not self.density_iterations:
            return 1.0
        all_done = jnp.all(jnp.where(dst.active,
                                     dst.converged[:] == 1, True))
        return jnp.where(all_done, 1.0, -1.0)


class IdealGasEOS(Equation):
    """(reference tsph.py:344)"""

    def __init__(self, dest, sources, gamma):
        self.gamma = gamma
        self.gamma1 = gamma - 1.0
        super(IdealGasEOS, self).__init__(dest, sources)

    def post_loop(self, d_idx, d_p, d_rho, d_e, d_cs):
        d_p[d_idx] = self.gamma1 * d_rho[d_idx] * d_e[d_idx]
        d_cs[d_idx] = jnp.sqrt(self.gamma * d_p[d_idx] /
                               d_rho[d_idx])


class VelocityGradDivC1(Equation):
    """First-order-consistent velocity gradient: T^-1-corrected
    (reference tsph.py:362); the 3x3 inversion is batched."""

    def __init__(self, dest, sources, dim):
        self.dim = dim
        super(VelocityGradDivC1, self).__init__(dest, sources)

    def initialize(self, d_gradv, d_idx, d_invtt, d_divv):
        for i in range(9):
            d_gradv[9 * d_idx + i] = 0.0
            d_invtt[9 * d_idx + i] = 0.0
        d_divv[d_idx] = 0.0

    def loop(self, d_idx, d_invtt, s_m, s_idx, VIJ, DWI, XIJ, d_gradv):
        for row in range(self.dim):
            for col in range(self.dim):
                k = 9 * d_idx + row * 3 + col
                d_invtt[k] += -s_m[s_idx] * XIJ[row] * DWI[col]
                d_gradv[k] += -s_m[s_idx] * VIJ[row] * DWI[col]

    def post_loop(self, d_idx, d_gradv, d_invtt, d_divv):
        dim = self.dim

        def mat(view):
            rows = []
            for r in range(3):
                cols = []
                for c in range(3):
                    v = view[9 * d_idx + 3 * r + c]
                    cols.append(v)
                rows.append(jnp.stack(cols, axis=-1))
            return jnp.stack(rows, axis=-2)

        tt = mat(d_invtt)
        gradv = mat(d_gradv)
        # the unused rows/cols carry the identity so the 3x3 solve is
        # well posed in 1D/2D (reference pads with identity(3))
        eye = jnp.eye(3)
        fill = jnp.broadcast_to(eye, tt.shape)
        keep = jnp.zeros((3, 3), bool).at[:dim, :dim].set(True)
        tt = jnp.where(keep, tt, fill)
        det = jnp.linalg.det(tt)
        good = jnp.abs(det) > 1e-12
        tt = jnp.where(good[..., None, None], tt, fill)
        invtt = jnp.linalg.inv(tt)
        gradvls = jnp.einsum('...ij,...jk->...ik', gradv, invtt)

        div = 0.0
        for r in range(dim):
            div = div + gradvls[..., r, r]
        d_divv[d_idx] = div
        for r in range(dim):
            for c in range(dim):
                d_gradv[9 * d_idx + 3 * r + c] = gradvls[..., r, c]


class BalsaraSwitch(Equation):
    """(reference tsph.py:429)"""

    def __init__(self, dest, sources, alphaav, fkern):
        self.alphaav = alphaav
        self.fkern = fkern
        super(BalsaraSwitch, self).__init__(dest, sources)

    def post_loop(self, d_h, d_idx, d_cs, d_divv, d_gradv, d_alpha):
        curl = [
            d_gradv[9 * d_idx + 3 * 2 + 1] -
            d_gradv[9 * d_idx + 3 * 1 + 2],
            d_gradv[9 * d_idx + 3 * 0 + 2] -
            d_gradv[9 * d_idx + 3 * 2 + 0],
            d_gradv[9 * d_idx + 3 * 1 + 0] -
            d_gradv[9 * d_idx + 3 * 0 + 1],
        ]
        abscurlv = jnp.sqrt(curl[0] ** 2 + curl[1] ** 2 +
                            curl[2] ** 2)
        absdivv = jnp.abs(d_divv[d_idx])
        fhi = d_h[d_idx] * self.fkern
        d_alpha[d_idx] = self.alphaav * absdivv / (
            absdivv + abscurlv + 0.0001 * d_cs[d_idx] / fhi)


class MomentumAndEnergy(Equation):
    """grad-h momentum/energy with Monaghan AV
    (reference tsph.py:457)."""

    def __init__(self, dest, sources, dim, fkern, beta=2.0):
        self.beta = beta
        self.dim = dim
        self.fkern = fkern
        super(MomentumAndEnergy, self).__init__(dest, sources)

    def initialize(self, d_idx, d_au, d_av, d_aw, d_ae):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0
        d_ae[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_m, s_m, d_p, s_p, d_cs, s_cs,
             d_rho, s_rho, d_au, d_av, d_aw, d_ae, XIJ, VIJ, DWI, DWJ,
             HIJ, d_alpha, s_alpha, R2IJ, RHOIJ1, d_h, d_dndh, d_n,
             d_drhosumdh, s_h, s_dndh, s_n, s_drhosumdh):
        dim = self.dim
        pibrhoi2 = d_p[d_idx] / (d_rho[d_idx] * d_rho[d_idx])
        pjbrhoj2 = s_p[s_idx] / (s_rho[s_idx] * s_rho[s_idx])
        cij = 0.5 * (d_cs[d_idx] + s_cs[s_idx])
        mj = s_m[s_idx]
        hij = self.fkern * HIJ
        vijdotxij = (VIJ[0] * XIJ[0] + VIJ[1] * XIJ[1] +
                     VIJ[2] * XIJ[2])

        # artificial viscosity, only approaching pairs
        appr = vijdotxij <= 0.0
        alpha = 0.5 * (d_alpha[d_idx] + s_alpha[s_idx])
        muij = hij * vijdotxij / (R2IJ + 0.0001 * hij * hij)
        common = jnp.where(
            appr,
            alpha * muij * (cij - self.beta * muij) * mj *
            RHOIJ1 / 2, 0.0)
        avi = [common * (DWI[i] + DWJ[i]) for i in range(3)]
        d_au[d_idx] += avi[0]
        d_av[d_idx] += avi[1]
        d_aw[d_idx] += avi[2]
        d_ae[d_idx] -= 0.5 * (VIJ[0] * avi[0] + VIJ[1] * avi[1] +
                              VIJ[2] * avi[2])

        # grad-h corrected pressure gradient
        hibynidim = d_h[d_idx] / (d_n[d_idx] * dim)
        inbrkti = 1 + d_dndh[d_idx] * hibynidim
        inprthsi = d_drhosumdh[d_idx] * hibynidim
        fij = 1 - inprthsi / (s_m[s_idx] * inbrkti)

        hjbynjdim = s_h[s_idx] / (s_n[s_idx] * dim)
        inbrktj = 1 + s_dndh[s_idx] * hjbynjdim
        inprthsj = s_drhosumdh[s_idx] * hjbynjdim
        fji = 1 - inprthsj / (d_m[d_idx] * inbrktj)

        comi = mj * pibrhoi2 * fij
        comj = mj * pjbrhoj2 * fji
        d_au[d_idx] -= comi * DWI[0] + comj * DWJ[0]
        d_av[d_idx] -= comi * DWI[1] + comj * DWJ[1]
        d_aw[d_idx] -= comi * DWI[2] + comj * DWJ[2]
        vijdotdwi = (VIJ[0] * DWI[0] + VIJ[1] * DWI[1] +
                     VIJ[2] * DWI[2])
        d_ae[d_idx] += comi * vijdotdwi


class WallBoundary(Equation):
    """Shepard-extrapolated wall state (reference tsph.py:579)."""

    def initialize(self, d_idx, d_p, d_rho, d_e, d_m, d_cs, d_h,
                   d_htmp, d_h0, d_u, d_v, d_w, d_wij, d_n, d_dndh,
                   d_drhosumdh, d_divv, d_m0):
        d_p[d_idx] = 0.0
        d_u[d_idx] = 0.0
        d_v[d_idx] = 0.0
        d_w[d_idx] = 0.0
        d_m0[d_idx] = d_m[d_idx]
        d_m[d_idx] = 0.0
        d_rho[d_idx] = 0.0
        d_e[d_idx] = 0.0
        d_cs[d_idx] = 0.0
        d_divv[d_idx] = 0.0
        d_wij[d_idx] = 0.0
        d_h[d_idx] = d_h0[d_idx]
        d_htmp[d_idx] = 0.0
        d_n[d_idx] = 0.0
        d_dndh[d_idx] = 0.0
        d_drhosumdh[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_p, d_rho, d_e, d_m, d_cs, d_divv,
             d_h, d_u, d_v, d_w, d_wij, d_htmp, s_p, s_rho, s_e, s_m,
             s_cs, s_h, s_divv, s_u, s_v, s_w, WI, s_n, d_n, s_dndh,
             d_dndh, d_drhosumdh, s_drhosumdh):
        d_wij[d_idx] += WI
        d_p[d_idx] += s_p[s_idx] * WI
        d_u[d_idx] -= s_u[s_idx] * WI
        d_v[d_idx] -= s_v[s_idx] * WI
        d_w[d_idx] -= s_w[s_idx] * WI
        d_m[d_idx] += s_m[s_idx] * WI
        d_rho[d_idx] += s_rho[s_idx] * WI
        d_e[d_idx] += s_e[s_idx] * WI
        d_cs[d_idx] += s_cs[s_idx] * WI
        d_divv[d_idx] += s_divv[s_idx] * WI
        d_htmp[d_idx] += s_h[s_idx] * WI
        d_n[d_idx] += s_n[s_idx] * WI
        d_dndh[d_idx] += s_dndh[s_idx] * WI
        d_drhosumdh[d_idx] += s_drhosumdh[s_idx] * WI

    def post_loop(self, d_idx, d_p, d_rho, d_e, d_m, d_cs, d_divv,
                  d_h, d_u, d_v, d_w, d_wij, d_htmp, d_n, d_dndh,
                  d_drhosumdh, d_m0):
        ok = d_wij[d_idx] > 1e-30
        w = jnp.where(ok, d_wij[d_idx], 1.0)
        for view in (d_p, d_u, d_v, d_w, d_m, d_rho, d_e, d_cs,
                     d_divv, d_n, d_dndh, d_drhosumdh):
            view[d_idx] = jnp.where(ok, view[d_idx] / w, view[d_idx])
        d_h[d_idx] = jnp.where(ok, d_htmp[d_idx] / w, d_h[d_idx])
        d_m[d_idx] = jnp.where(d_m[d_idx] < 1e-10, d_m0[d_idx],
                               d_m[d_idx])


class UpdateGhostProps(Equation):
    """Ghost copy (reference tsph.py:650); no mirrored ghosts in the
    grid engine — no-op for parity."""

    def __init__(self, dest, sources=None, dim=2):
        super(UpdateGhostProps, self).__init__(dest, sources)
        self.dim = dim

    def initialize(self, d_idx):
        pass


class PECStep(IntegratorStep):
    """Gas-dynamics PEC modified for TSPH (reference tsph.py:674)."""

    def initialize(self, d_idx, d_x0, d_y0, d_z0, d_x, d_y, d_z, d_h,
                   d_u0, d_v0, d_w0, d_u, d_v, d_w, d_e, d_e0, d_h0,
                   d_converged, d_rho, d_rho0, d_n, d_n0):
        d_x0[d_idx] = d_x[d_idx]
        d_y0[d_idx] = d_y[d_idx]
        d_z0[d_idx] = d_z[d_idx]
        d_u0[d_idx] = d_u[d_idx]
        d_v0[d_idx] = d_v[d_idx]
        d_w0[d_idx] = d_w[d_idx]
        d_e0[d_idx] = d_e[d_idx]
        d_h0[d_idx] = d_h[d_idx]
        d_rho0[d_idx] = d_rho[d_idx]
        d_n0[d_idx] = d_n[d_idx]
        d_converged[d_idx] = 0.0

    def stage1(self, d_idx, d_x0, d_y0, d_z0, d_x, d_y, d_z, d_u0,
               d_v0, d_w0, d_u, d_v, d_w, d_e0, d_e, d_au, d_av, d_aw,
               d_ae, d_rho, d_rho0, d_arho, d_h, d_h0, d_ah, dt, d_n,
               d_n0, d_an):
        dtb2 = 0.5 * dt
        d_u[d_idx] = d_u0[d_idx] + dtb2 * d_au[d_idx]
        d_v[d_idx] = d_v0[d_idx] + dtb2 * d_av[d_idx]
        d_w[d_idx] = d_w0[d_idx] + dtb2 * d_aw[d_idx]
        d_x[d_idx] = d_x0[d_idx] + dtb2 * d_u[d_idx]
        d_y[d_idx] = d_y0[d_idx] + dtb2 * d_v[d_idx]
        d_z[d_idx] = d_z0[d_idx] + dtb2 * d_w[d_idx]
        d_e[d_idx] = d_e0[d_idx] + dtb2 * d_ae[d_idx]
        d_h[d_idx] = d_h0[d_idx] + dtb2 * d_ah[d_idx]
        d_rho[d_idx] = d_rho0[d_idx] + dtb2 * d_arho[d_idx]
        d_n[d_idx] = d_n0[d_idx] + dtb2 * d_an[d_idx]

    def stage2(self, d_idx, d_x0, d_y0, d_z0, d_x, d_y, d_z, d_u0,
               d_v0, d_w0, d_u, d_v, d_w, d_e0, d_e, d_au, d_av, d_aw,
               d_ae, dt):
        d_u[d_idx] = d_u0[d_idx] + dt * d_au[d_idx]
        d_v[d_idx] = d_v0[d_idx] + dt * d_av[d_idx]
        d_w[d_idx] = d_w0[d_idx] + dt * d_aw[d_idx]
        d_x[d_idx] = d_x0[d_idx] + dt * d_u[d_idx]
        d_y[d_idx] = d_y0[d_idx] + dt * d_v[d_idx]
        d_z[d_idx] = d_z0[d_idx] + dt * d_w[d_idx]
        d_e[d_idx] = d_e0[d_idx] + dt * d_ae[d_idx]


class TSPHScheme(Scheme):
    """(reference tsph.py:27)"""

    def __init__(self, fluids, solids, dim, gamma, hfact, beta=2.0,
                 fkern=1.0, max_density_iterations=250, alphamax=1.0,
                 density_iteration_tolerance=1e-3, has_ghosts=False):
        self.fluids = fluids
        self.solids = solids
        self.dim = dim
        self.solver = None
        self.gamma = gamma
        self.beta = beta
        self.hfact = hfact
        self.density_iteration_tolerance = density_iteration_tolerance
        self.max_density_iterations = max_density_iterations
        self.has_ghosts = has_ghosts
        self.fkern = fkern
        self.alphamax = alphamax

    def add_user_options(self, group):
        group.add_argument('--alpha-max', action='store', type=float,
                           dest='alphamax', default=None,
                           help='alpha_max for the AV switch.')
        group.add_argument('--beta', action='store', type=float,
                           dest='beta', default=None,
                           help='beta for the artificial viscosity.')
        group.add_argument('--gamma', action='store', type=float,
                           dest='gamma', default=None,
                           help='gamma for the state equation.')

    def consume_user_options(self, options):
        data = dict((var, self._smart_getattr(options, var)) for var in
                    ('gamma', 'alphamax', 'beta'))
        self.configure(**data)

    def configure_solver(self, kernel=None, integrator_cls=None,
                         extra_steppers=None, **kw):
        from pysph_tpu.base.kernels import Gaussian
        from pysph_tpu.sph.integrator import PECIntegrator
        from pysph_tpu.solver.solver import Solver
        if kernel is None:
            kernel = Gaussian(dim=self.dim)
        self.fkern = getattr(kernel, 'fkern', 1.0)
        steppers = {}
        if extra_steppers is not None:
            steppers.update(extra_steppers)
        cls = integrator_cls if integrator_cls is not None else \
            PECIntegrator
        for name in self.fluids:
            if name not in steppers:
                steppers[name] = PECStep()
        integrator = cls(**steppers)
        self.solver = Solver(dim=self.dim, integrator=integrator,
                             kernel=kernel, **kw)

    def get_equations(self):
        from pysph_tpu.sph.equation import Group
        all_pa = self.fluids + self.solids
        equations = []
        equations.append(Group(equations=[
            SummationDensity(
                dest=f, sources=all_pa, hfact=self.hfact,
                density_iterations=True, dim=self.dim,
                htol=self.density_iteration_tolerance)
            for f in self.fluids],
            update_nnps=True, iterate=True,
            max_iterations=self.max_density_iterations))
        equations.append(Group(equations=[
            IdealGasEOS(dest=f, sources=None, gamma=self.gamma)
            for f in self.fluids]))
        g3 = []
        for f in self.fluids:
            g3.append(VelocityGradDivC1(dest=f, sources=all_pa,
                                        dim=self.dim))
            g3.append(BalsaraSwitch(dest=f, sources=None,
                                    alphaav=self.alphamax,
                                    fkern=self.fkern))
        equations.append(Group(equations=g3))
        if self.solids:
            equations.append(Group(equations=[
                WallBoundary(s, sources=self.fluids)
                for s in self.solids]))
        if self.has_ghosts:
            equations.append(Group(equations=[
                UpdateGhostProps(dest=f, sources=None)
                for f in self.fluids], real=False))
        equations.append(Group(equations=[
            MomentumAndEnergy(dest=f, sources=all_pa, dim=self.dim,
                              beta=self.beta, fkern=self.fkern)
            for f in self.fluids]))
        return equations

    def setup_properties(self, particles, clean=True):
        import numpy
        particle_arrays = dict((p.name, p) for p in particles)
        props = ['rho', 'm', 'x', 'y', 'z', 'u', 'v', 'w', 'h', 'cs',
                 'p', 'e', 'au', 'av', 'aw', 'ae', 'pid', 'gid',
                 'tag', 'dwdh', 'h0', 'converged', 'ah', 'arho',
                 'dt_cfl', 'e0', 'rho0', 'u0', 'v0', 'w0', 'x0', 'y0',
                 'z0', 'alpha', 'drhosumdh', 'n', 'dndh', 'prevn',
                 'prevdndh', 'prevdrhosumdh', 'divv', 'an', 'n0']
        output_props = 'rho p u v w x y z e n divv h alpha'.split()
        for fluid in self.fluids:
            pa = particle_arrays[fluid]
            self._ensure_properties(pa, props, clean)
            pa.add_property('orig_idx', type='int')
            pa.add_property('n', data=numpy.asarray(pa.rho) /
                            numpy.asarray(pa.m))
            pa.add_property('gradv', stride=9)
            pa.add_property('invtt', stride=9)
            pa.orig_idx = numpy.arange(pa.get_number_of_particles())
            pa.set_output_arrays(output_props)
        solid_props = set(props) | set('m0 wij htmp'.split())
        for solid in self.solids:
            pa = particle_arrays[solid]
            self._ensure_properties(pa, solid_props, clean)
            pa.set_output_arrays(output_props)
