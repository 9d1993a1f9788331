"""Entropically Damped Artificial Compressibility (EDAC) SPH.

Parity with /root/reference/pysph/sph/wc/edac.py (Ramachandran &
Puri 2016): the pressure evolution equation replaces an EOS; TVF-form and
external-flow variants."""

import math

import jax.numpy as jnp

from pysph_tpu.base.utils import DEFAULT_PROPS, get_particle_array
from pysph_tpu.sph.equation import Equation, Group
from pysph_tpu.sph.integrator_step import IntegratorStep
from pysph_tpu.sph.scheme import Scheme, add_bool_argument

M_PI = math.pi

EDAC_PROPS = ('ap', 'au', 'av', 'aw', 'ax', 'ay', 'az',
              'x0', 'y0', 'z0', 'u0', 'v0', 'w0', 'p0', 'V')


def get_particle_array_edac(constants=None, **props):
    pa = get_particle_array(constants=constants,
                            additional_props=EDAC_PROPS, **props)
    pa.set_output_arrays(['x', 'y', 'z', 'u', 'v', 'w', 'rho', 'p',
                          'au', 'av', 'aw', 'ap', 'm', 'h'])
    return pa


EDAC_SOLID_PROPS = ('ap', 'p0', 'wij', 'uf', 'vf', 'wf', 'ug', 'vg',
                    'wg', 'ax', 'ay', 'az', 'V')


def get_particle_array_edac_solid(constants=None, **props):
    pa = get_particle_array(constants=constants,
                            additional_props=EDAC_SOLID_PROPS, **props)
    pa.set_output_arrays(['x', 'y', 'z', 'u', 'v', 'w', 'rho', 'p', 'h'])
    return pa


def _damping(t, tdamp):
    if tdamp > 0:
        return jnp.where(
            t < tdamp,
            0.5 * (jnp.sin((-0.5 + t / tdamp) * M_PI) + 1.0), 1.0)
    return 1.0


class ComputeAveragePressure(Equation):
    """Average neighborhood pressure for the Basa-Quinlan-Lastiwka
    correction (reference edac.py:62)."""

    def initialize(self, d_idx, d_pavg, d_nnbr):
        d_pavg[d_idx] = 0.0
        d_nnbr[d_idx] = 0.0

    def loop(self, d_idx, d_pavg, s_idx, s_p, d_nnbr, WIJ):
        d_pavg[d_idx] += s_p[s_idx]
        # the increment must be pair-shaped so the batched engine
        # counts one per neighbor (a bare scalar += in a pair loop is
        # treated as a per-particle assignment)
        d_nnbr[d_idx] += 1.0 + 0.0 * WIJ

    def post_loop(self, d_idx, d_pavg, d_nnbr):
        n = d_nnbr[d_idx]
        d_pavg[d_idx] = jnp.where(
            n > 0, d_pavg[d_idx] / jnp.where(n > 0, n, 1.0),
            d_pavg[d_idx])


class EDACStep(IntegratorStep):
    """Predictor-corrector step evolving (u, x, p)
    (reference edac.py:82)."""

    def initialize(self, d_idx, d_x0, d_y0, d_z0, d_x, d_y, d_z,
                   d_u0, d_v0, d_w0, d_u, d_v, d_w, d_p0, d_p):
        d_x0[d_idx] = d_x[d_idx]
        d_y0[d_idx] = d_y[d_idx]
        d_z0[d_idx] = d_z[d_idx]
        d_u0[d_idx] = d_u[d_idx]
        d_v0[d_idx] = d_v[d_idx]
        d_w0[d_idx] = d_w[d_idx]
        d_p0[d_idx] = d_p[d_idx]

    def stage1(self, d_idx, d_x0, d_y0, d_z0, d_x, d_y, d_z,
               d_u0, d_v0, d_w0, d_u, d_v, d_w, d_p0, d_p, d_au, d_av,
               d_aw, d_ax, d_ay, d_az, d_ap, dt):
        dtb2 = 0.5 * dt
        d_u[d_idx] = d_u0[d_idx] + dtb2 * d_au[d_idx]
        d_v[d_idx] = d_v0[d_idx] + dtb2 * d_av[d_idx]
        d_w[d_idx] = d_w0[d_idx] + dtb2 * d_aw[d_idx]
        d_x[d_idx] = d_x0[d_idx] + dtb2 * d_ax[d_idx]
        d_y[d_idx] = d_y0[d_idx] + dtb2 * d_ay[d_idx]
        d_z[d_idx] = d_z0[d_idx] + dtb2 * d_az[d_idx]
        d_p[d_idx] = d_p0[d_idx] + dtb2 * d_ap[d_idx]

    def stage2(self, d_idx, d_x0, d_y0, d_z0, d_x, d_y, d_z,
               d_u0, d_v0, d_w0, d_u, d_v, d_w, d_p0, d_p, d_au, d_av,
               d_aw, d_ax, d_ay, d_az, d_ap, dt):
        d_u[d_idx] = d_u0[d_idx] + dt * d_au[d_idx]
        d_v[d_idx] = d_v0[d_idx] + dt * d_av[d_idx]
        d_w[d_idx] = d_w0[d_idx] + dt * d_aw[d_idx]
        d_x[d_idx] = d_x0[d_idx] + dt * d_ax[d_idx]
        d_y[d_idx] = d_y0[d_idx] + dt * d_ay[d_idx]
        d_z[d_idx] = d_z0[d_idx] + dt * d_az[d_idx]
        d_p[d_idx] = d_p0[d_idx] + dt * d_ap[d_idx]


class SolidWallPressureBC(Equation):
    """Adami-Hu wall pressure for EDAC (reference edac.py:136); requires
    d_wij from SourceNumberDensity."""

    def __init__(self, dest, sources, gx=0.0, gy=0.0, gz=0.0):
        self.gx = gx
        self.gy = gy
        self.gz = gz
        super(SolidWallPressureBC, self).__init__(dest, sources)

    def initialize(self, d_idx, d_p):
        d_p[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_p, s_p, s_rho,
             d_au, d_av, d_aw, WIJ, XIJ):
        gdotxij = ((self.gx - d_au[d_idx]) * XIJ[0] +
                   (self.gy - d_av[d_idx]) * XIJ[1] +
                   (self.gz - d_aw[d_idx]) * XIJ[2])
        d_p[d_idx] += s_p[s_idx] * WIJ + s_rho[s_idx] * gdotxij * WIJ

    def post_loop(self, d_idx, d_wij, d_p):
        has = d_wij[d_idx] > 1e-14
        d_p[d_idx] = jnp.where(
            has, d_p[d_idx] / jnp.where(has, d_wij[d_idx], 1.0),
            d_p[d_idx])


class ClampWallPressure(Equation):
    """Clamp wall pressure to non-negative values (reference
    edac.py:169)."""

    def post_loop(self, d_idx, d_p):
        d_p[d_idx] = jnp.maximum(d_p[d_idx], 0.0)


class SourceNumberDensity(Equation):
    """Number density from the source particles (reference
    edac.py:177)."""

    def initialize(self, d_idx, d_wij):
        d_wij[d_idx] = 0.0

    def loop(self, d_idx, d_wij, WIJ):
        d_wij[d_idx] += WIJ


class SetWallVelocity(Equation):
    """Extrapolate fluid velocity onto the wall; uses d_wij computed by
    the pressure BC (reference edac.py:186)."""

    def initialize(self, d_idx, d_uf, d_vf, d_wf):
        d_uf[d_idx] = 0.0
        d_vf[d_idx] = 0.0
        d_wf[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_uf, d_vf, d_wf, s_u, s_v, s_w, WIJ):
        d_uf[d_idx] += s_u[s_idx] * WIJ
        d_vf[d_idx] += s_v[s_idx] * WIJ
        d_wf[d_idx] += s_w[s_idx] * WIJ

    def post_loop(self, d_uf, d_vf, d_wf, d_wij, d_idx,
                  d_ug, d_vg, d_wg, d_u, d_v, d_w):
        has = d_wij[d_idx] > 1e-12
        denom = jnp.where(has, d_wij[d_idx], 1.0)
        d_uf[d_idx] = jnp.where(has, d_uf[d_idx] / denom, d_uf[d_idx])
        d_vf[d_idx] = jnp.where(has, d_vf[d_idx] / denom, d_vf[d_idx])
        d_wf[d_idx] = jnp.where(has, d_wf[d_idx] / denom, d_wf[d_idx])
        d_ug[d_idx] = 2 * d_u[d_idx] - d_uf[d_idx]
        d_vg[d_idx] = 2 * d_v[d_idx] - d_vf[d_idx]
        d_wg[d_idx] = 2 * d_w[d_idx] - d_wf[d_idx]


class NoSlipVelocityExtrapolation(Equation):
    """Shepard-extrapolate fluid velocity onto an inviscid wall and
    reflect the normal component (reference edac.py:236)."""

    def initialize(self, d_idx, d_u, d_v, d_w):
        d_u[d_idx] = 0.0
        d_v[d_idx] = 0.0
        d_w[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_u, d_v, d_w, s_u, s_v, s_w, WIJ):
        d_u[d_idx] += s_u[s_idx] * WIJ
        d_v[d_idx] += s_v[s_idx] * WIJ
        d_w[d_idx] += s_w[s_idx] * WIJ

    def post_loop(self, d_idx, d_wij, d_u, d_v, d_w, d_xn, d_yn, d_zn):
        has = d_wij[d_idx] > 1e-14
        denom = jnp.where(has, d_wij[d_idx], 1.0)
        d_u[d_idx] = jnp.where(has, d_u[d_idx] / denom, d_u[d_idx])
        d_v[d_idx] = jnp.where(has, d_v[d_idx] / denom, d_v[d_idx])
        d_w[d_idx] = jnp.where(has, d_w[d_idx] / denom, d_w[d_idx])
        projection = (d_u[d_idx] * d_xn[d_idx] +
                      d_v[d_idx] * d_yn[d_idx] +
                      d_w[d_idx] * d_zn[d_idx])
        d_u[d_idx] = d_u[d_idx] - 2 * projection * d_xn[d_idx]
        d_v[d_idx] = d_v[d_idx] - 2 * projection * d_yn[d_idx]
        d_w[d_idx] = d_w[d_idx] - 2 * projection * d_zn[d_idx]


class NoSlipAdvVelocityExtrapolation(Equation):
    """Same as NoSlipVelocityExtrapolation for the advection velocity
    (reference edac.py:268)."""

    def initialize(self, d_idx, d_uhat, d_vhat, d_what):
        d_uhat[d_idx] = 0.0
        d_vhat[d_idx] = 0.0
        d_what[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_uhat, d_vhat, d_what, s_uhat,
             s_vhat, s_what, WIJ):
        d_uhat[d_idx] += s_uhat[s_idx] * WIJ
        d_vhat[d_idx] += s_vhat[s_idx] * WIJ
        d_what[d_idx] += s_what[s_idx] * WIJ

    def post_loop(self, d_idx, d_wij, d_uhat, d_vhat, d_what, d_xn,
                  d_yn, d_zn):
        has = d_wij[d_idx] > 1e-14
        denom = jnp.where(has, d_wij[d_idx], 1.0)
        d_uhat[d_idx] = jnp.where(has, d_uhat[d_idx] / denom,
                                  d_uhat[d_idx])
        d_vhat[d_idx] = jnp.where(has, d_vhat[d_idx] / denom,
                                  d_vhat[d_idx])
        d_what[d_idx] = jnp.where(has, d_what[d_idx] / denom,
                                  d_what[d_idx])
        projection = (d_uhat[d_idx] * d_xn[d_idx] +
                      d_vhat[d_idx] * d_yn[d_idx] +
                      d_what[d_idx] * d_zn[d_idx])
        d_uhat[d_idx] = d_uhat[d_idx] - 2 * projection * d_xn[d_idx]
        d_vhat[d_idx] = d_vhat[d_idx] - 2 * projection * d_yn[d_idx]
        d_what[d_idx] = d_what[d_idx] - 2 * projection * d_zn[d_idx]


class MomentumEquation(Equation):
    """Number-density pressure gradient, Hu & Adams 2006
    (reference edac.py:301)."""

    def __init__(self, dest, sources, c0, gx=0.0, gy=0.0, gz=0.0,
                 tdamp=0.0):
        self.gx = gx
        self.gy = gy
        self.gz = gz
        self.c0 = c0
        self.tdamp = tdamp
        super(MomentumEquation, self).__init__(dest, sources)

    def initialize(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_m, d_rho, d_p, d_V, d_au, d_av,
             d_aw, s_rho, s_p, s_V, DWIJ):
        rhoi = d_rho[d_idx]
        rhoj = s_rho[s_idx]
        pij = (rhoj * d_p[d_idx] + rhoi * s_p[s_idx]) / (rhoj + rhoi)
        Vi = 1.0 / d_V[d_idx]
        Vj = 1.0 / s_V[s_idx]
        tmp = -pij / d_m[d_idx] * (Vi * Vi + Vj * Vj)
        d_au[d_idx] += tmp * DWIJ[0]
        d_av[d_idx] += tmp * DWIJ[1]
        d_aw[d_idx] += tmp * DWIJ[2]

    def post_loop(self, d_idx, d_au, d_av, d_aw, t):
        fac = _damping(t, self.tdamp)
        d_au[d_idx] += fac * self.gx
        d_av[d_idx] += fac * self.gy
        d_aw[d_idx] += fac * self.gz


class EDACEquation(Equation):
    """The EDAC pressure evolution equation (reference edac.py:354)."""

    def __init__(self, dest, sources, cs, nu, rho0):
        self.cs = cs
        self.nu = nu
        self.rho0 = rho0
        super(EDACEquation, self).__init__(dest, sources)

    def initialize(self, d_idx, d_ap):
        d_ap[d_idx] = 0.0

    def loop(self, d_idx, d_m, d_rho, d_ap, d_p, d_V, s_idx, s_m,
             s_rho, s_p, s_V, DWIJ, VIJ, XIJ, R2IJ, EPS):
        Vi = 1.0 / d_V[d_idx]
        Vj = 1.0 / s_V[s_idx]
        etai = d_rho[d_idx]
        etaj = s_rho[s_idx]
        etaij = 2 * self.nu * (etai * etaj) / (etai + etaj)
        vijdotdwij = (DWIJ[0] * VIJ[0] + DWIJ[1] * VIJ[1] +
                      DWIJ[2] * VIJ[2])
        d_ap[d_idx] += (d_rho[d_idx] / s_rho[s_idx] * self.cs *
                        self.cs * s_m[s_idx] * vijdotdwij)
        xijdotdwij = (DWIJ[0] * XIJ[0] + DWIJ[1] * XIJ[1] +
                      DWIJ[2] * XIJ[2])
        tmp = (1.0 / d_m[d_idx] * (Vi * Vi + Vj * Vj) * etaij *
               xijdotdwij / (R2IJ + EPS))
        d_ap[d_idx] += tmp * (d_p[d_idx] - s_p[s_idx])


class MomentumEquationPressureGradient(Equation):
    """TVF pressure gradient with the BQL average-pressure correction
    (reference edac.py:389)."""

    def __init__(self, dest, sources, pb, gx=0., gy=0., gz=0.,
                 tdamp=0.0):
        self.pb = pb
        self.gx = gx
        self.gy = gy
        self.gz = gz
        self.tdamp = tdamp
        super(MomentumEquationPressureGradient, self).__init__(
            dest, sources)

    def initialize(self, d_idx, d_au, d_av, d_aw, d_auhat, d_avhat,
                   d_awhat):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0
        d_auhat[d_idx] = 0.0
        d_avhat[d_idx] = 0.0
        d_awhat[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_m, d_rho, s_rho, d_au, d_av, d_aw,
             d_p, d_pavg, s_p, d_auhat, d_avhat, d_awhat, d_V, s_V,
             DWIJ):
        rhoi = d_rho[d_idx]
        rhoj = s_rho[s_idx]
        pavg = d_pavg[d_idx]
        pij = (rhoj * (d_p[d_idx] - pavg) +
               rhoi * (s_p[s_idx] - pavg)) / (rhoj + rhoi)
        Vi = 1.0 / d_V[d_idx]
        Vj = 1.0 / s_V[s_idx]
        Vi2 = Vi * Vi
        Vj2 = Vj * Vj
        mi1 = 1.0 / d_m[d_idx]
        tmp = -pij * mi1 * (Vi2 + Vj2)
        d_au[d_idx] += tmp * DWIJ[0]
        d_av[d_idx] += tmp * DWIJ[1]
        d_aw[d_idx] += tmp * DWIJ[2]
        tmp = -self.pb * mi1 * (Vi2 + Vj2)
        d_auhat[d_idx] += tmp * DWIJ[0]
        d_avhat[d_idx] += tmp * DWIJ[1]
        d_awhat[d_idx] += tmp * DWIJ[2]

    def post_loop(self, d_idx, d_au, d_av, d_aw, t):
        fac = _damping(t, self.tdamp)
        d_au[d_idx] += self.gx * fac
        d_av[d_idx] += self.gy * fac
        d_aw[d_idx] += self.gz * fac


class EDACTVFStep(IntegratorStep):
    """TVF-form EDAC step (reference edac.py:491)."""

    def initialize(self, d_idx, d_x0, d_y0, d_z0, d_x, d_y, d_z,
                   d_u0, d_v0, d_w0, d_u, d_v, d_w, d_p0, d_p):
        d_x0[d_idx] = d_x[d_idx]
        d_y0[d_idx] = d_y[d_idx]
        d_z0[d_idx] = d_z[d_idx]
        d_u0[d_idx] = d_u[d_idx]
        d_v0[d_idx] = d_v[d_idx]
        d_w0[d_idx] = d_w[d_idx]
        d_p0[d_idx] = d_p[d_idx]

    def stage1(self, d_idx, d_x0, d_y0, d_z0, d_x, d_y, d_z,
               d_u0, d_v0, d_w0, d_u, d_v, d_w, d_p0, d_p, d_au,
               d_av, d_auhat, d_avhat, d_awhat, d_uhat, d_vhat,
               d_what, d_aw, d_ap, dt):
        dtb2 = 0.5 * dt
        d_u[d_idx] = d_u0[d_idx] + dtb2 * d_au[d_idx]
        d_v[d_idx] = d_v0[d_idx] + dtb2 * d_av[d_idx]
        d_w[d_idx] = d_w0[d_idx] + dtb2 * d_aw[d_idx]
        d_uhat[d_idx] = d_u[d_idx] + dtb2 * d_auhat[d_idx]
        d_vhat[d_idx] = d_v[d_idx] + dtb2 * d_avhat[d_idx]
        d_what[d_idx] = d_w[d_idx] + dtb2 * d_awhat[d_idx]
        d_x[d_idx] = d_x0[d_idx] + dtb2 * d_uhat[d_idx]
        d_y[d_idx] = d_y0[d_idx] + dtb2 * d_vhat[d_idx]
        d_z[d_idx] = d_z0[d_idx] + dtb2 * d_what[d_idx]
        d_p[d_idx] = d_p0[d_idx] + dtb2 * d_ap[d_idx]

    def stage2(self, d_idx, d_x0, d_y0, d_z0, d_x, d_y, d_z,
               d_u0, d_v0, d_w0, d_u, d_v, d_w, d_p0, d_p, d_au, d_av,
               d_aw, d_auhat, d_avhat, d_awhat, d_uhat, d_vhat, d_what,
               d_ap, dt):
        d_u[d_idx] = d_u0[d_idx] + dt * d_au[d_idx]
        d_v[d_idx] = d_v0[d_idx] + dt * d_av[d_idx]
        d_w[d_idx] = d_w0[d_idx] + dt * d_aw[d_idx]
        d_uhat[d_idx] = d_u[d_idx] + dt * d_auhat[d_idx]
        d_vhat[d_idx] = d_v[d_idx] + dt * d_avhat[d_idx]
        d_what[d_idx] = d_w[d_idx] + dt * d_awhat[d_idx]
        d_x[d_idx] = d_x0[d_idx] + dt * d_uhat[d_idx]
        d_y[d_idx] = d_y0[d_idx] + dt * d_vhat[d_idx]
        d_z[d_idx] = d_z0[d_idx] + dt * d_what[d_idx]
        d_p[d_idx] = d_p0[d_idx] + dt * d_ap[d_idx]


class EDACScheme(Scheme):
    """The EDAC scheme (reference edac.py:543)."""

    def __init__(self, fluids, solids, dim, c0, nu, rho0, pb=0.0,
                 gx=0.0, gy=0.0, gz=0.0, tdamp=0.0, eps=0.0, h=0.0,
                 edac_alpha=0.5, alpha=0.0, bql=True, clamp_p=False,
                 inlet_outlet_manager=None, inviscid_solids=None):
        self.c0 = c0
        self.nu = nu
        self.rho0 = rho0
        self.gx = gx
        self.gy = gy
        self.gz = gz
        self.tdamp = tdamp
        self.dim = dim
        self.eps = eps
        self.fluids = fluids
        self.solids = solids
        self.pb = pb
        self.solver = None
        self.bql = bql
        self.clamp_p = clamp_p
        self.edac_alpha = edac_alpha
        self.alpha = alpha
        self.h = h
        self.inlet_outlet_manager = inlet_outlet_manager
        self.inviscid_solids = inviscid_solids or []
        self.attributes_changed()

    # Public protocol ###################################################
    def add_user_options(self, group):
        group.add_argument('--alpha', action='store', type=float,
                           dest='alpha', default=None,
                           help='Artificial viscosity alpha.')
        group.add_argument('--edac-alpha', action='store', type=float,
                           dest='edac_alpha', default=None,
                           help='Alpha for the EDAC viscosity.')
        add_bool_argument(group, 'clamp-pressure', dest='clamp_p',
                          help='Clamp boundary pressure non-negative.',
                          default=None)
        add_bool_argument(group, 'use-bql', dest='bql',
                          help='Use the Basa-Quinlan-Lastiwka '
                               'correction.', default=None)
        group.add_argument('--tdamp', action='store', type=float,
                           dest='tdamp', default=None,
                           help='Acceleration damping time.')

    def consume_user_options(self, options):
        data = dict((var, self._smart_getattr(options, var))
                    for var in ('alpha', 'edac_alpha', 'clamp_p', 'bql',
                                'tdamp'))
        self.configure(**data)

    def attributes_changed(self):
        if self.pb is not None:
            self.use_tvf = abs(self.pb) > 1e-14
        if self.h is not None and self.c0 is not None:
            self.art_nu = self.edac_alpha * self.h * self.c0 / 8

    def configure_solver(self, kernel=None, integrator_cls=None,
                         extra_steppers=None, **kw):
        from pysph_tpu.base.kernels import QuinticSpline
        from pysph_tpu.sph.integrator import PECIntegrator
        from pysph_tpu.solver.solver import Solver
        if kernel is None:
            kernel = QuinticSpline(dim=self.dim)
        steppers = {}
        if extra_steppers is not None:
            steppers.update(extra_steppers)
        step_cls = EDACTVFStep if self.use_tvf else EDACStep
        cls = integrator_cls if integrator_cls is not None else \
            PECIntegrator
        for fluid in self.fluids:
            if fluid not in steppers:
                steppers[fluid] = step_cls()
        iom = self.inlet_outlet_manager
        if iom is not None:
            iom.setup_iom(dim=self.dim, kernel=kernel)
            iom_stepper = iom.get_stepper(self, cls, self.use_tvf)
            for name in iom_stepper:
                steppers[name] = iom_stepper[name]
        integrator = cls(**steppers)
        self.solver = Solver(dim=self.dim, integrator=integrator,
                             kernel=kernel, **kw)

    def get_equations(self):
        if self.use_tvf:
            return self._get_internal_flow_equations()
        return self._get_external_flow_equations()

    def setup_properties(self, particles, clean=True):
        particle_arrays = dict((p.name, p) for p in particles)
        tvf_fluid_props = set([
            'uhat', 'vhat', 'what', 'ap', 'auhat', 'avhat', 'awhat',
            'V', 'p0', 'u0', 'v0', 'w0', 'x0', 'y0', 'z0', 'pavg',
            'nnbr'])
        extra = tvf_fluid_props if self.use_tvf else set(EDAC_PROPS)
        all_fluid_props = set(DEFAULT_PROPS).union(extra)
        iom = self.inlet_outlet_manager
        fluids_with_io = list(self.fluids)
        if iom is not None:
            fluids_with_io += iom.get_io_names(ghost=True)
        for fluid in fluids_with_io:
            pa = particle_arrays[fluid]
            self._ensure_properties(pa, all_fluid_props, clean)
            pa.set_output_arrays(['x', 'y', 'z', 'u', 'v', 'w', 'rho',
                                  'p', 'm', 'h', 'V'])
            if 'pavg' in pa.properties:
                pa.add_output_arrays(['pavg'])
            if iom is not None:
                iom.add_io_properties(pa, self)
        tvf_solid_props = ['V', 'wij', 'ax', 'ay', 'az', 'uf', 'vf',
                           'wf', 'ug', 'vg', 'wg']
        if self.inviscid_solids:
            tvf_solid_props += ['xn', 'yn', 'zn', 'uhat', 'vhat',
                                'what']
        extra = tvf_solid_props if self.use_tvf else \
            set(EDAC_SOLID_PROPS)
        all_solid_props = set(DEFAULT_PROPS).union(extra)
        for solid in (self.solids + self.inviscid_solids):
            pa = particle_arrays[solid]
            self._ensure_properties(pa, all_solid_props, clean)
            pa.set_output_arrays(['x', 'y', 'z', 'u', 'v', 'w', 'rho',
                                  'p', 'm', 'h', 'V'])

    # Private protocol ###################################################
    def _get_edac_nu(self):
        return self.art_nu if self.art_nu > 0 else self.nu

    def _get_internal_flow_equations(self):
        from pysph_tpu.sph.wc.transport_velocity import (
            MomentumEquationArtificialStress,
            MomentumEquationArtificialViscosity,
            MomentumEquationViscosity, SolidWallNoSlipBC,
            SummationDensity, VolumeSummation)
        edac_nu = self._get_edac_nu()
        iom = self.inlet_outlet_manager
        fluids_with_io = list(self.fluids)
        all_solids = self.solids + self.inviscid_solids
        if iom is not None:
            fluids_with_io += iom.get_io_names()
        all = fluids_with_io + all_solids
        equations = []
        if iom is not None:
            equations.extend(iom.get_equations(self, self.use_tvf))

        group1 = []
        avg_p_group = []
        has_solids = len(all_solids) > 0
        for fluid in fluids_with_io:
            group1.append(SummationDensity(dest=fluid, sources=all))
            if self.bql:
                eq = ComputeAveragePressure(dest=fluid, sources=all)
                (avg_p_group if has_solids else group1).append(eq)
        for solid in self.solids:
            group1.extend([
                SourceNumberDensity(dest=solid,
                                    sources=fluids_with_io),
                VolumeSummation(dest=solid, sources=all),
                SolidWallPressureBC(dest=solid, sources=fluids_with_io,
                                    gx=self.gx, gy=self.gy,
                                    gz=self.gz),
                SetWallVelocity(dest=solid, sources=fluids_with_io),
            ])
        for solid in self.inviscid_solids:
            group1.extend([
                SourceNumberDensity(dest=solid,
                                    sources=fluids_with_io),
                NoSlipVelocityExtrapolation(dest=solid,
                                            sources=fluids_with_io),
                NoSlipAdvVelocityExtrapolation(
                    dest=solid, sources=fluids_with_io),
                VolumeSummation(dest=solid, sources=all),
                SolidWallPressureBC(dest=solid, sources=fluids_with_io,
                                    gx=self.gx, gy=self.gy,
                                    gz=self.gz),
            ])
        equations.append(Group(equations=group1, real=False))
        if self.bql and has_solids:
            equations.append(Group(equations=avg_p_group, real=True))

        group2 = []
        for fluid in self.fluids:
            group2.append(MomentumEquationPressureGradient(
                dest=fluid, sources=all, pb=self.pb, gx=self.gx,
                gy=self.gy, gz=self.gz, tdamp=self.tdamp))
            if self.alpha > 0.0:
                group2.append(MomentumEquationArtificialViscosity(
                    dest=fluid, sources=fluids_with_io + self.solids,
                    alpha=self.alpha, c0=self.c0))
            if self.nu > 0.0:
                group2.append(MomentumEquationViscosity(
                    dest=fluid, sources=fluids_with_io, nu=self.nu))
            if len(self.solids) > 0 and self.nu > 0.0:
                group2.append(SolidWallNoSlipBC(
                    dest=fluid, sources=self.solids, nu=self.nu))
            group2.extend([
                MomentumEquationArtificialStress(
                    dest=fluid, sources=fluids_with_io),
                EDACEquation(dest=fluid, sources=all, nu=edac_nu,
                             cs=self.c0, rho0=self.rho0),
            ])
        equations.append(Group(equations=group2))
        if iom is not None:
            equations.extend(
                iom.get_equations_post_compute_acceleration())
        return equations

    def _get_external_flow_equations(self):
        from pysph_tpu.sph.basic_equations import XSPHCorrection
        from pysph_tpu.sph.wc.transport_velocity import (
            MomentumEquationArtificialViscosity,
            MomentumEquationViscosity, SolidWallNoSlipBC,
            SummationDensity, VolumeSummation)
        iom = self.inlet_outlet_manager
        fluids_with_io = list(self.fluids)
        all_solids = self.solids + self.inviscid_solids
        if iom is not None:
            fluids_with_io += iom.get_io_names()
        all = fluids_with_io + all_solids
        edac_nu = self._get_edac_nu()
        equations = []
        if iom is not None:
            equations.extend(iom.get_equations(self, self.use_tvf))

        group1 = []
        for fluid in fluids_with_io:
            group1.append(SummationDensity(dest=fluid, sources=all))
        for solid in self.solids:
            group1.extend([
                SourceNumberDensity(dest=solid,
                                    sources=fluids_with_io),
                VolumeSummation(dest=solid, sources=all),
                SolidWallPressureBC(dest=solid, sources=fluids_with_io,
                                    gx=self.gx, gy=self.gy,
                                    gz=self.gz),
                SetWallVelocity(dest=solid, sources=fluids_with_io),
            ])
            if self.clamp_p:
                group1.append(ClampWallPressure(dest=solid,
                                                sources=None))
        for solid in self.inviscid_solids:
            group1.extend([
                SourceNumberDensity(dest=solid,
                                    sources=fluids_with_io),
                NoSlipVelocityExtrapolation(dest=solid,
                                            sources=fluids_with_io),
                VolumeSummation(dest=solid, sources=all),
                SolidWallPressureBC(dest=solid, sources=fluids_with_io,
                                    gx=self.gx, gy=self.gy,
                                    gz=self.gz),
            ])
        equations.append(Group(equations=group1, real=False))

        group2 = []
        for fluid in self.fluids:
            group2.append(MomentumEquation(
                dest=fluid, sources=all, gx=self.gx, gy=self.gy,
                gz=self.gz, c0=self.c0, tdamp=self.tdamp))
            if self.alpha > 0.0:
                group2.append(MomentumEquationArtificialViscosity(
                    dest=fluid, sources=fluids_with_io + self.solids,
                    alpha=self.alpha, c0=self.c0))
            if self.nu > 0.0:
                group2.append(MomentumEquationViscosity(
                    dest=fluid, sources=fluids_with_io, nu=self.nu))
            if len(self.solids) > 0 and self.nu > 0.0:
                group2.append(SolidWallNoSlipBC(
                    dest=fluid, sources=self.solids, nu=self.nu))
            group2.extend([
                EDACEquation(dest=fluid, sources=all, nu=edac_nu,
                             cs=self.c0, rho0=self.rho0),
                XSPHCorrection(dest=fluid, sources=[fluid],
                               eps=self.eps),
            ])
        equations.append(Group(equations=group2))
        if iom is not None:
            equations.extend(
                iom.get_equations_post_compute_acceleration())
        return equations
