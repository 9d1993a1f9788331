"""SPH-relaxation particle packing (parity with
/root/reference/pysph/tools/particle_packing.py).

Produces body-fitted, low-noise initial particle distributions by
relaxing free particles under a constant background pressure plus a
short-range repulsion against a frozen boundary layer, with viscous
damping (the reference's ParticlePacking scheme).  The
nearest-boundary-node search uses the chained MIN reduction over the
pair block; particle deletion (points pushed outside the surface) is
a host-side callback like every structural edit in this framework.

Hardpoint pinning and the curved-surface projection (reference
particle_packing.py:989-1074, 1395-1681) are host-side operations
here: ``setup_hardpoints`` replaces the free particle nearest each
hardpoint node with a pinned (``hard``) particle carrying the given
normal, and ``project_to_surface`` snaps the closest free particles
onto the boundary surface along the nearest node's outward normal and
pins them.
"""

import numpy as np

from pysph_tpu.sph.equation import MIN, Equation
from pysph_tpu.sph.integrator import Integrator
from pysph_tpu.sph.integrator_step import IntegratorStep
from pysph_tpu.sph.scheme import Scheme


def get_packing_props():
    return ['u', 'v', 'w', 'au', 'av', 'aw', 'V', 'rho', 'dt_adapt',
            'xn', 'yn', 'zn', 'nearest', 'neartag', 'interior',
            'hard', 'filter', 'proj']


def create_frozen_container_rect(dx, hdx, rho, bound, layers=5,
                                 dim=2, name='frozen'):
    """Frozen boundary layers lining a rectangular domain
    (reference particle_packing.py:360)."""
    from pysph_tpu.base.utils import get_particle_array
    if dim == 2:
        x0, x1, y0, y1 = bound
        ext = layers * dx
        gx, gy = np.mgrid[x0 - ext:x1 + ext + dx / 2:dx,
                          y0 - ext:y1 + ext + dx / 2:dx]
        gx, gy = gx.ravel(), gy.ravel()
        outside = ((gx < x0) | (gx > x1) | (gy < y0) | (gy > y1))
        x, y = gx[outside], gy[outside]
        z = np.zeros_like(x)
        # outward normals of the nearest wall
        xn = np.where(x < x0, -1.0, np.where(x > x1, 1.0, 0.0))
        yn = np.where(y < y0, -1.0, np.where(y > y1, 1.0, 0.0))
        mag = np.sqrt(xn ** 2 + yn ** 2)
        mag[mag == 0] = 1.0
        xn, yn = xn / mag, yn / mag
        zn = np.zeros_like(xn)
        vol = dx * dx
    else:
        x0, x1, y0, y1, z0, z1 = bound
        ext = layers * dx
        gx, gy, gz = np.mgrid[x0 - ext:x1 + ext + dx / 2:dx,
                              y0 - ext:y1 + ext + dx / 2:dx,
                              z0 - ext:z1 + ext + dx / 2:dx]
        gx, gy, gz = gx.ravel(), gy.ravel(), gz.ravel()
        outside = ((gx < x0) | (gx > x1) | (gy < y0) | (gy > y1) |
                   (gz < z0) | (gz > z1))
        x, y, z = gx[outside], gy[outside], gz[outside]
        xn = np.where(x < x0, -1.0, np.where(x > x1, 1.0, 0.0))
        yn = np.where(y < y0, -1.0, np.where(y > y1, 1.0, 0.0))
        zn = np.where(z < z0, -1.0, np.where(z > z1, 1.0, 0.0))
        mag = np.sqrt(xn ** 2 + yn ** 2 + zn ** 2)
        mag[mag == 0] = 1.0
        xn, yn, zn = xn / mag, yn / mag, zn / mag
        vol = dx ** 3
    pa = get_particle_array(
        name=name, x=x, y=y, z=z, m=rho * vol, rho=rho, h=hdx * dx,
        additional_props=get_packing_props())
    pa.xn[:] = xn
    pa.yn[:] = yn
    pa.zn[:] = zn
    pa.hard[:] = 0.0
    return pa


def create_free_particles_rect(dx, hdx, rho, bound, dim=2,
                               name='free'):
    """Jittered interior particles to relax
    (reference particle_packing.py:412)."""
    from pysph_tpu.base.utils import get_particle_array
    rng = np.random.RandomState(7)
    if dim == 2:
        x0, x1, y0, y1 = bound
        gx, gy = np.mgrid[x0 + dx / 2:x1:dx, y0 + dx / 2:y1:dx]
        x, y = gx.ravel(), gy.ravel()
        z = np.zeros_like(x)
        vol = dx * dx
    else:
        x0, x1, y0, y1, z0, z1 = bound
        gx, gy, gz = np.mgrid[x0 + dx / 2:x1:dx, y0 + dx / 2:y1:dx,
                              z0 + dx / 2:z1:dx]
        x, y, z = gx.ravel(), gy.ravel(), gz.ravel()
        vol = dx ** 3
    jitter = 0.05 * dx
    x = x + rng.uniform(-jitter, jitter, x.size)
    y = y + rng.uniform(-jitter, jitter, y.size)
    if dim == 3:
        z = z + rng.uniform(-jitter, jitter, z.size)
    pa = get_particle_array(
        name=name, x=x, y=y, z=z, m=rho * vol, rho=rho, h=hdx * dx,
        additional_props=get_packing_props())
    pa.hard[:] = 0.0
    return pa


class InteriorStep(IntegratorStep):
    """(reference particle_packing.py:698); ``hard`` particles
    (hardpoint pins, surface-projected layer) do not move."""

    def stage1(self, d_idx, d_x, d_y, d_z, d_u, d_v, d_w, d_au, d_av,
               d_aw, d_hard, dt):
        import jax.numpy as jnp
        free = jnp.where(d_hard[d_idx] > 0.5, 0.0, 1.0)
        d_x[d_idx] = d_x[d_idx] + dt * free * d_u[d_idx]
        d_y[d_idx] = d_y[d_idx] + dt * free * d_v[d_idx]
        d_z[d_idx] = d_z[d_idx] + dt * free * d_w[d_idx]
        d_u[d_idx] = free * (d_u[d_idx] + dt * d_au[d_idx])
        d_v[d_idx] = free * (d_v[d_idx] + dt * d_av[d_idx])
        d_w[d_idx] = free * (d_w[d_idx] + dt * d_aw[d_idx])


class SummationDensity(Equation):
    """(reference particle_packing.py:873)"""

    def initialize(self, d_idx, d_V, d_rho):
        d_V[d_idx] = 0.0
        d_rho[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_V, d_rho, d_m, s_m, WIJ):
        d_V[d_idx] += WIJ
        d_rho[d_idx] += s_m[s_idx] * WIJ


class NumberDensityGradient(Equation):
    """Constant background pressure gradient
    (reference particle_packing.py:893)."""

    def initialize(self, d_idx, d_au, d_av, d_aw):
        d_au[d_idx] = 0.0
        d_av[d_idx] = 0.0
        d_aw[d_idx] = 0.0

    def loop(self, d_idx, s_idx, d_m, d_rho, s_rho, d_pb, d_au, d_av,
             d_aw, DWIJ, s_m):
        Vi = d_m[d_idx] / d_rho[d_idx]
        Vj = s_m[s_idx] / s_rho[s_idx]
        tmp = -d_pb[0] * Vi * Vj / d_m[d_idx]
        d_au[d_idx] += tmp * DWIJ[0]
        d_av[d_idx] += tmp * DWIJ[1]
        d_aw[d_idx] += tmp * DWIJ[2]


class ViscousDamping(Equation):
    """(reference particle_packing.py:922)"""

    def post_loop(self, d_idx, d_au, d_av, d_aw, d_nu, d_u, d_v, d_w):
        etai = d_nu[0]
        d_au[d_idx] += -etai * d_u[d_idx]
        d_av[d_idx] += -etai * d_v[d_idx]
        d_aw[d_idx] += -etai * d_w[d_idx]


class RepulsionForce(Equation):
    """Lennard-Jones-like short-range repulsion
    (reference particle_packing.py:947)."""

    def __init__(self, dest, sources, hdx):
        self.hdx = hdx
        super(RepulsionForce, self).__init__(dest, sources)

    def loop(self, d_idx, d_au, d_av, d_aw, RIJ, XIJ, d_h, d_k):
        import jax.numpy as jnp
        ok = RIJ > 1e-14
        rmin = d_h[d_idx] * 0.5
        clipped = RIJ - rmin < 1e-14
        rij = jnp.where(clipped, rmin, RIJ)
        scale = jnp.where(clipped,
                          rmin / jnp.where(ok, RIJ, 1.0), 1.0)
        xij = XIJ[0] * scale
        yij = XIJ[1] * scale
        zij = XIJ[2] * scale
        c = self.hdx * d_h[d_idx] * 2.0 / 3.0
        tmp = 12.0 * d_k[0] * (3 * c ** 2 / rij ** 5 -
                               2 * c / rij ** 4)
        use = ok & (tmp > 1e-14)
        d_au[d_idx] += jnp.where(use, tmp * xij, 0.0)
        d_av[d_idx] += jnp.where(use, tmp * yij, 0.0)
        d_aw[d_idx] += jnp.where(use, tmp * zij, 0.0)


class EvaluateAdaptiveTime(Equation):
    """(reference particle_packing.py:844)"""

    def initialize(self, d_idx, d_dt_adapt, d_u, d_v, d_w, d_au,
                   d_av, d_aw, dt, t, d_h, d_pb, d_nu):
        import jax.numpy as jnp
        Vx = d_u[d_idx] + d_au[d_idx] * dt
        Vy = d_v[d_idx] + d_av[d_idx] * dt
        Vz = d_w[d_idx] + d_aw[d_idx] * dt
        V = jnp.sqrt(Vx ** 2 + Vy ** 2 + Vz ** 2)
        dt_visc = jnp.where(
            V > 1e-14,
            jnp.sqrt(0.1 * d_h[d_idx] / d_nu[0] /
                     jnp.maximum(V, 1e-14)), 1e4)
        dt_pb = 0.1 * d_h[d_idx] / jnp.sqrt(d_pb[0])
        dt_ = jnp.minimum(dt_visc, dt_pb)
        d_dt_adapt[d_idx] = jnp.where(t < 1e-14, 1e-7, dt_)


class FindNearestNode(Equation):
    """Nearest frozen boundary node + its normal (reference
    particle_packing.py:809); argmin via chained MIN reductions, the
    normal gathered in particle space afterwards."""

    def __init__(self, dest, sources, fac=1.0):
        self.fac = fac
        super(FindNearestNode, self).__init__(dest, sources)

    def initialize(self, d_idx, d_nearest, d_neartag, d_xn, d_yn,
                   d_zn):
        d_nearest[d_idx] = 1e30
        d_neartag[d_idx] = 1e30
        d_xn[d_idx] = 0.0
        d_yn[d_idx] = 0.0
        d_zn[d_idx] = 0.0

    def loop(self, d_idx, s_idx, RIJ, d_nearest, d_neartag, d_xn,
             d_yn, d_zn, s_xn, s_yn, s_zn, NBRS):
        import jax.numpy as jnp
        big = 1e30
        rij = jnp.where(RIJ > 1e-14, RIJ, big)
        d_nearest[d_idx] = MIN(rij, d_nearest[d_idx])
        rmin = d_nearest[d_idx]
        cand = jnp.where(rij <= rmin * (1 + 1e-7),
                         NBRS.astype(rij.dtype), big)
        d_neartag[d_idx] = MIN(cand, d_neartag[d_idx])
        # copy the matched node's outward normal (exactly one match)
        match = NBRS == d_neartag[d_idx]
        d_xn[d_idx] += jnp.where(match, s_xn[s_idx], 0.0)
        d_yn[d_idx] += jnp.where(match, s_yn[s_idx], 0.0)
        d_zn[d_idx] += jnp.where(match, s_zn[s_idx], 0.0)


class FindExternalParticles(Equation):
    """Flag free particles pushed outside the boundary surface
    (reference particle_packing.py:733): positive projection of the
    vector to the nearest boundary node on its outward normal."""

    def initialize(self, d_idx, d_interior, d_proj):
        d_interior[d_idx] = 0.0
        d_proj[d_idx] = 0.0

    def loop(self, d_idx, s_idx, s_xn, s_yn, s_zn, XIJ, d_neartag,
             d_interior, d_proj, NBRS):
        import jax.numpy as jnp
        match = NBRS == d_neartag[d_idx]
        proj = (XIJ[0] * s_xn[s_idx] + XIJ[1] * s_yn[s_idx] +
                XIJ[2] * s_zn[s_idx])
        d_interior[d_idx] += jnp.where(
            match, jnp.where(proj > 1e-14, 1.0, -1.0), 0.0)
        # signed perpendicular distance to the surface along the
        # nearest node's outward normal (negative inside) — the
        # curved-surface projection measure (reference
        # ProjectionToSurfaceBoundary, particle_packing.py:1055)
        d_proj[d_idx] += jnp.where(match, proj, 0.0)

    @staticmethod
    def remove_external(pa):
        """Host: drop particles flagged outside (interior == 1 means
        past the outward normal of the nearest wall node)."""
        idx = np.where(np.asarray(pa.interior) > 0.5)[0]
        if idx.size:
            pa.remove_particles(idx)
        return idx.size


class _PackingIntegrator(Integrator):
    def one_timestep(self, t, dt):
        self.compute_accelerations()
        self.stage1()
        self.update_domain()
        self.do_post_stage(dt, 1)


class ParticlePacking(Scheme):
    """SPH-relaxation packing scheme
    (reference particle_packing.py:1075, reduced: rectangular/frozen
    containers; no hardpoints or surface projection yet)."""

    def __init__(self, fluids, solids, frozen, dim, hdx=1.2, dx=0.1,
                 nu=None, pb=None, k=None, dfreq=-1, hardpoints=None,
                 use_prediction=None, filter_layers=None,
                 reduce_dfreq=None, tol=None):
        self.fluids = fluids
        self.solids = solids
        self.frozen = frozen
        self.solver = None
        self.dx = dx
        self.hdx = hdx
        self.dim = dim
        self.nu = nu
        self.pb = pb
        self.k = k
        self.dfreq = dfreq
        self.tol = tol
        #: {frozen-node index: (nx, ny, nz) outward normal}
        self.hardpoints = dict(hardpoints or {})
        self.rho0 = 1.0
        self._defaults()

    def _defaults(self):
        dx = self.dx
        if self.pb is None:
            self.pb = 1.0
        if self.nu is None:
            self.nu = 0.2 / dx if self.dim == 2 else 0.5 / dx
        if self.k is None:
            self.k = 0.004 * dx if self.dim == 2 else 0.006 * dx
        if self.dfreq < 0:
            self.dfreq = 50
        if self.tol is None:
            self.tol = 1e-2

    def add_user_options(self, group):
        group.add_argument('--pb', action='store', type=float,
                           dest='pb', default=None,
                           help='Background pressure.')
        group.add_argument('--nu', action='store', type=float,
                           dest='nu', default=None,
                           help='Damping viscosity.')
        group.add_argument('--k', action='store', type=float,
                           dest='k', default=None,
                           help='Repulsion spring constant.')
        group.add_argument('--dfreq', action='store', type=int,
                           dest='dfreq', default=None,
                           help='External-particle deletion period.')

    def consume_user_options(self, options):
        data = dict((var, self._smart_getattr(options, var)) for var
                    in ('pb', 'nu', 'k', 'dfreq'))
        self.configure(**data)
        self._defaults()

    def configure_solver(self, kernel=None, integrator_cls=None,
                         extra_steppers=None, **kw):
        from pysph_tpu.base.kernels import QuinticSpline
        from pysph_tpu.solver.solver import Solver
        if kernel is None:
            kernel = QuinticSpline(dim=self.dim)
        steppers = {}
        if extra_steppers is not None:
            steppers.update(extra_steppers)
        for name in self.fluids:
            if name not in steppers:
                steppers[name] = InteriorStep()
        cls = integrator_cls if integrator_cls is not None else \
            _PackingIntegrator
        integrator = cls(**steppers)
        kw.setdefault('dt', 1e-4)
        self.solver = Solver(dim=self.dim, integrator=integrator,
                             kernel=kernel, **kw)

    def get_equations(self):
        from pysph_tpu.sph.equation import Group
        all_pa = self.fluids + self.frozen
        equations = []
        equations.append(Group(equations=[
            SummationDensity(dest=f, sources=all_pa)
            for f in self.fluids]))
        g2 = []
        for f in self.fluids:
            g2.append(NumberDensityGradient(dest=f, sources=all_pa))
            g2.append(RepulsionForce(dest=f, sources=all_pa,
                                     hdx=self.hdx))
            g2.append(ViscousDamping(dest=f, sources=None))
        equations.append(Group(equations=g2))
        g3 = []
        for f in self.fluids:
            for fr in self.frozen:
                g3.append(FindNearestNode(dest=f, sources=[fr]))
                g3.append(FindExternalParticles(dest=f,
                                                sources=[fr]))
            g3.append(EvaluateAdaptiveTime(dest=f, sources=None))
        equations.append(Group(equations=g3))
        return equations

    def setup_properties(self, particles, clean=True):
        for pa in particles:
            for prop in get_packing_props():
                if prop not in pa.properties:
                    pa.add_property(prop)
            for cname, val in (('pb', self.pb), ('nu', self.nu),
                               ('k', self.k)):
                if cname not in pa.constants:
                    pa.add_constant(cname, np.array([val]))

    def setup_hardpoints(self, fluid_pa, frozen_pa):
        """Pin a particle at every hardpoint node (reference
        setup_hardpoints, particle_packing.py:1629): the nearest free
        particle is removed and replaced by a ``hard`` particle
        sitting exactly on the node with the prescribed normal.  Call
        once after create_particles, before solving."""
        if not self.hardpoints:
            return
        ids = sorted(self.hardpoints)
        xh = np.asarray(frozen_pa.x)[ids]
        yh = np.asarray(frozen_pa.y)[ids]
        zh = np.asarray(frozen_pa.z)[ids]
        fx = np.asarray(fluid_pa.x)
        fy = np.asarray(fluid_pa.y)
        fz = np.asarray(fluid_pa.z)
        # nearest free particle per hardpoint
        d2 = ((fx[None, :] - xh[:, None]) ** 2 +
              (fy[None, :] - yh[:, None]) ** 2 +
              (fz[None, :] - zh[:, None]) ** 2)
        nearest = np.argmin(d2, axis=1)
        fluid_pa.remove_particles(np.unique(nearest))
        normals = np.array([self.hardpoints[i] for i in ids],
                           dtype=np.float64).reshape(len(ids), -1)
        if normals.shape[1] < 3:
            normals = np.pad(normals,
                             ((0, 0), (0, 3 - normals.shape[1])))
        add = dict(x=xh, y=yh, z=zh,
                   m=np.full(len(ids), float(fluid_pa.m[0])),
                   h=np.full(len(ids), float(fluid_pa.h[0])),
                   rho=np.full(len(ids), float(fluid_pa.rho[0])),
                   xn=normals[:, 0], yn=normals[:, 1],
                   zn=normals[:, 2],
                   hard=np.ones(len(ids)))
        fluid_pa.add_particles(**add)

    def project_to_surface(self, fluid_pa, frac=0.9):
        """Curved-surface projection (reference
        _project_particles_to_boundary, particle_packing.py:1395):
        snap the free particles closest to the surface onto it along
        the nearest node's outward normal and pin them, producing a
        body-fitted boundary layer.  Requires the nearest-node props
        (run the packing equations at least once first)."""
        xn = np.asarray(fluid_pa.xn)
        yn = np.asarray(fluid_pa.yn)
        zn = np.asarray(fluid_pa.zn)
        has_node = (np.abs(xn) + np.abs(yn) + np.abs(zn)) > 1e-12
        x = np.array(fluid_pa.x)
        y = np.array(fluid_pa.y)
        z = np.array(fluid_pa.z)
        proj = np.asarray(fluid_pa.proj)
        hard = np.array(fluid_pa.hard)
        cand = np.where(has_node & (hard < 0.5) &
                        (np.abs(proj) < 2 * float(fluid_pa.h[0])))[0]
        if not cand.size:
            return 0
        take = cand[np.argsort(np.abs(proj[cand]))]
        take = take[:max(1, int(frac * take.size))]
        # proj = (x_p - x_node) . n (negative inside); the foot of the
        # perpendicular onto the surface is x_p - proj * n
        x[take] -= proj[take] * xn[take]
        y[take] -= proj[take] * yn[take]
        z[take] -= proj[take] * zn[take]
        hard[take] = 1.0
        fluid_pa.x[:] = x
        fluid_pa.y[:] = y
        fluid_pa.z[:] = z
        fluid_pa.hard[:] = hard
        fluid_pa.u[take] = 0.0
        fluid_pa.v[take] = 0.0
        fluid_pa.w[take] = 0.0
        return take.size

    def make_deletion_callback(self, fluid_pa):
        """Post-step callback deleting particles outside the surface
        every ``dfreq`` steps (host side)."""
        def _cb(solver):
            if solver.count % self.dfreq:
                return
            solver._sync_to_host()
            removed = FindExternalParticles.remove_external(fluid_pa)
            if removed:
                solver._sync_to_device()
                solver._nnps_carry = None
        return _cb
