"""Inlet/outlet open-boundary framework (parity with
/root/reference/pysph/sph/bc/inlet_outlet_manager.py).

Crossing detection (``IOEvaluate``) runs vectorized on device through
an SPHEvaluator; the actual particle recycling (extract / translate /
remove) is host-side numpy on the ParticleArrays — same split as the
reference, where the update also pulls arrays to the host.  The
``update`` hooks run as integrator post-stage callbacks.
"""

import numpy as np

from pysph_tpu.sph.equation import Equation
from pysph_tpu.sph.integrator_step import IntegratorStep


class InletInfo(object):
    """(reference inlet_outlet_manager.py:13)"""

    def __init__(self, pa_name, normal, refpoint, has_ghost=True,
                 update_cls=None, equations=None, umax=1.0,
                 props_to_copy=None):
        self.pa_name = pa_name
        self.normal = normal
        self.refpoint = refpoint
        self.has_ghost = has_ghost
        self.update_cls = InletBase if update_cls is None else \
            update_cls
        self.length = 0.0
        self.dx = 0.1
        self.umax = umax
        self.equations = [] if equations is None else equations
        self.props_to_copy = props_to_copy


class OutletInfo(InletInfo):
    """(reference inlet_outlet_manager.py:53)"""

    def __init__(self, pa_name, normal, refpoint, has_ghost=False,
                 update_cls=None, equations=None, umax=1.0,
                 props_to_copy=None):
        super(OutletInfo, self).__init__(
            pa_name, normal, refpoint, has_ghost, update_cls,
            equations, umax, props_to_copy)
        self.update_cls = OutletBase if update_cls is None else \
            update_cls


class InletOutletManager(object):
    """(reference inlet_outlet_manager.py:67)"""

    def __init__(self, fluid_arrays, inletinfo, outletinfo,
                 extraeqns=None):
        self.fluids = fluid_arrays
        self.dim = None
        self.kernel = None
        self.inlets = [] if inletinfo is None else \
            [x.pa_name for x in inletinfo]
        self.outlets = [] if outletinfo is None else \
            [x.pa_name for x in outletinfo]
        self.inletinfo = inletinfo or []
        self.outletinfo = outletinfo or []
        self.ghost_inlets = []
        self.ghost_outlets = []
        self.inlet_pairs = {}
        self.outlet_pairs = {}
        self.extraeqns = {} if extraeqns is None else extraeqns
        self.active_stages = []
        self._create_ghost_names()

    def create_ghost(self, pa_arr, inlet=True):
        """Mirror the inlet/outlet particles about the boundary plane
        (reference inlet_outlet_manager.py:112)."""
        from pysph_tpu.base.utils import get_particle_array
        infos = self.inletinfo if inlet else self.outletinfo
        info = next((i for i in infos if i.pa_name == pa_arr.name),
                    None)
        if info is None or not info.has_ghost:
            return None
        xref, yref, zref = info.refpoint
        xn, yn, zn = info.normal
        x = np.asarray(pa_arr.x)
        y = np.asarray(pa_arr.y)
        z = np.asarray(pa_arr.z)
        disp = (x - xref) * xn + (y - yref) * yn + (z - zref) * zn
        pairs = self.inlet_pairs if inlet else self.outlet_pairs
        return get_particle_array(
            name=pairs[pa_arr.name], m=pa_arr.m, x=x - 2 * disp * xn,
            y=y - 2 * disp * yn, z=z - 2 * disp * zn, h=pa_arr.h,
            u=pa_arr.u, p=0.0, rho=pa_arr.rho)

    def _create_ghost_names(self):
        for inlet in self.inletinfo:
            if inlet.has_ghost:
                name = 'ghost_' + inlet.pa_name
                self.inlet_pairs[inlet.pa_name] = name
                self.ghost_inlets.append(name)
        for outlet in self.outletinfo:
            if outlet.has_ghost:
                name = 'ghost_' + outlet.pa_name
                self.outlet_pairs[outlet.pa_name] = name
                self.ghost_outlets.append(name)

    def update_dx(self, dx):
        for info in self.inletinfo + self.outletinfo:
            info.dx = dx

    def _update_inlet_outlet_info(self, pa):
        for info in self.inletinfo + self.outletinfo:
            if info.pa_name != pa.name:
                continue
            dx = info.dx
            x = np.asarray(pa.x)
            y = np.asarray(pa.y)
            z = np.asarray(pa.z)
            xdist = (x.max() + dx / 2) - (x.min() - dx / 2)
            ydist = (y.max() + dx / 2) - (y.min() - dx / 2)
            zdist = (z.max() + dx / 2) - (z.min() - dx / 2)
            xn, yn, zn = info.normal
            info.length = abs(xdist * xn + ydist * yn + zdist * zn)

    def add_io_properties(self, pa, scheme=None):
        """Overridden by method-specific managers."""
        pass

    def get_io_names(self, ghost=False):
        if ghost:
            return (self.inlets + self.outlets + self.ghost_inlets +
                    self.ghost_outlets)
        return self.inlets + self.outlets

    def get_stepper(self, scheme, integrator, **kw):
        raise NotImplementedError()

    def setup_iom(self, dim, kernel):
        self.dim = dim
        self.kernel = kernel

    def get_equations(self, scheme, **kw):
        return []

    def get_equations_post_compute_acceleration(self):
        return []

    def get_inlet_outlet(self, particle_array):
        """Instantiate the updaters (reference
        inlet_outlet_manager.py:239)."""
        result = []
        for inlet in self.inletinfo:
            i_name = inlet.pa_name
            self._update_inlet_outlet_info(particle_array[i_name])
            ghost_pa = particle_array.get(
                self.inlet_pairs.get(i_name))
            for fluid in self.fluids:
                io = inlet.update_cls(
                    particle_array[i_name], particle_array[fluid],
                    inlet, self.kernel, self.dim, self.active_stages,
                    ghost_pa=ghost_pa)
            result.append(io)
        for outlet in self.outletinfo:
            o_name = outlet.pa_name
            self._update_inlet_outlet_info(particle_array[o_name])
            ghost_pa = particle_array.get(
                self.outlet_pairs.get(o_name))
            for fluid in self.fluids:
                io = outlet.update_cls(
                    particle_array[o_name], particle_array[fluid],
                    outlet, self.kernel, self.dim, self.active_stages,
                    ghost_pa=ghost_pa)
            result.append(io)
        return result


class IOEvaluate(Equation):
    """Tag particles by their signed distance past the io plane:
    ioid 0 = inside, 1 = crossed, 2 = beyond maxdist
    (reference inlet_outlet_manager.py:349)."""

    def __init__(self, dest, sources, x, y, z, xn, yn, zn,
                 maxdist=1000.0):
        self.x = x
        self.y = y
        self.z = z
        self.xn = xn
        self.yn = yn
        self.zn = zn
        self.maxdist = maxdist
        super(IOEvaluate, self).__init__(dest, sources)

    def initialize(self, d_ioid, d_idx, d_x, d_y, d_z, d_disp):
        import jax.numpy as jnp
        delx = d_x[d_idx] - self.x
        dely = d_y[d_idx] - self.y
        delz = d_z[d_idx] - self.z
        disp = delx * self.xn + dely * self.yn + delz * self.zn
        d_disp[d_idx] = disp
        d_ioid[d_idx] = jnp.where(
            disp - self.maxdist > 1e-6, 2.0,
            jnp.where(disp > 1e-6, 1.0, 0.0))


class UpdateNormalsAndDisplacements(Equation):
    """(reference inlet_outlet_manager.py:396)"""

    def __init__(self, dest, sources, xn, yn, zn, xo, yo, zo):
        self.xn = xn
        self.yn = yn
        self.zn = zn
        self.xo = xo
        self.yo = yo
        self.zo = zo
        super(UpdateNormalsAndDisplacements, self).__init__(dest,
                                                            sources)

    def loop(self, d_idx, d_xn, d_yn, d_zn, d_x, d_y, d_z, d_disp):
        import jax.numpy as jnp
        d_xn[d_idx] = self.xn
        d_yn[d_idx] = self.yn
        d_zn[d_idx] = self.zn
        xij = [d_x[d_idx] - self.xo, d_y[d_idx] - self.yo,
               d_z[d_idx] - self.zo]
        d_disp[d_idx] = jnp.abs(xij[0] * self.xn + xij[1] * self.yn +
                                xij[2] * self.zn)


class CopyNormalsandDistances(Equation):
    """Copy normals/distances from io particles to their ghosts by
    index (reference inlet_outlet_manager.py:428)."""

    def initialize_pair(self, d_idx, d_xn, d_yn, d_zn, s_xn, s_yn,
                        s_zn, d_disp, s_disp, D_PIDX):
        d_xn[d_idx] = s_xn[D_PIDX]
        d_yn[d_idx] = s_yn[D_PIDX]
        d_zn[d_idx] = s_zn[D_PIDX]
        d_disp[d_idx] = s_disp[D_PIDX]


class InletStep(IntegratorStep):
    """(reference inlet_outlet_manager.py:443)"""

    def initialize(self, d_x0, d_idx, d_x):
        d_x0[d_idx] = d_x[d_idx]

    def stage1(self, d_idx, d_x, d_x0, d_u, dt):
        d_x[d_idx] = d_x0[d_idx] + 0.5 * dt * d_u[d_idx]

    def stage2(self, d_idx, d_x, d_x0, d_u, dt):
        d_x[d_idx] = d_x0[d_idx] + dt * d_u[d_idx]


class OutletStepWithUhat(IntegratorStep):
    """(reference inlet_outlet_manager.py:457)"""

    def initialize(self, d_x0, d_idx, d_x):
        d_x0[d_idx] = d_x[d_idx]

    def stage1(self, d_idx, d_x, d_x0, d_uhat, dt):
        d_x[d_idx] = d_x0[d_idx] + 0.5 * dt * d_uhat[d_idx]

    def stage2(self, d_idx, d_x, d_x0, d_uhat, dt):
        d_x[d_idx] = d_x0[d_idx] + dt * d_uhat[d_idx]


class OutletStep(InletStep):
    """(reference inlet_outlet_manager.py:471)"""


class InletBase(object):
    """Recycle particles crossing inlet -> fluid
    (reference inlet_outlet_manager.py:497)."""

    def __init__(self, inlet_pa, dest_pa, inletinfo, kernel, dim,
                 active_stages=(1,), callback=None, ghost_pa=None):
        self.inlet_pa = inlet_pa
        self.dest_pa = dest_pa
        self.ghost_pa = ghost_pa
        self.callback = callback
        self.dim = dim
        self.kernel = kernel
        self.inletinfo = inletinfo
        self.x = self.y = self.z = 0.0
        self.xn = self.yn = self.zn = 0.0
        self.length = 0.0
        self.dx = 0.0
        self.active_stages = list(active_stages)
        self.io_eval = None
        self._init = False

    def initialize(self):
        info = self.inletinfo
        self.x, self.y, self.z = info.refpoint
        self.xn, self.yn, self.zn = info.normal
        self.length = info.length
        self.dx = info.dx

    def _create_io_eval(self):
        if self.io_eval is None:
            from pysph_tpu.sph.equation import Group
            from pysph_tpu.tools.sph_evaluator import SPHEvaluator
            eqns = [
                Group(equations=[IOEvaluate(
                    self.inlet_pa.name, [], x=self.x, y=self.y,
                    z=self.z, xn=self.xn, yn=self.yn, zn=self.zn,
                    maxdist=self.length)], real=False),
                Group(equations=[IOEvaluate(
                    self.dest_pa.name, [], x=self.x, y=self.y,
                    z=self.z, xn=self.xn, yn=self.yn, zn=self.zn)],
                    real=False),
            ]
            self.io_eval = SPHEvaluator(
                arrays=[self.inlet_pa, self.dest_pa], equations=eqns,
                dim=self.dim, kernel=self.kernel)
        return self.io_eval

    def update(self, time, dt, stage):
        if not self._init:
            self.initialize()
            self._init = True
        if stage not in self.active_stages:
            return
        inlet_pa = self.inlet_pa
        self.io_eval = self._create_io_eval()
        self.io_eval.evaluate()

        io_id = np.asarray(inlet_pa.ioid)
        all_idx = np.where(io_id == 0)[0]
        inlet_pa.extract_particles(all_idx, self.dest_pa)
        # move the recycled particles back to the inlet start
        inlet_pa.x[all_idx] += self.length * self.xn
        inlet_pa.y[all_idx] += self.length * self.yn
        inlet_pa.z[all_idx] += self.length * self.zn
        if self.ghost_pa:
            self.ghost_pa.x[all_idx] -= self.length * self.xn
            self.ghost_pa.y[all_idx] -= self.length * self.yn
            self.ghost_pa.z[all_idx] -= self.length * self.zn
        if self.callback is not None:
            self.callback(self.dest_pa, inlet_pa)


class OutletBase(object):
    """Absorb particles crossing fluid -> outlet and delete them past
    maxdist (reference inlet_outlet_manager.py:624)."""

    def __init__(self, outlet_pa, source_pa, outletinfo, kernel, dim,
                 active_stages=(1,), callback=None, ghost_pa=None):
        self.outlet_pa = outlet_pa
        self.source_pa = source_pa
        self.ghost_pa = ghost_pa
        self.dim = dim
        self.kernel = kernel
        self.outletinfo = outletinfo
        self.x = self.y = self.z = 0.0
        self.xn = self.yn = self.zn = 0.0
        self.length = 0.0
        self.callback = callback
        self.active_stages = list(active_stages)
        self.io_eval = None
        self.props_to_copy = outletinfo.props_to_copy
        self._init = False

    def initialize(self):
        info = self.outletinfo
        self.x, self.y, self.z = info.refpoint
        self.xn, self.yn, self.zn = info.normal
        self.length = info.length

    def _create_io_eval(self):
        if self.io_eval is None:
            from pysph_tpu.sph.equation import Group
            from pysph_tpu.tools.sph_evaluator import SPHEvaluator
            eqns = [
                Group(equations=[IOEvaluate(
                    self.outlet_pa.name, [], x=self.x, y=self.y,
                    z=self.z, xn=self.xn, yn=self.yn, zn=self.zn,
                    maxdist=self.length)], real=False),
                Group(equations=[IOEvaluate(
                    self.source_pa.name, [], x=self.x, y=self.y,
                    z=self.z, xn=self.xn, yn=self.yn, zn=self.zn)],
                    real=False),
            ]
            self.io_eval = SPHEvaluator(
                arrays=[self.outlet_pa, self.source_pa],
                equations=eqns, dim=self.dim, kernel=self.kernel)
        return self.io_eval

    def update(self, time, dt, stage):
        if not self._init:
            self.initialize()
            self._init = True
        if stage not in self.active_stages:
            return
        outlet_pa = self.outlet_pa
        source_pa = self.source_pa
        self.io_eval = self._create_io_eval()
        self.io_eval.evaluate()

        io_id = np.asarray(source_pa.ioid)
        all_idx = np.where(io_id == 1)[0]
        source_pa.extract_particles(all_idx, dest_array=outlet_pa,
                                    props=self.props_to_copy)
        source_pa.remove_particles(all_idx)

        io_id = np.asarray(outlet_pa.ioid)
        all_idx = np.where(io_id == 2)[0]
        outlet_pa.remove_particles(all_idx)
        if self.callback is not None:
            self.callback(source_pa, outlet_pa)
