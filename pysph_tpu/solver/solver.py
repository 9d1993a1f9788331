"""The Solver: owns the time loop and device state.

Mirrors /root/reference/pysph/solver/solver.py:21 (time loop, adaptive and
damped timesteps, output at pfreq/output_at_times with dt landing,
callbacks, dump/load) with a TPU-native execution model:

- Particle state lives on device as a pytree; the whole integrator timestep
  is one jitted pure function (``integrator.step``).
- The adaptive timestep is computed on device; only the scalar dt crosses
  to the host (needed anyway to decide loop termination/output).
- Neighbor-capacity overflows (more true neighbors than the static K) are
  detected each step; the solver grows the capacities, re-jits, and redoes
  the step from the saved pre-step state, so results are never silently
  wrong.
"""

import logging
import os

import jax
import numpy as np

from pysph_tpu.base.cell_grid import GridSpec
from pysph_tpu.base.kernels import CubicSpline
from pysph_tpu.solver.output import dump as dump_func
from pysph_tpu.solver.output import load as load_func
from pysph_tpu.solver.utils import ProgressBar, mkdir

logger = logging.getLogger(__name__)

EPSILON = 1e-14


class Solver(object):
    def __init__(self, dim=2, integrator=None, kernel=None, n_damp=0,
                 tf=1.0, dt=1e-3, adaptive_timestep=False, cfl=0.3,
                 output_at_times=(), fixed_h=False, **kw):
        self.integrator = integrator
        self.dim = dim
        self.kernel = kernel if kernel is not None else CubicSpline(dim)
        self.particles = None
        self.acceleration_evals = None
        self.nnps = None
        self.domain = None
        self.t = 0.0
        self.count = 0
        self.execute_commands = None
        self.command_interval = 1
        self.pre_step_callbacks = []
        self.post_step_callbacks = []
        self.post_stage_callbacks = []
        self.pfreq = 100
        self.disable_output = False
        self.compress_output = False
        self.detailed_output = False
        self.output_only_real = True
        self.fname = self.__class__.__name__
        self.output_directory = self.fname + '_output'
        self.n_damp = n_damp
        from pysph_tpu.utils.profile import ProfileRegistry
        self.profiler = ProfileRegistry()
        self.adaptive_timestep = adaptive_timestep
        self.cfl = cfl
        self.output_at_times = np.asarray(output_at_times)
        self.tf = tf
        self.dt = dt
        self.max_steps = 1 << 31
        self.fixed_h = fixed_h
        self.rank = 0
        self.in_parallel = False
        self.arrays_to_print = []
        self._prev_dt = None
        self._damping_factor = 1.0
        self._epsilon = EPSILON * tf
        self.states = None
        self._step_fn = None
        self._adapt_fn = None
        # steps per device dispatch in the steady-state solve loop
        # (amortizes the ~28 ms host round trip per scalar fetch)
        self.chunk_steps = 10
        for key, value in kw.items():
            setattr(self, key, value)

    # ------------------------------------------------------------------
    # Setup
    # ------------------------------------------------------------------
    def setup(self, particles, equations, nnps=None, kernel=None,
              fixed_h=False):
        """Compile the equations/integrator against the particles
        (reference solver.py:186)."""
        from pysph_tpu.sph.acceleration_eval import make_acceleration_evals

        self.particles = particles
        if kernel is not None:
            self.kernel = kernel
        self.equations = equations
        self.acceleration_evals = make_acceleration_evals(
            particles, equations, self.kernel, domain=self.domain)
        if nnps is None:
            nnps = GridSpec.from_particles(
                particles, dim=self.dim,
                radius_scale=self.kernel.radius_scale,
                domain=self.domain)
        self.nnps = nnps
        integrator = self.integrator
        integrator.set_acceleration_evals(self.acceleration_evals)
        integrator.set_nnps(nnps)
        if self.domain is not None:
            integrator.set_domain(self.domain)
        integrator.set_fixed_h(fixed_h or self.fixed_h)
        self._sync_to_device()
        self._calibrate_windows()
        self._make_jits()

    def set_domain(self, domain):
        self.domain = domain

    def _sync_to_device(self):
        self.states = {}
        for pa in self.particles:
            state, _ = pa.to_device(capacity=self._mirror_capacity(pa))
            self.states[pa.name] = state

    def _mirror_capacity(self, pa):
        """Initial flat capacity with headroom for mirror-image ghosts
        (None = the ParticleArray default).  2x the initial near-face
        count covers corner images and in-run drift; runtime overflow
        still grows via ``mirror_overflow``."""
        dom = self.domain
        if dom is None or not getattr(dom, 'is_mirror', False):
            return None
        n = pa.get_number_of_particles()
        if n == 0:
            return None
        hmax = 0.0
        for p in self.particles:
            if p.get_number_of_particles():
                hmax = max(hmax, float(np.max(p.h)))
        spec = self.nnps
        band = (dom.n_layers * spec.cell_slack * spec.radius_scale *
                hmax)
        x = np.asarray(pa.x)
        y = np.asarray(pa.y)
        z = np.asarray(pa.z)
        g = 0
        for flag, c, lo, hi in (
                (dom.mirror_in_x, x, dom.xmin, dom.xmax),
                (dom.mirror_in_y, y, dom.ymin, dom.ymax),
                (dom.mirror_in_z, z, dom.zmin, dom.zmax)):
            if flag:
                g += int(np.sum(c - lo <= band))
                g += int(np.sum(hi - c <= band))
        cap = n + 2 * g + 128
        return -(-cap // 128) * 128

    def _sync_to_host(self):
        if self._blob is not None:
            # fold any resident packs first: the flat blob is stale
            # for pack props between sync points (ops/resident.py)
            if self._cblob is not None:
                self._blob = self._packed['mat'](self._blob,
                                                 self._cblob)
            self.states = self._packed['sp_unpack'](self._blob)
        elif self._nnps_carry is not None and \
                getattr(self, '_mat_fn', None) is not None:
            self.states = self._mat_fn(self.states, self._nnps_carry)
        for pa in self.particles:
            pa.update_from_device(
                jax.tree_util.tree_map(np.asarray, self.states[pa.name]))

    def _make_jits(self):
        integrator = self.integrator

        def step(states, t, dt, carry):
            return integrator.step(states, t, dt, carry)

        def adapt(states, dt, carry):
            return integrator.compute_time_step(states, dt, self.cfl,
                                                carry)

        def init_accel(states, t, dt):
            return integrator.initial_acceleration(states, t, dt)

        def mat(states, carry):
            return integrator.materialize_states(states, carry)

        self._step_fn = jax.jit(step)
        self._adapt_fn = jax.jit(adapt)
        self._init_accel_fn = jax.jit(init_accel)
        self._mat_fn = jax.jit(mat)
        self._nnps_carry = None
        self._packed = None
        self._blob = None
        self._cblob = None

    # -- packed-transport mode -----------------------------------------
    # Every jit OUTPUT buffer pays a fixed runtime dispatch cost (large
    # through the remote TPU tunnel); a step returns O(100) property
    # arrays.  In steady state the solver therefore carries the state
    # as one flat blob per dtype across step calls and only unpacks at
    # sync points (output dumps, callbacks, end of run).
    def _build_packed(self, carry):
        from pysph_tpu.utils.packing import make_packer
        integ = self.integrator
        sp_pack, sp_unpack = make_packer(self.states)
        cp_pack, cp_unpack = make_packer(carry)
        out_sd = jax.eval_shape(
            lambda s, t, dt, c: integ.step(s, t, dt, c),
            self.states, self.t, self.dt, carry)
        dp_pack, dp_unpack = make_packer(out_sd[1])

        def stepp(blob, t, dt, cblob):
            s2, diag, c2 = integ.step(sp_unpack(blob), t, dt,
                                      cp_unpack(cblob))
            return sp_pack(s2), dp_pack(diag), cp_pack(c2)

        def adaptp(blob, dt, cblob):
            return integ.compute_time_step(
                sp_unpack(blob), dt, self.cfl,
                cp_unpack(cblob) if cblob is not None else None)

        def matp(blob, cblob):
            states = integ.materialize_states(sp_unpack(blob),
                                              cp_unpack(cblob))
            return sp_pack(states)

        # K steps per dispatch: the host pays one scalar fetch per
        # chunk instead of one (or two) ~28 ms round trips per step.
        # Time accumulates on device in compensated (Kahan) f32 so the
        # sum matches host-f64 accumulation to a few ulps.
        K = self.chunk_steps
        adaptive = self.adaptive_timestep
        cfl = self.cfl

        def chunkp(blob, cblob, th, tl, dt0, t_stop, n_real):
            import jax.numpy as jnp

            def one_step(args):
                blob, cblob, t, dt = args
                s2, diag, c2 = integ.step(sp_unpack(blob), t, dt,
                                          cp_unpack(cblob))
                return (sp_pack(s2), cp_pack(c2),
                        diag['cell_overflow'],
                        diag['extent_overflow'],
                        diag['block_overflow'],
                        diag.get('window_overflow',
                                 jnp.asarray(False)),
                        diag.get('mirror_overflow',
                                 jnp.asarray(False)))

            def skip(args):
                blob, cblob, _t, _dt = args
                return (blob, cblob, jnp.asarray(False),
                        jnp.asarray(False), jnp.asarray(False),
                        jnp.asarray(False), jnp.asarray(False))

            def body(carry, idx):
                (blob, cblob, th, tl, dt, dt_un, oc, oe, ob, ow, om,
                 nd) = carry
                active = (dt > 0.0) & (idx < n_real)
                (blob, cblob, c_ovf, e_ovf, b_ovf, w_ovf,
                 m_ovf) = jax.lax.cond(
                    active, one_step, skip, (blob, cblob, th + tl,
                                             dt))
                # Kahan: th + tl is the true time; only advance it on
                # real steps
                y = jnp.where(active, dt, 0.0) + tl
                t2 = th + y
                tl2 = y - (t2 - th)
                th2 = t2
                if adaptive:
                    raw = jnp.asarray(integ.compute_time_step(
                        sp_unpack(blob), dt, cfl,
                        cp_unpack(cblob)), dt.dtype)
                else:
                    raw = dt
                rem = t_stop - (th2 + tl2)
                dtn = jnp.minimum(raw, jnp.maximum(rem, 0.0))
                dtn = jnp.where(rem > 1e-6 * jnp.maximum(dt, dt0),
                                dtn, 0.0)
                # inactive iterations carry dt through so the host
                # gets the correct next-step dt back; dt_un is the
                # uncapped dt for resuming after an output-time stop
                dtn = jnp.where(active, dtn, dt)
                dt_un = jnp.where(active, raw, dt_un)
                return (blob, cblob, th2, tl2, dtn, dt_un, oc | c_ovf,
                        oe | e_ovf, ob | b_ovf, ow | w_ovf,
                        om | m_ovf,
                        nd + active.astype(jnp.int32)), 0

            fdt = th.dtype
            init = (blob, cblob, th, tl, jnp.asarray(dt0, fdt),
                    jnp.asarray(dt0, fdt), jnp.asarray(False),
                    jnp.asarray(False), jnp.asarray(False),
                    jnp.asarray(False), jnp.asarray(False),
                    jnp.asarray(0, jnp.int32))
            (blob, cblob, th, tl, dtn, dt_un, oc, oe, ob, ow, om,
             nd), _ = jax.lax.scan(body, init, jnp.arange(K))
            scal = jnp.stack([th.astype(jnp.float32),
                              tl.astype(jnp.float32),
                              dtn.astype(jnp.float32),
                              nd.astype(jnp.float32),
                              oc.astype(jnp.float32),
                              oe.astype(jnp.float32),
                              dt_un.astype(jnp.float32),
                              ob.astype(jnp.float32),
                              ow.astype(jnp.float32),
                              om.astype(jnp.float32)])
            return blob, cblob, scal

        self._packed = {
            'sp_pack': jax.jit(sp_pack),
            'sp_unpack': jax.jit(sp_unpack),
            'cp_pack': jax.jit(cp_pack),
            'dp_unpack': dp_unpack,
            'step': jax.jit(stepp),
            'adapt': jax.jit(adaptp),
            'mat': jax.jit(matp),
            'cp_unpack': jax.jit(cp_unpack),
            'chunk': jax.jit(chunkp),
        }

    def _enter_packed(self, carry):
        self._build_packed(carry)
        self._blob = self._packed['sp_pack'](self.states)
        self._cblob = self._packed['cp_pack'](carry)

    def _exit_packed(self):
        if self._blob is not None:
            if self._cblob is not None:
                self._blob = self._packed['mat'](self._blob,
                                                 self._cblob)
                # _nnps_carry froze at _enter_packed time; the live
                # carry (with current resident packs) is in _cblob.
                # A stale carry here would re-materialize old packs
                # over the fresh states at the next sync.
                self._nnps_carry = self._packed['cp_unpack'](
                    self._cblob)
            self.states = self._packed['sp_unpack'](self._blob)
            self._blob = None
            self._cblob = None

    def _packed_eligible(self):
        return (self._nnps_carry is not None and
                not self.pre_step_callbacks and
                not self.post_step_callbacks and
                self.execute_commands is None)

    # ------------------------------------------------------------------
    # Callback / configuration API (reference solver.py:231-423)
    # ------------------------------------------------------------------
    def add_pre_step_callback(self, callback):
        self.pre_step_callbacks.append(callback)

    def add_post_step_callback(self, callback):
        self.post_step_callbacks.append(callback)

    def add_post_stage_callback(self, callback):
        self.post_stage_callbacks.append(callback)
        self.integrator.set_post_stage_callback(callback)

    def append_particle_arrrays(self, arrays):
        for array in arrays:
            self.particles.append(array)
        self._sync_to_device()

    def set_adaptive_timestep(self, value):
        self.adaptive_timestep = value

    def set_cfl(self, value):
        self.cfl = value

    def set_time_step(self, dt):
        self.dt = dt

    def set_final_time(self, tf):
        self.tf = tf
        self._epsilon = EPSILON * tf

    def set_max_steps(self, max_steps):
        self.max_steps = max_steps

    def set_print_freq(self, n):
        self.pfreq = n

    def set_disable_output(self, value):
        self.disable_output = value

    def set_arrays_to_print(self, array_names=None):
        self.arrays_to_print = array_names or []

    def set_output_fname(self, fname):
        self.fname = fname

    def set_output_directory(self, path):
        self.output_directory = path

    def set_compress_output(self, compress):
        self.compress_output = compress

    def set_output_only_real(self, output_only_real):
        self.output_only_real = output_only_real

    def set_output_at_times(self, output_at_times):
        self.output_at_times = np.asarray(output_at_times)

    def set_detailed_output(self, detailed_output):
        self.detailed_output = detailed_output

    def set_n_damp(self, n):
        self.n_damp = n

    def set_command_handler(self, callable, command_interval=1):
        self.execute_commands = callable
        self.command_interval = command_interval

    def barrier(self):
        pass

    # ------------------------------------------------------------------
    # The time loop (reference solver.py:425-513)
    # ------------------------------------------------------------------
    def solve(self, show_progress=True):
        bar = ProgressBar(self.t, self.tf, show=show_progress)
        self._epsilon = EPSILON * self.tf

        self.dump_output()
        states, diag, carry = self._init_accel_fn(
            self.states, self.t, self.dt)
        if self._check_overflow(diag):
            self._handle_overflow(diag)
            states, diag, carry = self._init_accel_fn(
                self.states, self.t, self.dt)
        self.states = states
        self._nnps_carry = carry
        self.dt = self._get_timestep()

        if self._packed_eligible():
            self._enter_packed(self._nnps_carry)

        K = self.chunk_steps
        while ((self.tf - self.t) > self._epsilon and
               self.count < self.max_steps):
            for callback in self.pre_step_callbacks:
                callback(self)

            chunkable = (
                self._blob is not None and K > 1 and
                self.count >= self.n_damp and
                self.execute_commands is None and
                self._prev_dt is None)
            if chunkable:
                # land exactly on the next dump / output-time /
                # max_steps boundary; K stays static (no recompile),
                # extra iterations no-op via the in-chunk mask
                n_real = min(K, self.pfreq - self.count % self.pfreq,
                             self.max_steps - self.count)
                t_stop = self.tf
                if len(self.output_at_times):
                    fut = self.output_at_times[
                        self.output_at_times > self.t +
                        1e-10 * self.tf]
                    if len(fut):
                        t_stop = min(t_stop, float(np.min(fut)))
                th = np.float32(self.t)
                tl = np.float32(self.t - float(th))
                pre_blob, pre_cblob = self._blob, self._cblob
                with self.profiler.timer('solve.chunk_dispatch'):
                    blob, cblob, scal = self._packed['chunk'](
                        self._blob, self._cblob, th, tl,
                        np.float32(self.dt), np.float32(t_stop),
                        np.int32(n_real))
                    scal = np.asarray(scal)  # ONE host round trip
                if (scal[4] > 0 or scal[5] > 0 or scal[7] > 0 or
                        scal[8] > 0 or scal[9] > 0):
                    # overflow somewhere in the chunk: grow the grid
                    # and redo from the saved pre-chunk state,
                    # per-step (the packed carry shape changed).
                    self._blob = pre_blob
                    self._cblob = pre_cblob
                    self._exit_packed()
                    self._handle_overflow(
                        {'cell_overflow': bool(scal[4]),
                         'extent_overflow': bool(scal[5]),
                         'block_overflow': bool(scal[7]),
                         'window_overflow': bool(scal[8]),
                         'mirror_overflow': bool(scal[9])})
                    new_states, diag, carry = self._step_fn(
                        self.states, self.t, self.dt, None)
                    self.states = new_states
                    self._nnps_carry = carry
                    self._enter_packed(carry)
                    self.t += self.dt
                    self.count += 1
                    self._epsilon = EPSILON * self.tf * self.count
                    self.dt = self._get_timestep()
                    self._dump_output_if_needed()
                    bar.update(self.t)
                    continue
                self._blob = blob
                self._cblob = cblob
                n_done = int(scal[3])
                self.t = float(scal[0]) + float(scal[1])
                self.count += n_done
                self._epsilon = EPSILON * self.tf * self.count
                self.dt = float(scal[2])
                stopped = n_done < n_real or self.dt <= 0.0
                if stopped and t_stop < self.tf - self._epsilon:
                    # landed on an output time (within f32 rounding;
                    # the last dt was chosen to land exactly)
                    self.t = t_stop
                    self.dump_output()
                    self.dt = float(scal[6])
                    bar.update(self.t)
                    continue
                self._dump_output_if_needed()
                bar.update(self.t)
                if stopped:
                    break  # hit tf inside the chunk
                continue

            if self._blob is not None:
                pre_blob = self._blob
                with self.profiler.timer('solve.step_dispatch'):
                    blob, dblob, cblob = self._packed['step'](
                        self._blob, self.t, self.dt, self._cblob)
                    # fetch the diag blob(s) once: bool() on each
                    # flag separately costs a ~28 ms round trip each
                    dblob = {k: np.asarray(v)
                             for k, v in dblob.items()}
                if any(v.any() for v in dblob.values()):
                    diag = jax.tree_util.tree_map(
                        lambda a: bool(np.asarray(a)),
                        self._packed['dp_unpack'](dblob))
                else:
                    diag = {'cell_overflow': False,
                            'extent_overflow': False,
                            'block_overflow': False,
                            'window_overflow': False,
                            'mirror_overflow': False}
                if self._check_overflow(diag):
                    # grow capacities, re-jit, and redo the step from
                    # the saved pre-step state.
                    self._blob = pre_blob
                    self._exit_packed()
                    self._handle_overflow(diag)
                    new_states, diag, carry = self._step_fn(
                        self.states, self.t, self.dt, None)
                    self.states = new_states
                    self._nnps_carry = carry
                    self._enter_packed(carry)
                else:
                    self._blob = blob
                    self._cblob = cblob
            else:
                pre_states = self.states
                with self.profiler.timer('solve.step_dispatch'):
                    new_states, diag, carry = self._step_fn(
                        self.states, self.t, self.dt,
                        self._nnps_carry)
                if self._check_overflow(diag):
                    # grow capacities, re-jit, and redo the step from
                    # the saved pre-step state so no neighbors are
                    # dropped.  Resident packs in the pre-step carry
                    # are the canonical state: fold them before the
                    # carry is invalidated by the regrown grid.
                    self.states = self._mat_fn(pre_states,
                                               self._nnps_carry) \
                        if self._nnps_carry is not None else pre_states
                    self._handle_overflow(diag)
                    new_states, diag, carry = self._step_fn(
                        self.states, self.t, self.dt,
                        self._nnps_carry)
                self.states = new_states
                self._nnps_carry = carry

            for callback in self.post_step_callbacks:
                callback(self)

            self.t += self.dt
            self.count += 1
            self._epsilon = EPSILON * self.tf * self.count
            self.dt = self._get_timestep()
            self._dump_output_if_needed()
            bar.update(self.t)

            if self.execute_commands is not None:
                if self.count % self.command_interval == 0:
                    self.execute_commands(self)

        self._exit_packed()
        bar.finish()
        # keep the host ParticleArrays current even when dumps are
        # disabled: users read app.particles after run()
        self._sync_to_host()
        self.dump_output()

    # -- overflow management -------------------------------------------
    @staticmethod
    def _check_overflow(diag):
        return (bool(diag['cell_overflow']) or
                bool(diag['extent_overflow']) or
                bool(diag.get('block_overflow', False)) or
                bool(diag.get('window_overflow', False)) or
                bool(diag.get('mirror_overflow', False)))

    def _calibrate_windows(self, grow_from_overflow=False):
        """Size the pallas union-window caps from the data (replaces
        the engine's loose 0.72*C geometric default; see
        ops/calibrate.py).  User-preset caps are left alone.  After a
        runtime ``window_overflow`` the re-measure is forced to make
        progress past the old cap so the redo loop terminates."""
        from pysph_tpu.config import get_config
        if os.environ.get('PYSPH_TPU_CALIBRATE', '1') == '0':
            return
        if not get_config().use_pallas:
            return
        spec = self.nnps
        if spec is None or not self.states:
            return
        if getattr(self, '_user_window_caps', None) is None:
            self._user_window_caps = set(spec.window_caps)
        try:
            og, wd, _ = jax.jit(spec.geometry)(self.states)
            og, wd = np.asarray(og), np.asarray(wd)
            from pysph_tpu.ops.calibrate import calibrate_window_caps
            levels = {}
            caps = calibrate_window_caps(
                self.acceleration_evals, self.states, spec, og, wd,
                levels_out=levels)
            spec.window_levels.update(levels)
        except Exception:
            logger.exception(
                'window calibration failed; keeping defaults')
            return
        if grow_from_overflow:
            # The overflow diag is a single bool (it doesn't say which
            # pair overflowed), but the re-measure does: a pair whose
            # measured need is close to (or past) its old cap is the
            # plausible overflower; only force growth there, so one
            # hot pair doesn't inflate VMEM windows and pair-physics
            # work for every phase.  The measurement runs on the
            # restored pre-step state, so if nothing measures tight,
            # fall back to growing all (guarantees redo-loop
            # progress).
            tight = [k for k, v in caps.items()
                     if k not in self._user_window_caps and
                     spec.window_caps.get(k) and
                     v >= spec.window_caps[k] - 128]
            grow_keys = set(tight) if tight else set(
                k for k in caps if k not in self._user_window_caps)
        for k, v in caps.items():
            if k in self._user_window_caps:
                continue
            old = spec.window_caps.get(k)
            if grow_from_overflow and old:
                if k in grow_keys:
                    v = max(v, old + 128)
                else:
                    v = old  # pair didn't overflow: keep its cap
            spec.window_caps[k] = v
        logger.info('window caps calibrated: %s', spec.window_caps)

    def _handle_overflow(self, diag):
        if bool(diag.get('mirror_overflow', False)):
            # mirror ghosts did not fit the capacity tail: pad the
            # flat device state (and redo from it)
            self._grow_state_capacity()
        window_ovf = bool(diag.get('window_overflow', False))
        calibrated = os.environ.get('PYSPH_TPU_CALIBRATE', '1') != '0'
        spec = self.nnps
        spec = spec.grow(cells=bool(diag['cell_overflow']),
                         extent=bool(diag['extent_overflow']),
                         blocks=bool(diag.get('block_overflow',
                                              False)),
                         windows=window_ovf and not calibrated)
        logger.info(
            'grid grown: dims=%s cell_capacity=%d (cell=%s extent=%s '
            'block=%s window=%s mirror=%s)',
            spec.dims, spec.cell_capacity,
            bool(diag['cell_overflow']), bool(diag['extent_overflow']),
            bool(diag.get('block_overflow', False)), window_ovf,
            bool(diag.get('mirror_overflow', False)))
        self.nnps = spec
        self.integrator.set_nnps(spec)
        if calibrated:
            # re-measure the window caps on the current states
            # instead of blindly doubling (also corrects the
            # occupancy-scaled caps after a cell-capacity grow)
            self._calibrate_windows(grow_from_overflow=window_ovf)
        # old binning has the wrong static sizes now
        self._nnps_carry = None
        self._make_jits()

    def _grow_state_capacity(self, factor=1.5):
        """Pad every array's flat device state along axis 0 (more
        room for mirror ghosts / added particles)."""
        import jax.numpy as jnp
        schemas = self.integrator.schemas
        new_states = {}
        for name, s in self.states.items():
            cap = s['x'].shape[0]
            new_cap = -(-int(cap * factor) // 128) * 128
            grow = new_cap - cap
            props = set(schemas[name].props)
            ns = {}
            for k, v in s.items():
                if k in props and hasattr(v, 'ndim') and \
                        v.ndim >= 1 and v.shape[0] == cap:
                    pad = [(0, grow)] + [(0, 0)] * (v.ndim - 1)
                    ns[k] = jnp.pad(v, pad)
                else:
                    ns[k] = v
            new_states[name] = ns
        logger.info('flat capacity grown x%.2f', factor)
        self.states = new_states

    # -- timestep helpers (reference solver.py:647-700) ----------------
    def _get_undamped_timestep(self):
        if self._prev_dt is not None:
            dt = self._prev_dt
            self._prev_dt = None
        else:
            dt = self.dt / self._damping_factor
        return dt

    def _compute_timestep(self):
        undamped = self._get_undamped_timestep()
        if self.adaptive_timestep:
            import jax.numpy as jnp
            if self._blob is not None:
                dt = float(self._packed['adapt'](
                    self._blob, jnp.asarray(undamped), self._cblob))
            else:
                dt = float(self._adapt_fn(
                    self.states, jnp.asarray(undamped),
                    self._nnps_carry))
            return dt
        return undamped

    def _damp_timestep(self, dt):
        n_damp = self.n_damp
        if self.count < n_damp and n_damp > 0:
            frac = (self.count + 1) / float(n_damp)
            self._damping_factor = 0.5 * (
                np.sin(np.pi * (-0.5 + frac)) + 1.0)
        else:
            self._damping_factor = 1.0
        return dt * self._damping_factor

    def _get_timestep(self):
        if abs(self.tf - self.t) < self._epsilon:
            return self.dt
        dt = self._compute_timestep()
        dt = self._damp_timestep(dt)
        if self.t + dt > self.tf:
            dt = self.tf - self.t
        return dt

    # ------------------------------------------------------------------
    # Output (reference solver.py:520-626)
    # ------------------------------------------------------------------
    def get_options(self, arg_parser):
        pass

    def setup_solver(self, options=None):
        pass

    def _get_solver_data(self):
        if self._prev_dt is not None:
            dt = self._prev_dt / self._damping_factor
        else:
            dt = self._get_undamped_timestep_peek()
        return {'dt': dt, 't': self.t, 'count': self.count}

    def _get_undamped_timestep_peek(self):
        return (self._prev_dt if self._prev_dt is not None
                else self.dt / self._damping_factor)

    def dump_output(self):
        if self.disable_output:
            return
        with self.profiler.timer('solve.output'):
            self._dump_output_impl()

    def _dump_output_impl(self):
        self._sync_to_host()
        mkdir(self.output_directory)
        fname = os.path.join(self.output_directory,
                             '%s_%05d' % (self.fname, self.count))
        dump_func(fname, self.particles, self._get_solver_data(),
                  detailed_output=self.detailed_output,
                  only_real=self.output_only_real,
                  compress=self.compress_output)

    def _maybe_respec(self):
        """Adaptive re-stratification at output cadence.

        The grid spec is sized from the INITIAL particle distribution,
        but adaptive-h schemes (ADKE, MAGMA2, GSPH) widen the h range
        over the run — sedov starts uniform and develops h-ratios > 4.
        When the current ratio crosses the stratification threshold
        (with hysteresis: enter at >= 4, leave below 2), or an
        existing split went degenerate, rebuild the spec from the
        current particles and re-jit — the same machinery as overflow
        growth.  (Reference analog: the stratified NNPS re-levels on
        every bin call, stratified_sfc_nnps.pyx:39.)"""
        import os as _os
        if _os.environ.get('PYSPH_TPU_RESPEC', '1') == '0':
            return
        spec = self.nnps
        if spec is None or self.integrator.parallel_manager is not None:
            return
        hmin, hmax = np.inf, 0.0
        for pa in self.particles:
            n = pa.get_number_of_particles()
            if n == 0:
                continue
            h = np.asarray(pa.h)[:n]
            pos = h[h > 0]
            if pos.size:
                hmin = min(hmin, float(pos.min()))
                hmax = max(hmax, float(pos.max()))
        if not np.isfinite(hmin) or hmax <= 0.0:
            return
        ratio = hmax / hmin
        if spec.stratified:
            degen = not (hmin * 1.2 <= spec.h_split <= hmax / 1.2)
            rebuild = ratio < 2.0 or degen
            want = ratio >= 2.0
        else:
            rebuild = want = ratio >= 4.0
        if not rebuild:
            return
        new = GridSpec.from_particles(
            self.particles, dim=spec.dim,
            radius_scale=spec.radius_scale, domain=spec.domain,
            cell_slack=spec.cell_slack,
            stratify='auto' if want else False)
        if new.stratified == spec.stratified and not spec.stratified:
            return      # from_particles declined (e.g. fine grid cap)
        logger.info('grid re-specced at t=%g: stratified=%s '
                    'h_split=%s ratio=%.2f', self.t, new.stratified,
                    new.h_split, ratio)
        self.nnps = new
        self.integrator.set_nnps(new)
        self._nnps_carry = None
        self._make_jits()
        # re-bin on the new spec and re-enter packed transport (same
        # sequence as the overflow-redo path)
        states, diag, carry = self._init_accel_fn(
            self.states, self.t, self.dt)
        if self._check_overflow(diag):
            self._handle_overflow(diag)
            states, diag, carry = self._init_accel_fn(
                self.states, self.t, self.dt)
        self.states = states
        self._nnps_carry = carry
        if self._packed_eligible():
            self._enter_packed(carry)

    def _dump_output_if_needed(self):
        if abs(self.t - self.tf) < self._epsilon:
            return
        dump = self.count % self.pfreq == 0
        if dump:
            self._sync_to_host()
            self._maybe_respec()
        output_at_times = self.output_at_times
        dt = self.dt
        if len(output_at_times) > 0:
            tdiff = output_at_times - self.t
            if np.any(np.abs(tdiff) < self._epsilon):
                dump = True
            too_big = (tdiff > 0.0) & (tdiff < dt)
            if np.any(too_big):
                indices = np.where(too_big)[0]
                index = indices[0]
                output_time = output_at_times[index]
                if (abs(output_time - self.t) < self._epsilon and
                        len(indices) > 1):
                    index = indices[1]
                    output_time = output_at_times[index]
                if abs(output_time - self.t) > self._epsilon:
                    self._prev_dt = dt
                    self.dt = float(output_time - self.t)
        if dump:
            self.dump_output()

    def load_output(self, count):
        """Load output of the given iteration (reference solver.py:575)."""
        fname = os.path.join(self.output_directory,
                             '%s_%s' % (self.fname, count))
        for ext in ('.hdf5', '.npz'):
            if os.path.isfile(fname + ext):
                data = load_func(fname + ext)
                break
        else:
            raise IOError('no output file %s' % fname)
        sd = data['solver_data']
        self.t = float(sd['t'])
        self.dt = float(sd['dt'])
        self.count = int(sd['count'])
        for pa in self.particles:
            if pa.name in data['arrays']:
                src = data['arrays'][pa.name]
                n = src.get_number_of_particles()
                cur = pa.get_number_of_particles()
                if n != cur:
                    if n > cur:
                        pa.extend(n - cur)
                    else:
                        pa.remove_particles(np.arange(n, cur))
                for prop, arr in src.properties.items():
                    if prop in pa.properties:
                        pa.properties[prop][:arr.size] = arr
                pa._update_num_real()
        self._sync_to_device()

    def reorder_particles(self):
        """Spatially order particles (the NNPS build already sorts
        candidates; explicit reorder improves gather locality)."""
        pass

    def get_particle_array(self, name):
        for pa in self.particles:
            if pa.name == name:
                return pa
        return None
