"""Time integrators.

Mirrors /root/reference/pysph/sph/integrator.py: an ``Integrator`` is built
from per-array ``IntegratorStep`` objects (``Integrator(fluid=WCSPHStep())``)
and a ``one_timestep(t, dt)`` recipe composed of ``initialize()``,
``stage1()``.., ``compute_accelerations()``, ``update_domain()`` and
``do_post_stage()``.

TPU-native execution: ``one_timestep`` is *traced* — ``step(states, t, dt)``
is a pure function (state pytree in, state pytree out) that the Solver jits
once; there is no generated Cython.  Stepper stage methods are per-particle
DSL methods executed batched by the same engine as equation ``initialize``.

Adaptive timestepping reproduces reference integrator.py:161-200:
``dt_cfl``/``dt_force``/``dt_visc`` property maxima give
``hmin/cfl_f``, ``sqrt(hmin/sqrt(force_f))``, ``hmin/visc_f``; an explicit
``dt_adapt`` property overrides everything.  All reductions stay on device
(traced), so adaptive dt never forces a host sync inside a scan.
"""

import jax.numpy as jnp

from pysph_tpu.sph.acceleration_eval import (
    _active_mask, _bind_particle_phase)

# Resident packs ride the nnps carry under a negative int key (jax
# pytree dicts sort their keys, so the key type must match the int
# handle keys; eval index i -> PACKS_KEY - i).
PACKS_KEY = -1


class _PackActiveState(object):
    """State-dict shim over a resident PackStore for the adaptive-dt
    reductions: pack planes where present, flat leftovers otherwise,
    and an ``active_mask`` honored by ``_active_mask``."""

    def __init__(self, store, flat):
        self._store = store
        self._flat = flat

    def __getitem__(self, key):
        if key in self._store.ap.planes:
            return self._store[key]
        return self._flat[key]

    def __contains__(self, key):
        return key in self._store.ap.planes or key in self._flat

    @property
    def active_mask(self):
        return self._store.active_mask()


class Integrator(object):
    def __init__(self, **steppers):
        self.steppers = steppers
        self.acceleration_evals = None
        self.finder = None
        self.domain = None
        self.parallel_manager = None
        self.post_stage_callback = None
        self.fixed_h = False
        # Bin particles once per step and reuse the layout for every
        # evaluation within the step (the GridSpec's cell_slack makes
        # this safe under CFL-limited motion).  Set True to rebuild per
        # evaluation like the reference.
        self.bin_every_eval = False
        self._states = None
        self._lists = {}
        self._diag = None
        # resident-pack mode (ops/resident.py): False = known
        # ineligible, None = not probed yet
        self._res_runner = None
        self._res_stores = None

    # ------------------------------------------------------------------
    # Wiring (called by SPHCompiler / Solver)
    # ------------------------------------------------------------------
    def set_acceleration_evals(self, a_evals):
        if not isinstance(a_evals, (list, tuple)):
            a_evals = [a_evals]
        self.acceleration_evals = list(a_evals)

    def set_nnps(self, grid_spec):
        self.finder = grid_spec
        self._res_runner = None       # static sizes changed: re-probe
        for a_eval in self.acceleration_evals or ():
            a_eval.set_nnps(grid_spec)

    def set_domain(self, domain):
        self.domain = domain
        for a_eval in self.acceleration_evals or ():
            a_eval.set_domain(domain)

    def set_post_stage_callback(self, callback):
        """callback(cur_time, dt, stage) — must be traceable (pure jnp)."""
        self.post_stage_callback = callback

    def set_fixed_h(self, fixed_h):
        self.fixed_h = fixed_h

    @property
    def schemas(self):
        return self.acceleration_evals[0].schemas

    # ------------------------------------------------------------------
    # Pure-functional entry points
    # ------------------------------------------------------------------
    def _fresh_diag(self):
        from pysph_tpu.sph.acceleration_eval import empty_diag
        return empty_diag()

    def step(self, states, t, dt, nnps_carry=None):
        """Advance one timestep.

        Returns (new_states, diag, nnps_carry): thread ``nnps_carry``
        through successive steps to reuse the particle binning
        Verlet-list style (rebinned automatically once any particle has
        moved beyond the slack margin).  Pass None to force a rebuild.
        """
        self._states = dict(states)
        self._t = t
        self._dt = dt
        self._lists = {}
        # Distributed runs reuse binning across steps too: the
        # exchange's full update is a row-layout fixed point in steady
        # state (same membership -> same slots), and any reshuffle is
        # caught by prepare_reuse's displacement + ref_n staleness
        # checks, which rebuild under lax.cond.
        self._carry_in = nnps_carry
        self._carry_out = dict(self._carry_in or {})
        self._pm_cache = None
        self._diag = self._fresh_diag()
        self._enter_resident()
        self.one_timestep(t, dt)
        self._exit_resident()
        states, diag = self._states, self._diag
        carry = self._carry_out
        self._states = None
        self._lists = {}
        return states, diag, carry

    def initial_acceleration(self, states, t, dt):
        """Initial force evaluation (reference integrator.py:289).

        Returns (states, diag, nnps_carry)."""
        self._states = dict(states)
        self._t = t
        self._dt = dt
        self._lists = {}
        self._carry_in = None
        self._carry_out = {}
        self._pm_cache = None
        self._diag = self._fresh_diag()
        self._res_stores = None
        self._res_checked = False
        self._refresh_mirror_ghosts()
        self.compute_accelerations(0, update_nnps=True)
        self._exit_resident()
        states, diag = self._states, self._diag
        carry = self._carry_out
        self._states = None
        return states, diag, carry

    # ------------------------------------------------------------------
    # one_timestep building blocks
    # ------------------------------------------------------------------
    def _merge_diag(self, diag):
        for k, v in diag.items():
            if k in self._diag:
                old = self._diag[k]
                self._diag[k] = (old | v) if v.dtype == jnp.bool_ else \
                    jnp.maximum(old, v)
            else:
                self._diag[k] = v

    def set_parallel_manager(self, pm):
        """A BlockExchange (or compatible) whose ``update(states)``
        refreshes halos; called before each acceleration evaluation,
        mirroring reference sph/integrator.py:274-281."""
        self.parallel_manager = pm

    # ------------------------------------------------------------------
    # Resident-pack mode (ops/resident.py)
    # ------------------------------------------------------------------
    def _resident_runner(self):
        """The ResidentRunner for single-eval setups (built lazily;
        False caches ineligibility)."""
        if self._res_runner is not None:
            return self._res_runner or None
        if (self.parallel_manager is not None or
                len(self.acceleration_evals or ()) != 1 or
                self._states is None):
            return None
        from pysph_tpu.ops.resident import make_runner
        self._res_runner = make_runner(
            self.acceleration_evals[0], self.steppers,
            self._states) or False
        return self._res_runner or None

    def _enter_resident(self):
        """Adopt resident packs from the carry (if present)."""
        self._res_stores = None
        self._res_checked = False
        runner = self._resident_runner()
        ci = self._carry_in or {}
        if runner is None or PACKS_KEY not in ci or 0 not in ci:
            return
        from pysph_tpu.ops.resident import PackStore
        packs = ci[PACKS_KEY]
        self._lists[0] = ci[0]
        self._carry_out[0] = ci[0]
        self._res_stores = {
            name: PackStore(runner.plan, name, ps,
                            dict(self._states[name]))
            for name, ps in packs.items()}

    def _exit_resident(self):
        """Fold PackStore state back into the carry."""
        if self._res_stores is None:
            return
        self._carry_out[PACKS_KEY] = {
            name: store.finalize_pack()
            for name, store in self._res_stores.items()}
        for name, store in self._res_stores.items():
            # non-plane props (consts, flat-only) stay canonical flat
            self._states[name] = store.flat
        self._res_stores = None

    def materialize_states(self, states, carry):
        """Fold any resident packs in ``carry`` into flat states
        (pure; call at host sync points — flat states are stale for
        pack props between them)."""
        runner = self._res_runner
        if (not runner or carry is None or
                PACKS_KEY not in carry):
            return states
        from pysph_tpu.ops.resident import materialize
        out = dict(states)
        packs = carry[PACKS_KEY]
        sub = materialize(runner.plan,
                          {n: states[n] for n in packs}, packs)
        out.update(sub)
        return out

    def _compute_accel_resident(self, runner, update_nnps):
        from pysph_tpu.ops.resident import PackStore, build_packs
        a_eval = self.acceleration_evals[0]
        a_eval.engine_choices['__mode__'] = 'resident'
        if self._res_stores is None:
            # no packs yet: bin + pack from the (canonical) flat state
            handle, packs, diag = runner.prepare(self._states)
            self._merge_diag(diag)
            self._lists[0] = handle
            self._carry_out[0] = handle
            self._res_stores = {
                name: PackStore(runner.plan, name, ps,
                                dict(self._states[name]))
                for name, ps in packs.items()}
        elif update_nnps and 0 in self._lists:
            # Verlet reuse check on pack positions (first eval of the
            # step only; later evals share the fresh binning)
            if not getattr(self, '_res_checked', False):
                packs = {name: store.finalize_pack()
                         for name, store in self._res_stores.items()}
                flats = {name: store.flat
                         for name, store in self._res_stores.items()}
                states = dict(self._states)
                states.update(flats)
                states, handle, packs, diag = runner.ensure_fresh(
                    states, self._lists[0], packs)
                self._merge_diag(diag)
                self._states.update(
                    {n: states[n] for n in packs})
                self._lists[0] = handle
                self._carry_out[0] = handle
                self._res_stores = {
                    name: PackStore(runner.plan, name, ps,
                                    dict(states[name]))
                    for name, ps in packs.items()}
        self._res_checked = True
        diag = runner.compute(self._t, self._dt, self._res_stores,
                              self._lists[0])
        self._merge_diag(diag)

    def compute_accelerations(self, index=0, update_nnps=True):
        a_eval = self.acceleration_evals[index]
        if update_nnps and self.parallel_manager is not None:
            pm = self.parallel_manager
            if self._pm_cache is not None and \
                    hasattr(pm, 'refresh'):
                # later evals of this step: membership is fresh from
                # the step-opening full update; only halo VALUES are
                # stale (owners advanced them a stage) -> replay
                self._states = pm.refresh(self._states, self._pm_cache)
            elif hasattr(pm, 'update_cached'):
                self._states, self._pm_cache = \
                    pm.update_cached(self._states)
            else:
                self._states = pm.update(self._states)
        if index == 0 and (self._res_stores is not None or
                           (index not in self._lists and
                            self._resident_runner() is not None)):
            self._compute_accel_resident(self._resident_runner(),
                                         update_nnps)
            return
        if (update_nnps and self.bin_every_eval) or \
                index not in self._lists:
            if self._carry_in is not None and index in self._carry_in:
                handle, diag = a_eval.prepare_reuse(
                    self._states, self._carry_in[index])
            else:
                handle, diag = a_eval.prepare(self._states)
            self._lists[index] = handle
            self._carry_out[index] = handle
            self._merge_diag(diag)
        self._states = a_eval.compute(self._t, self._dt, self._states,
                                      self._lists[index])
        loop_diag = a_eval.consume_loop_diag()
        if loop_diag is not None:
            self._merge_diag(loop_diag)

    def update_domain(self):
        if self.domain is None:
            return
        if self.domain.is_periodic:
            for name in list(self._states):
                if self._res_stores is not None and \
                        name in self._res_stores:
                    store = self._res_stores[name]
                    x, y, z = self.domain.wrap_positions(
                        store['x'], store['y'], store['z'])
                    store['x'], store['y'], store['z'] = x, y, z
                else:
                    self._states[name] = self.domain.wrap_state(
                        self._states[name])
        self._refresh_mirror_ghosts()

    def _refresh_mirror_ghosts(self):
        """Strip + re-create mirror-image ghosts (reference
        nnps_base.pyx:465-482 update: remove ghosts, recreate)."""
        dom = self.domain
        if dom is None or not dom.is_mirror:
            return
        if self.parallel_manager is not None:
            raise NotImplementedError(
                'mirror boundaries are not supported on the '
                'distributed path yet')
        spec = self.finder
        fdt = next(iter(self._states.values()))['x'].dtype
        hmax = jnp.zeros((), dtype=fdt)
        for s in self._states.values():
            cap = s['x'].shape[0]
            act = jnp.arange(cap, dtype=jnp.int32) < s['n_act']
            hmax = jnp.maximum(hmax, jnp.max(
                jnp.where(act, s['h'], 0.0)))
        band = (dom.n_layers * spec.cell_slack * spec.radius_scale *
                hmax)
        for name in list(self._states):
            s = dom.strip_mirror_ghosts(self._states[name])
            s, ovf = dom.add_mirror_ghosts(
                s, band, self.schemas[name].props)
            self._states[name] = s
            self._merge_diag({'mirror_overflow': ovf})

    def do_post_stage(self, stage_dt, stage):
        if self.post_stage_callback is not None:
            self.post_stage_callback(self._t + stage_dt, self._dt, stage)

    def _run_stage(self, stage_name):
        kernel = self.acceleration_evals[0].kernel
        for arr_name, stepper in self.steppers.items():
            fn = getattr(stepper, stage_name, None)
            if fn is None:
                continue
            schema = self.schemas[arr_name]
            if self._res_stores is not None and \
                    arr_name in self._res_stores:
                store = self._res_stores[arr_name]
                mask = store.active_mask() & (store['tag'] == 0)
            else:
                store = dict(self._states[arr_name])
                self._states[arr_name] = store
                mask = _active_mask(store) & (store['tag'] == 0)
            _bind_particle_phase(fn, store, schema, mask, self._t,
                                 self._dt, kernel)

    def initialize(self):
        self._run_stage('initialize')

    def stage1(self):
        self._run_stage('stage1')

    def stage2(self):
        self._run_stage('stage2')

    def stage3(self):
        self._run_stage('stage3')

    def stage4(self):
        self._run_stage('stage4')

    def stage5(self):
        self._run_stage('stage5')

    def one_timestep(self, t, dt):
        """Default: PEC (reference integrator.py:202-242)."""
        self.initialize()
        self.stage1()
        self.update_domain()
        self.do_post_stage(0.5 * dt, 1)
        self.compute_accelerations()
        self.stage2()
        self.update_domain()
        self.do_post_stage(dt, 2)

    # ------------------------------------------------------------------
    # Adaptive timestep (traced; reference integrator.py:62-200)
    # ------------------------------------------------------------------
    def compute_time_step(self, states, dt_current, cfl, carry=None):
        """Return the adaptive dt (traced scalar).

        Falls back to ``dt_current`` if no adaptive constraints exist.
        When ``carry`` holds resident packs the dt-controlling props
        are read from the packs (the flat states are stale for pack
        props between sync points)."""
        runner = self._res_runner
        if runner and carry and PACKS_KEY in carry:
            from pysph_tpu.ops.resident import PackStore
            states = dict(states)
            for name, ps in carry[PACKS_KEY].items():
                store = PackStore(runner.plan, name, ps,
                                  dict(states[name]))
                states[name] = _PackActiveState(store,
                                                states[name])
        fdt = dt_current.dtype if hasattr(dt_current, 'dtype') else \
            next(iter(states.values()))['x'].dtype
        inf = jnp.asarray(jnp.inf, dtype=fdt)

        # explicit per-particle dt_adapt overrides everything
        has_dt_adapt = any('dt_adapt' in self.schemas[n].props
                           for n in states)
        if has_dt_adapt:
            dt_min = inf
            for name, s in states.items():
                if 'dt_adapt' in self.schemas[name].props:
                    act = _active_mask(s)
                    dt_min = jnp.minimum(dt_min, jnp.min(
                        jnp.where(act, s['dt_adapt'], inf)))
            return jnp.where((dt_min > 0) & jnp.isfinite(dt_min),
                             dt_min, dt_current)

    # factors: max over arrays of max over particles
        factors = {}
        for prop in ('dt_cfl', 'dt_force', 'dt_visc'):
            fac = jnp.asarray(-1.0, dtype=fdt)
            present = False
            for name, s in states.items():
                if prop in self.schemas[name].props:
                    present = True
                    act = _active_mask(s)
                    fac = jnp.maximum(fac, jnp.max(
                        jnp.where(act, s[prop], -inf)))
            factors[prop] = fac if present else None
        if all(v is None for v in factors.values()):
            return dt_current

        hmin = inf
        for name, s in states.items():
            act = _active_mask(s)
            hmin = jnp.minimum(hmin, jnp.min(
                jnp.where(act, s['h'], inf)))

        dt_min = inf
        if factors['dt_cfl'] is not None:
            f = factors['dt_cfl']
            dt_min = jnp.minimum(dt_min,
                                 jnp.where(f > 0, hmin / f, inf))
        if factors['dt_force'] is not None:
            f = factors['dt_force']
            dt_min = jnp.minimum(
                dt_min, jnp.where(f > 0, jnp.sqrt(hmin / jnp.sqrt(f)),
                                  inf))
        if factors['dt_visc'] is not None:
            f = factors['dt_visc']
            dt_min = jnp.minimum(dt_min,
                                 jnp.where(f > 0, hmin / f, inf))
        ok = (dt_min > 0) & jnp.isfinite(dt_min)
        return jnp.where(ok, cfl * dt_min, dt_current)


class EulerIntegrator(Integrator):
    """1-stage Euler (reference integrator.py:319)."""

    def one_timestep(self, t, dt):
        self.compute_accelerations()
        self.stage1()
        self.update_domain()
        self.do_post_stage(dt, 1)


class PECIntegrator(Integrator):
    """Predict-Evaluate-Correct (reference integrator.py:330)."""

    def one_timestep(self, t, dt):
        self.initialize()
        self.stage1()
        self.update_domain()
        self.do_post_stage(0.5 * dt, 1)
        self.compute_accelerations()
        self.stage2()
        self.update_domain()
        self.do_post_stage(dt, 2)


class EPECIntegrator(Integrator):
    """Evaluate-Predict-Evaluate-Correct (reference integrator.py:367)."""

    def one_timestep(self, t, dt):
        self.initialize()
        self.compute_accelerations()
        self.stage1()
        self.update_domain()
        self.do_post_stage(0.5 * dt, 1)
        self.compute_accelerations()
        self.stage2()
        self.update_domain()
        self.do_post_stage(dt, 2)


class TVDRK3Integrator(Integrator):
    """3-stage SSP RK3 (reference integrator.py:426)."""

    def one_timestep(self, t, dt):
        self.initialize()
        self.compute_accelerations()
        self.stage1()
        self.update_domain()
        self.do_post_stage(1. / 3 * dt, 1)
        self.compute_accelerations()
        self.stage2()
        self.update_domain()
        self.do_post_stage(2. / 3 * dt, 2)
        self.compute_accelerations()
        self.stage3()
        self.update_domain()
        self.do_post_stage(dt, 3)


class LeapFrogIntegrator(PECIntegrator):
    """Kick-drift-kick leap-frog (reference integrator.py:464)."""

    def one_timestep(self, t, dt):
        self.stage1()
        self.update_domain()
        self.do_post_stage(0.5 * dt, 1)
        self.compute_accelerations()
        self.stage2()
        self.update_domain()
        self.do_post_stage(dt, 2)


class PEFRLIntegrator(Integrator):
    """Position-Extended Forest-Ruth-Like 4th order symplectic integrator
    (reference integrator.py:481)."""

    def one_timestep(self, t, dt):
        self.stage1()
        self.update_domain()
        self.do_post_stage(0.1786178958448091 * dt, 1)
        self.compute_accelerations()
        self.stage2()
        self.update_domain()
        self.do_post_stage(0.1123533131749906 * dt, 2)
        self.compute_accelerations()
        self.stage3()
        self.update_domain()
        self.do_post_stage(0.8876466868250094 * dt, 3)
        self.compute_accelerations()
        self.stage4()
        self.update_domain()
        self.do_post_stage(0.8213821041551909 * dt, 4)
        self.compute_accelerations()
        self.stage5()
        self.update_domain()
        self.do_post_stage(dt, 5)
