"""Vectorized acceleration evaluator.

Plays the role of the reference ``AccelerationEval`` + ``SPHCompiler`` +
generated code (/root/reference/pysph/sph/acceleration_eval.py:166,
sph_compiler.py:26, acceleration_eval_cython.mako:22-131) in one place:
it organizes Groups per destination array and *traces* the equations'
batched execution under jit, instead of generating Cython/OpenCL source.

Execution order per group and destination mirrors the reference mako
template: ``initialize`` (per particle) -> source-less ``loop`` (per
particle) -> per source: pair ``loop``/``loop_all`` over the neighbor
matrix -> ``post_loop`` -> ``reduce``.  Group features supported:
``real``, ``update_nnps``, ``condition`` (via ``lax.cond``), ``iterate``
with ``converged()`` (via ``lax.while_loop``), ``start_idx``/``stop_idx``,
``pre``/``post`` and nested sub-groups.
"""

from collections import OrderedDict
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pysph_tpu.base.particle_array import ParticleTAGS
from pysph_tpu.sph.equation import (
    ArrayView, Equation, Group, IndexSym, MultiStageEquations, PairDestView,
    PairSrcView, ReduceView, SymVec, _method_args,
    get_arrays_used_in_equation)


class ArraySchema(NamedTuple):
    """Static metadata for one particle array's device state."""
    name: str
    props: tuple
    strides: dict
    consts: tuple

    @classmethod
    def from_particle_array(cls, pa):
        return cls(name=pa.name, props=tuple(pa.properties.keys()),
                   strides={k: v for k, v in pa.stride.items() if v > 1},
                   consts=tuple(pa.constants.keys()))


def check_equation_array_properties(equation, schemas):
    """Raise if an equation requests properties that do not exist
    (mirrors reference acceleration_eval.py:32)."""
    d_props, s_props = get_arrays_used_in_equation(equation)
    dest = schemas[equation.dest]
    avail = set(dest.props) | set(dest.consts)
    missing = {p for p in d_props if p not in avail}
    if missing:
        raise RuntimeError(
            'ERROR: Destination %s missing properties %s required by %s' %
            (equation.dest, sorted(missing), equation.name))
    for src in (equation.sources or ()):
        savail = set(schemas[src].props) | set(schemas[src].consts)
        smissing = {p for p in s_props if p not in savail}
        if smissing:
            raise RuntimeError(
                'ERROR: Source %s missing properties %s required by %s' %
                (src, sorted(smissing), equation.name))


def _active_mask(store):
    cap = store['x'].shape[0]
    return jnp.arange(cap, dtype=jnp.int32) < store['n_act']


# ---------------------------------------------------------------------------
# Pair context: precomputed symbols over the neighbor matrix
# ---------------------------------------------------------------------------
class PairContext(object):
    """Lazily computes precomputed pair symbols (reference
    sph/equation.py:188-343) for one (dest, source, neighbor-list) triple.
    """

    SYMBOLS = ('HIJ', 'EPS', 'RHOIJ', 'RHOIJ1', 'XIJ', 'VIJ', 'R2IJ',
               'RIJ', 'WIJ', 'WI', 'WJ', 'DWIJ', 'DWI', 'DWJ', 'GHI',
               'GHJ', 'GHIJ', 'WDASHI', 'WDASHJ', 'WDASHIJ', 'WDP')

    def __init__(self, dest_store, src_store, dest_schema, src_schema,
                 nbrs, kernel, domain, write_mask):
        self.dest_store = dest_store
        self.src_store = src_store
        self.dest_schema = dest_schema
        self.src_schema = src_schema
        self.idx = nbrs.idx
        self.pair_mask = nbrs.mask
        self.kernel = kernel
        self.domain = domain
        self.write_mask = write_mask
        self._sym = {}
        self._gather_cache = {}
        self._dest_views = {}
        self._src_views = {}

    # basic accessors
    def dget(self, prop):
        return self.dest_store[prop][:, None]

    def sget(self, prop):
        ck = (prop, 0)
        if ck not in self._gather_cache:
            self._gather_cache[ck] = self.src_store[prop][self.idx]
        return self._gather_cache[ck]

    def dest_view(self, prop):
        if prop not in self._dest_views:
            self._dest_views[prop] = PairDestView(
                self.dest_store, prop,
                self.dest_schema.strides.get(prop, 1),
                self.pair_mask, self.write_mask)
        return self._dest_views[prop]

    def src_view(self, prop):
        if prop not in self._src_views:
            self._src_views[prop] = PairSrcView(
                self.src_store, prop,
                self.src_schema.strides.get(prop, 1),
                self.idx, self._gather_cache)
        return self._src_views[prop]

    # precomputed symbols
    def sym(self, name):
        if name not in self._sym:
            self._sym[name] = getattr(self, '_c_' + name.lower())()
        return self._sym[name]

    def _c_hij(self):
        return 0.5 * (self.dget('h') + self.sget('h'))

    def _c_eps(self):
        hij = self.sym('HIJ')
        return 0.01 * hij * hij

    def _c_rhoij(self):
        return 0.5 * (self.dget('rho') + self.sget('rho'))

    def _c_rhoij1(self):
        return 1.0 / self.sym('RHOIJ')

    def _c_xij(self):
        dx = self.dget('x') - self.sget('x')
        dy = self.dget('y') - self.sget('y')
        dz = self.dget('z') - self.sget('z')
        if self.domain is not None and self.domain.is_periodic:
            dx, dy, dz = self.domain.minimum_image(dx, dy, dz)
        return SymVec([dx, dy, dz])

    def _c_vij(self):
        return SymVec([self.dget('u') - self.sget('u'),
                       self.dget('v') - self.sget('v'),
                       self.dget('w') - self.sget('w')])

    def _c_r2ij(self):
        xij = self.sym('XIJ')
        return xij[0] ** 2 + xij[1] ** 2 + xij[2] ** 2

    def _c_rij(self):
        return jnp.sqrt(self.sym('R2IJ'))

    def _c_wij(self):
        return self.kernel.kernel(self.sym('XIJ'), self.sym('RIJ'),
                                  self.sym('HIJ'))

    def _c_wi(self):
        return self.kernel.kernel(self.sym('XIJ'), self.sym('RIJ'),
                                  self.dget('h'))

    def _c_wj(self):
        return self.kernel.kernel(self.sym('XIJ'), self.sym('RIJ'),
                                  self.sget('h'))

    def _c_dwij(self):
        g = self.kernel.gradient(self.sym('XIJ'), self.sym('RIJ'),
                                 self.sym('HIJ'))
        return SymVec([g[0], g[1], g[2]])

    def _c_dwi(self):
        g = self.kernel.gradient(self.sym('XIJ'), self.sym('RIJ'),
                                 self.dget('h'))
        return SymVec([g[0], g[1], g[2]])

    def _c_dwj(self):
        g = self.kernel.gradient(self.sym('XIJ'), self.sym('RIJ'),
                                 self.sget('h'))
        return SymVec([g[0], g[1], g[2]])

    def _c_ghi(self):
        return self.kernel.gradient_h(self.sym('XIJ'), self.sym('RIJ'),
                                      self.dget('h'))

    def _c_ghj(self):
        return self.kernel.gradient_h(self.sym('XIJ'), self.sym('RIJ'),
                                      self.sget('h'))

    def _c_ghij(self):
        return self.kernel.gradient_h(self.sym('XIJ'), self.sym('RIJ'),
                                      self.sym('HIJ'))

    def _c_wdashi(self):
        return self.kernel.dwdq(self.sym('RIJ'), self.dget('h'))

    def _c_wdashj(self):
        return self.kernel.dwdq(self.sym('RIJ'), self.sget('h'))

    def _c_wdashij(self):
        return self.kernel.dwdq(self.sym('RIJ'), self.sym('HIJ'))

    def _c_wdp(self):
        hij = self.sym('HIJ')
        return self.kernel.kernel(self.sym('XIJ'),
                                  self.kernel.get_deltap() * hij, hij)


# ---------------------------------------------------------------------------
# Method binding
# ---------------------------------------------------------------------------
def _bind_particle_phase(method, store, schema, write_mask, t, dt,
                         kernel, src_store=None, src_schema=None):
    """Run a per-particle method (initialize / source-less loop /
    post_loop / stepper stage) batched over all particles."""
    kwargs = {}
    views = {}
    for arg in _method_args(method):
        if arg == 'd_idx':
            kwargs[arg] = IndexSym('dest')
        elif arg == 's_idx':
            raise ValueError('s_idx is not available in a per-particle '
                             'method (%r)' % method)
        elif arg == 't':
            kwargs[arg] = t
        elif arg == 'dt':
            kwargs[arg] = dt
        elif arg == 'SPH_KERNEL':
            kwargs[arg] = kernel
        elif arg.startswith('d_'):
            prop = arg[2:]
            if prop not in views:
                is_const = prop in schema.consts
                views[prop] = ArrayView(
                    store, prop, stride=schema.strides.get(prop, 1),
                    write_mask=None if is_const else write_mask,
                    is_const=is_const)
            kwargs[arg] = views[prop]
        elif arg.startswith('s_') and src_store is not None:
            prop = arg[2:]
            kwargs[arg] = ArrayView(
                src_store, prop, stride=src_schema.strides.get(prop, 1),
                write_mask=None, is_const=prop in src_schema.consts)
        else:
            raise ValueError('cannot bind argument %r of %r' % (arg, method))
    method(**kwargs)


def _bind_pair_phase(method, ctx, t, dt):
    """Run a pair method (``loop`` / ``loop_all``) batched over the
    neighbor matrix."""
    kwargs = {}
    for arg in _method_args(method):
        if arg == 'd_idx':
            kwargs[arg] = IndexSym('dest')
        elif arg == 's_idx':
            kwargs[arg] = IndexSym('src')
        elif arg == 't':
            kwargs[arg] = t
        elif arg == 'dt':
            kwargs[arg] = dt
        elif arg == 'SPH_KERNEL':
            kwargs[arg] = ctx.kernel
        elif arg == 'NBRS':
            kwargs[arg] = jnp.where(ctx.pair_mask, ctx.idx, -1)
        elif arg == 'N_NBRS':
            kwargs[arg] = jnp.sum(ctx.pair_mask, axis=1).astype(jnp.int32)
        elif arg == 'PAIR_MASK':
            kwargs[arg] = ctx.pair_mask
        elif arg in PairContext.SYMBOLS:
            kwargs[arg] = ctx.sym(arg)
        elif arg.startswith('d_'):
            kwargs[arg] = ctx.dest_view(arg[2:])
        elif arg.startswith('s_'):
            kwargs[arg] = ctx.src_view(arg[2:])
        else:
            raise ValueError('cannot bind argument %r of %r' % (arg, method))
    method(**kwargs)


# ---------------------------------------------------------------------------
# AccelerationEval
# ---------------------------------------------------------------------------
class AccelerationEval(object):
    """Evaluates one list of Groups over the particle states.

    Parameters
    ----------
    particle_arrays : list of ParticleArray (used for schemas/validation)
    equations : list of Equation or Group
    kernel : SmoothingKernel
    """

    def __init__(self, particle_arrays, equations, kernel, mode='serial',
                 backend=None, domain=None):
        self.particle_arrays = particle_arrays
        self.kernel = kernel
        self.mode = mode
        self.domain = domain
        self.schemas = {pa.name: ArraySchema.from_particle_array(pa)
                        for pa in particle_arrays}
        self.groups = self._make_groups(equations)
        self._validate()
        self.nnps_pairs = self._collect_pairs(self.groups)
        self.finder = None

    # -- setup ---------------------------------------------------------
    @staticmethod
    def _make_groups(equations):
        if isinstance(equations, Group):
            return [equations]
        groups = []
        pending = []
        for item in equations:
            if isinstance(item, Group):
                if pending:
                    groups.append(Group(pending))
                    pending = []
                groups.append(item)
            else:
                pending.append(item)
        if pending:
            groups.append(Group(pending))
        return groups

    def _iter_equations(self, groups=None):
        for g in (self.groups if groups is None else groups):
            for item in g.equations:
                if isinstance(item, Group):
                    for e in self._iter_equations([item]):
                        yield e
                else:
                    yield item

    def _validate(self):
        for eq in self._iter_equations():
            if eq.dest not in self.schemas:
                raise RuntimeError('Unknown destination array %r in %r' %
                                   (eq.dest, eq))
            for src in (eq.sources or ()):
                if src not in self.schemas:
                    raise RuntimeError('Unknown source array %r in %r' %
                                       (src, eq))
            check_equation_array_properties(eq, self.schemas)

    def _collect_pairs(self, groups):
        pairs = []
        for eq in self._iter_equations(groups):
            for src in (eq.sources or ()):
                if (eq.dest, src) not in pairs:
                    pairs.append((eq.dest, src))
        return pairs

    def set_nnps(self, finder):
        self.finder = finder

    def set_domain(self, domain):
        self.domain = domain

    # -- execution -----------------------------------------------------
    def update_and_compute(self, t, dt, states):
        """Rebuild neighbor lists then evaluate all groups.

        Returns (new_states, diag)."""
        lists, diag = self.finder.update(states, self.nnps_pairs)
        states = self.compute(t, dt, states, lists)
        return states, diag

    def compute(self, t, dt, states, lists):
        states = dict(states)
        for group in self.groups:
            states = self._run_group(group, t, dt, states, lists)
        return states

    # -- group machinery ----------------------------------------------
    def _run_group(self, group, t, dt, states, lists):
        if group.condition is not None:
            cond = group.condition(t, dt)
            return jax.lax.cond(
                cond,
                lambda s: self._run_group_body(group, t, dt, s, lists),
                lambda s: s,
                states)
        return self._run_group_body(group, t, dt, states, lists)

    def _run_group_body(self, group, t, dt, states, lists):
        if not group.iterate:
            return self._run_group_once(group, t, dt, states, lists)
        max_it = int(group.max_iterations)
        min_it = int(group.min_iterations)

        def body(carry):
            s, it, _ = carry
            s = self._run_group_once(group, t, dt, s, lists)
            conv = self._group_converged(group, s)
            return (s, it + 1, conv)

        def cond(carry):
            _, it, conv = carry
            return (it < max_it) & ~(conv & (it >= min_it))

        init = (states, jnp.asarray(0, jnp.int32),
                jnp.asarray(False))
        states, _, _ = jax.lax.while_loop(cond, body, init)
        return states

    def _group_converged(self, group, states):
        conv = jnp.asarray(True)
        for eq in self._iter_equations([group]):
            fn = getattr(eq, 'converged', None)
            if fn is None:
                continue
            args = _method_args(fn)
            if 'dst' in args:
                store = dict(states[eq.dest])
                view = ReduceView(store, self.schemas[eq.dest], None,
                                  _active_mask(store))
                val = fn(dst=view)
            else:
                val = fn()
            conv = conv & (jnp.asarray(val) > 0)
        return conv

    def _dest_order(self, group):
        dests = OrderedDict()
        for item in group.equations:
            if isinstance(item, Group):
                continue
            dests.setdefault(item.dest, []).append(item)
        return dests

    def _write_mask(self, group, store):
        mask = _active_mask(store)
        if group.real:
            mask = mask & (store['tag'] == ParticleTAGS.Local)
        start = group.start_idx
        stop = group.stop_idx
        if (start not in (0, None)) or stop is not None:
            cap = store['x'].shape[0]
            ar = jnp.arange(cap, dtype=jnp.int32)
            if isinstance(start, str):
                start = store[start][0].astype(jnp.int32)
            if start not in (0, None):
                mask = mask & (ar >= start)
            if stop is not None:
                if isinstance(stop, str):
                    stop = store[stop][0].astype(jnp.int32)
                mask = mask & (ar < stop)
        return mask

    def _run_group_once(self, group, t, dt, states, lists):
        if group.has_subgroups:
            for sub in group.equations:
                states = self._run_group(sub, t, dt, states, lists)
            return states
        if group.pre is not None:
            group.pre()
        states = dict(states)
        kernel = self.kernel
        for dest, eqs in self._dest_order(group).items():
            schema = self.schemas[dest]
            store = dict(states[dest])
            states[dest] = store  # views mutate `store` in place
            write_mask = self._write_mask(group, store)

            for eq in eqs:
                if hasattr(eq, 'py_initialize'):
                    raise NotImplementedError(
                        'py_initialize (host code) is not supported inside '
                        'the jitted evaluation; restructure %r' % eq)

            # initialize
            for eq in eqs:
                fn = getattr(eq, 'initialize', None)
                if fn is not None:
                    _bind_particle_phase(fn, store, schema, write_mask,
                                         t, dt, kernel)
            # source-less equations: `loop` is a per-particle op
            for eq in eqs:
                if eq.no_source:
                    fn = getattr(eq, 'loop', None)
                    if fn is not None:
                        _bind_particle_phase(fn, store, schema, write_mask,
                                             t, dt, kernel)
            # per-source pair loops
            sources = OrderedDict()
            for eq in eqs:
                for src in (eq.sources or ()):
                    sources.setdefault(src, []).append(eq)
            for src, src_eqs in sources.items():
                src_store = store if src == dest else states[src]
                nl = lists[(dest, src)]
                ctx = PairContext(store, src_store, schema,
                                  self.schemas[src], nl, kernel,
                                  self.domain, write_mask)
                for eq in src_eqs:
                    fn = getattr(eq, 'initialize_pair', None)
                    if fn is not None:
                        _bind_particle_phase(
                            fn, store, schema, write_mask, t, dt, kernel,
                            src_store=src_store,
                            src_schema=self.schemas[src])
                    fn = getattr(eq, 'loop', None)
                    if fn is not None:
                        _bind_pair_phase(fn, ctx, t, dt)
                    fn = getattr(eq, 'loop_all', None)
                    if fn is not None:
                        _bind_pair_phase(fn, ctx, t, dt)
            # post_loop
            for eq in eqs:
                fn = getattr(eq, 'post_loop', None)
                if fn is not None:
                    _bind_particle_phase(fn, store, schema, write_mask,
                                         t, dt, kernel)
            # reduce
            for eq in eqs:
                fn = getattr(eq, 'reduce', None)
                if fn is not None:
                    view = ReduceView(store, schema, write_mask,
                                      _active_mask(store))
                    fn(dst=view, t=t, dt=dt)
        if group.post is not None:
            group.post()
        return states


def make_acceleration_evals(particle_arrays, equations, kernel,
                            mode='serial', backend=None, domain=None):
    """One AccelerationEval per stage (reference acceleration_eval.py:76)."""
    if isinstance(equations, MultiStageEquations):
        return [AccelerationEval(particle_arrays, eqs, kernel, mode,
                                 backend, domain)
                for eqs in equations.groups]
    return [AccelerationEval(particle_arrays, equations, kernel, mode,
                             backend, domain)]
