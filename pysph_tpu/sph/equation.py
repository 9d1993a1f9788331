"""The pairwise equation DSL.

Keeps the reference contract (/root/reference/pysph/sph/equation.py:392-443):
an ``Equation(dest, sources)`` may define

- ``initialize(d_idx, d_*...)``        -- per dest particle
- ``loop(d_idx, s_idx, d_*, s_*, precomputed...)`` -- per neighbor pair
- ``post_loop(d_idx, d_*...)``         -- per dest particle
- ``reduce(dst, t, dt)``               -- whole-array reductions
- ``converged()``                      -- scalar convergence flag

with array arguments requested *by name* (``d_``/``s_`` prefixes bound to
particle properties/constants), precomputed pair symbols (HIJ, XIJ, VIJ,
R2IJ, RIJ, WIJ, DWIJ, ...), and scalars ``t``/``dt``.

TPU-native execution model (this is the core difference from the
reference's string codegen): equation methods run **once, batched** under
jit tracing.

- In per-particle phases, ``d_prop[d_idx]`` is the whole ``(N,)`` column
  and assignment writes back masked by the phase's write mask.
- In the pair phase, ``d_prop[d_idx]`` reads broadcast ``(N, 1)``,
  ``s_prop[s_idx]`` gathers ``(N, K)`` over the fixed-width neighbor list,
  vector symbols like ``DWIJ`` are ``(3, N, K)`` so ``DWIJ[0]`` is the x
  component of every pair, and ``d_acc[d_idx] += expr`` becomes a masked
  sum over the neighbor axis -- the same "write only d_*[d_idx]"
  race-freedom discipline, now by construction.
- ``if cond: ...`` on pair values becomes ``jnp.where``; use the provided
  ``MAX``/``MIN`` for max/min-accumulation (e.g. the CFL estimate in the
  reference wc/basic.py:229).

No transpiler, no compile cache: XLA's jit is the compiler.
"""

import inspect
from functools import lru_cache

import jax.numpy as jnp


class IndexSym(object):
    """The ``d_idx``/``s_idx`` sentinel with affine arithmetic so strided
    accesses like ``d_v[3*d_idx + j]`` resolve to (column j of stride 3)."""

    __slots__ = ('role', 'mul', 'off')

    def __init__(self, role, mul=1, off=0):
        self.role = role
        self.mul = mul
        self.off = off

    def __mul__(self, k):
        return IndexSym(self.role, self.mul * int(k), self.off * int(k))

    __rmul__ = __mul__

    def __add__(self, j):
        if isinstance(j, IndexSym):
            raise TypeError('cannot add two index symbols')
        return IndexSym(self.role, self.mul, self.off + int(j))

    __radd__ = __add__

    def __repr__(self):
        return 'IndexSym(%s, mul=%d, off=%d)' % (self.role, self.mul,
                                                 self.off)


class SymVec(object):
    """A mutable 3-component pair symbol (XIJ, VIJ, DWIJ, ...).

    Components are ``(N, K)`` arrays.  Mutability matters: the reference DSL
    lets an equation overwrite e.g. ``DWIJ`` so *later equations in the same
    group* see the corrected gradient (see GradientCorrection, reference
    wc/kernel_correction.py:124); components written here are visible to
    subsequently executed equations because the PairContext caches this
    object."""

    __slots__ = ('comps',)

    def __init__(self, comps):
        self.comps = list(comps)

    def __getitem__(self, i):
        return self.comps[i]

    def __setitem__(self, i, value):
        import jax.numpy as jnp
        self.comps[i] = jnp.asarray(value)

    def __len__(self):
        return len(self.comps)

    def __iter__(self):
        return iter(self.comps)

    def stack(self):
        import jax.numpy as jnp
        return jnp.stack(self.comps)


class _AccumMax(object):
    __slots__ = ('value',)

    def __init__(self, value):
        self.value = value


class _AccumMin(object):
    __slots__ = ('value',)

    def __init__(self, value):
        self.value = value


def MAX(a, b):
    """DSL max: in a pair ``loop``, ``d_x[d_idx] = MAX(expr, d_x[d_idx])``
    accumulates the maximum over neighbors (cf. reference wc/basic.py:229
    ``d_dt_cfl[d_idx] = max(_dt_cfl, d_dt_cfl[d_idx])``)."""
    return _AccumMax(jnp.maximum(jnp.asarray(a), jnp.asarray(b)))


def MIN(a, b):
    return _AccumMin(jnp.minimum(jnp.asarray(a), jnp.asarray(b)))


def declare(type_str, num=1):  # pragma: no cover - compatibility shim
    raise NotImplementedError(
        "declare() is a scalar-DSL construct; in pysph_tpu write equations "
        "against jnp arrays (e.g. use jnp.zeros or plain Python lists of "
        "pair arrays for small matrices).")


class ArrayView(object):
    """Per-particle view over one property/constant of a dest array.

    ``arr`` lives in the shared mutable ``store`` dict so sequential
    equations observe each other's writes.
    """

    __slots__ = ('store', 'name', 'stride', 'write_mask', 'is_const')

    def __init__(self, store, name, stride=1, write_mask=None,
                 is_const=False):
        self.store = store
        self.name = name
        self.stride = stride
        self.write_mask = write_mask
        self.is_const = is_const

    @property
    def arr(self):
        return self.store[self.name]

    def _column(self, key):
        if key.mul != self.stride:
            raise IndexError(
                'property %r has stride %d but was indexed with stride %d'
                % (self.name, self.stride, key.mul))
        if self.stride == 1:
            if key.off != 0:
                raise IndexError('offset %d on unstrided %r'
                                 % (key.off, self.name))
            return self.arr
        return self.arr[:, key.off]

    def _to_slot(self, key):
        """Translate particle-space indices to this store's layout.

        Cross-particle gathers in equations (``d_u[d_parent_idx[d_idx]]``,
        merge partners, rigid-body roots) are written in the flat
        particle index space; when the backing store is slot-ordered the
        index must go through ``particle_to_slot``."""
        layout = getattr(self.store, 'layout', None)
        if layout is None or self.is_const or not hasattr(key, 'dtype'):
            # reference props used as indices (parent_idx,
            # closest_idx) are double arrays; coerce like the
            # generated Cython's implicit cast
            if hasattr(key, 'dtype') and not (
                    jnp.issubdtype(key.dtype, jnp.integer) or
                    key.dtype == jnp.bool_):
                return jnp.asarray(key).astype(jnp.int32)
            return key
        p2s = layout.particle_to_slot
        idx = jnp.clip(jnp.asarray(key).astype(jnp.int32), 0,
                       p2s.shape[0] - 1)
        return jnp.minimum(p2s[idx], self.arr.shape[0] - 1)

    def __getitem__(self, key):
        if isinstance(key, IndexSym):
            return self._column(key)
        return self.arr[self._to_slot(key)]

    def __setitem__(self, key, value):
        if isinstance(value, (_AccumMax, _AccumMin)):
            value = value.value
        if isinstance(key, IndexSym):
            arr = self.arr
            if self.stride == 1:
                new = jnp.broadcast_to(
                    jnp.asarray(value, dtype=arr.dtype), arr.shape)
                if self.write_mask is not None:
                    new = jnp.where(self.write_mask, new, arr)
                self.store[self.name] = new
            else:
                col = self._column(key)
                new = jnp.broadcast_to(
                    jnp.asarray(value, dtype=arr.dtype), col.shape)
                if self.write_mask is not None:
                    new = jnp.where(self.write_mask, new, col)
                self.store[self.name] = arr.at[:, key.off].set(new)
        else:
            self.store[self.name] = self.arr.at[
                self._to_slot(key)].set(value)


class PairDestView(object):
    """Dest-array view inside the pair ``loop`` phase.

    Reads broadcast ``(N, 1)``.  ``__setitem__`` interprets the incoming
    value ``v``:

    - ``_AccumMax/_AccumMin`` marker: segment max/min over valid pairs.
    - anything else: sum-accumulation.  Since ``d[i] += x`` reaches here as
      ``read + x``, the per-pair delta is recovered as ``v - read`` and
      masked-summed over the neighbor axis.  This matches the reference's
      sequential per-pair accumulation to roundoff.
    """

    __slots__ = ('store', 'name', 'stride', 'pair_mask', 'write_mask')

    def __init__(self, store, name, stride, pair_mask, write_mask):
        self.store = store
        self.name = name
        self.stride = stride
        self.pair_mask = pair_mask
        self.write_mask = write_mask

    def _column(self, key):
        if key.mul != self.stride:
            raise IndexError(
                'property %r has stride %d but was indexed with stride %d'
                % (self.name, self.stride, key.mul))
        return (self.store[self.name] if self.stride == 1
                else self.store[self.name][:, key.off])

    def __getitem__(self, key):
        if not isinstance(key, IndexSym):
            return self.store[self.name][key]
        return self._column(key)[:, None]

    def __setitem__(self, key, value):
        if not isinstance(key, IndexSym):
            self.store[self.name] = self.store[self.name].at[key].set(value)
            return
        col = self._column(key)
        if isinstance(value, _AccumMax):
            v = jnp.broadcast_to(jnp.asarray(value.value, col.dtype),
                                 self.pair_mask.shape)
            seg = jnp.max(jnp.where(self.pair_mask, v, -jnp.inf), axis=1)
            new = jnp.maximum(col, seg.astype(col.dtype))
        elif isinstance(value, _AccumMin):
            v = jnp.broadcast_to(jnp.asarray(value.value, col.dtype),
                                 self.pair_mask.shape)
            seg = jnp.min(jnp.where(self.pair_mask, v, jnp.inf), axis=1)
            new = jnp.minimum(col, seg.astype(col.dtype))
        else:
            v = jnp.asarray(value, dtype=col.dtype)
            if v.ndim == 2 and v.shape[1] == self.pair_mask.shape[1]:
                delta = v - col[:, None]
                new = col + jnp.sum(
                    jnp.where(self.pair_mask, delta, 0.0), axis=1)
            elif v.ndim <= 1 or v.shape[1] == 1:
                # (N,) or (N,1): a pure per-particle assignment.
                new = jnp.broadcast_to(v.reshape(col.shape[0], -1)[:, 0]
                                       if v.ndim == 2 else v, col.shape)
            else:
                raise ValueError(
                    'cannot interpret write of shape %s to %r in loop phase'
                    % (v.shape, self.name))
        if self.write_mask is not None:
            new = jnp.where(self.write_mask, new, col)
        if self.stride == 1:
            self.store[self.name] = new
        else:
            self.store[self.name] = self.store[self.name].at[
                :, key.off].set(new)


class PairSrcView(object):
    """Source-array view inside the pair phase: gathers ``(N, K)``."""

    __slots__ = ('store', 'name', 'stride', 'idx', 'cache')

    def __init__(self, store, name, stride, idx, cache):
        self.store = store
        self.name = name
        self.stride = stride
        self.idx = idx
        self.cache = cache

    def __getitem__(self, key):
        if not isinstance(key, IndexSym):
            return self.store[self.name][key]
        if key.mul != self.stride:
            raise IndexError(
                'property %r has stride %d but was indexed with stride %d'
                % (self.name, self.stride, key.mul))
        ck = (self.name, key.off)
        if ck not in self.cache:
            arr = self.store[self.name]
            col = arr if self.stride == 1 else arr[:, key.off]
            self.cache[ck] = col[self.idx]
        return self.cache[ck]

    def __setitem__(self, key, value):
        raise ValueError('equations may only write d_* arrays at d_idx '
                         '(attempted write to source %r)' % self.name)


class ReduceView(object):
    """The ``dst`` argument of ``reduce(dst, t, dt)``: exposes properties
    and constants as attributes, plus ``mask``/``n_act`` for masking."""

    def __init__(self, store, schema, write_mask, active):
        object.__setattr__(self, '_store', store)
        object.__setattr__(self, '_schema', schema)
        object.__setattr__(self, 'mask', write_mask)
        object.__setattr__(self, 'active', active)

    def __getattr__(self, name):
        store = object.__getattribute__(self, '_store')
        if name in store:
            schema = object.__getattribute__(self, '_schema')
            return ArrayView(store, name,
                             stride=schema.strides.get(name, 1))
        raise AttributeError(name)


def _method_args(method):
    return _cached_args(method.__func__ if hasattr(method, '__func__')
                        else method)


@lru_cache(maxsize=None)
def _cached_args(func):
    return tuple(p for p in inspect.signature(func).parameters
                 if p != 'self')


class Equation(object):
    """Base class; mirrors reference sph/equation.py:392."""

    def __init__(self, dest, sources=None, name=None):
        self.dest = dest
        if sources is not None and len(sources) == 0:
            sources = None
        self.sources = sources
        self.no_source = sources is None
        self.name = name if name is not None else self.__class__.__name__
        self.var_name = ''

    def __repr__(self):
        return '%s(dest=%r, sources=%r)' % (self.__class__.__name__,
                                            self.dest, self.sources)

    def _get_helpers_(self):
        return []

    def methods(self):
        out = {}
        for m in ('py_initialize', 'initialize', 'initialize_pair', 'loop',
                  'loop_all', 'post_loop', 'reduce', 'converged'):
            f = getattr(self, m, None)
            if f is not None and callable(f):
                out[m] = f
        return out


class Group(object):
    """Ordered set of equations evaluated together.

    Mirrors reference sph/equation.py:448: ``real``, ``update_nnps``,
    ``iterate``/``max_iterations``/``min_iterations``, ``pre``/``post``,
    ``condition``, ``start_idx``/``stop_idx`` and nested sub-groups.
    """

    def __init__(self, equations, real=True, update_nnps=False,
                 iterate=False, max_iterations=1, min_iterations=0,
                 pre=None, post=None, condition=None, start_idx=0,
                 stop_idx=None, name=None):
        self.equations = list(equations)
        self.real = real
        self.update_nnps = update_nnps
        self.iterate = iterate
        self.max_iterations = max_iterations
        self.min_iterations = min_iterations
        self.pre = pre
        self.post = post
        self.condition = condition
        self.start_idx = start_idx
        self.stop_idx = stop_idx
        self.name = name
        self.has_subgroups = all(isinstance(e, Group) for e in
                                 self.equations) and len(self.equations) > 0

    def __repr__(self):
        return 'Group(n_eq=%d, real=%s, iterate=%s)' % (
            len(self.equations), self.real, self.iterate)


class MultiStageEquations(object):
    """Per-integrator-stage equation lists (reference equation.py:966)."""

    def __init__(self, groups):
        self.groups = list(groups)

    def __len__(self):
        return len(self.groups)

    def __repr__(self):
        return 'MultiStageEquations(n_stages=%d)' % len(self.groups)


def get_arrays_used_in_equation(equation):
    """Names of d_*/s_* properties an equation's methods request."""
    d_props, s_props = set(), set()
    for name, method in equation.methods().items():
        if name in ('reduce', 'converged', 'py_initialize'):
            continue
        for arg in _method_args(method):
            if arg in ('d_idx', 's_idx'):
                continue
            if arg.startswith('d_'):
                d_props.add(arg[2:])
            elif arg.startswith('s_'):
                s_props.add(arg[2:])
    return d_props, s_props
