"""Particle arrays for pysph_tpu.

``ParticleArray`` mirrors the reference container
(/root/reference/pysph/base/particle_array.pyx:68): a named collection of
per-particle property arrays + named constants, with tags
(Local=0/Remote=1/Ghost=2), strided properties, defaults, add/remove/extend/
extract operations and output-property selection.

TPU-native design: the *host-side* master copy is plain numpy (these
mutation APIs are setup/IO operations, never the hot path).  For compute,
``to_device(capacity)`` produces a pytree "device state": a dict of
fixed-capacity padded ``jnp`` arrays plus an ``n_act`` scalar, which the
jitted solver step threads functionally.  ``update_from_device`` syncs
results back.  Padding slots carry each property's default value and tag
``Padding`` so they never contaminate neighbor sums (their pair mask is
always False).
"""

from collections import OrderedDict

import numpy as np

try:  # jax is optional at import time for pure host-side use
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None

from pysph_tpu.config import get_config

UINT_MAX = (1 << 32) - 1


class ParticleTAGS:
    Local = 0
    Remote = 1
    Ghost = 2
    # pysph_tpu-only: marks padded capacity slots on device.
    Padding = 3


def get_local_tag():
    return ParticleTAGS.Local


def get_remote_tag():
    return ParticleTAGS.Remote


def get_ghost_tag():
    return ParticleTAGS.Ghost


_TYPE_MAP = {
    'double': 'float',
    'float': 'float',
    'int': np.int32,
    'long': np.int64,
    'unsigned int': np.uint32,
}


def _np_dtype(type_name):
    t = _TYPE_MAP.get(type_name, 'float')
    if t == 'float':
        return get_config().float_dtype
    return t


def is_float_dtype(dtype):
    return np.issubdtype(np.dtype(dtype), np.floating)


class ParticleArray(object):
    """A named set of per-particle properties and constants."""

    def __init__(self, name='', constants=None, backend=None, **props):
        self.name = name
        self.properties = OrderedDict()
        self.default_values = {}
        self.stride = {}
        self._type = {}
        self.constants = OrderedDict()
        self.output_property_arrays = []
        self.gpu = None  # API parity with reference (device helper slot)
        self.num_real_particles = 0
        # host<->device sync bookkeeping (managed by the Solver)
        self._device_state = None

        nparticles = 0
        for prop, data in props.items():
            if data is None:
                continue
            arr = np.atleast_1d(np.asarray(data))
            nparticles = max(nparticles, arr.size)
        for prop, data in props.items():
            if prop in ('tag', 'pid'):
                self.add_property(prop, type='int', data=data,
                                  _n=nparticles)
            elif prop == 'gid':
                self.add_property(prop, type='unsigned int', data=data,
                                  default=UINT_MAX, _n=nparticles)
            else:
                self.add_property(prop, type='double', data=data,
                                  _n=nparticles)
        if constants:
            for name_, value in constants.items():
                self.add_constant(name_, value)
        self._update_num_real()

    # ------------------------------------------------------------------
    # Introspection
    # ------------------------------------------------------------------
    def get_number_of_particles(self, real=False):
        if real:
            return self.num_real_particles
        if len(self.properties) == 0:
            return 0
        first = next(iter(self.properties.values()))
        name = next(iter(self.properties.keys()))
        return first.size // self.stride.get(name, 1)

    def _update_num_real(self):
        if 'tag' in self.properties:
            self.num_real_particles = int(
                np.sum(self.properties['tag'] == ParticleTAGS.Local))
        else:
            self.num_real_particles = self.get_number_of_particles()

    # ------------------------------------------------------------------
    # Properties / constants
    # ------------------------------------------------------------------
    def add_property(self, name, type='double', default=None, data=None,
                     stride=1, _n=None):
        """Add a new property; mirrors reference particle_array.pyx:772."""
        dtype = _np_dtype(type)
        if default is None:
            default = ParticleTAGS.Local if name == 'tag' else 0
        self.default_values[name] = default
        self.stride[name] = stride
        self._type[name] = type
        n = self.get_number_of_particles() if _n is None else _n
        if data is None:
            arr = np.full(n * stride, default, dtype=dtype)
        else:
            arr = np.atleast_1d(np.asarray(data)).astype(dtype).ravel().copy()
            if arr.size == 1 and n > 1:
                arr = np.full(n * stride, arr[0], dtype=dtype)
            elif arr.size < n * stride:
                pad = np.full(n * stride - arr.size, default, dtype=dtype)
                arr = np.concatenate([arr, pad])
        self.properties[name] = arr
        if name == 'tag':
            self._update_num_real()
        self._device_state = None
        return self

    def ensure_properties(self, props):
        for p in props:
            if isinstance(p, dict):
                name = p['name']
                if name not in self.properties:
                    kw = dict(p)
                    kw.pop('name')
                    self.add_property(name, **kw)
            elif p not in self.properties:
                self.add_property(p)

    def add_constant(self, name, value):
        v = np.atleast_1d(np.asarray(value))
        if v.dtype.kind == 'f':
            v = v.astype(get_config().float_dtype)
        self.constants[name] = v

    def add_output_arrays(self, props):
        for p in props:
            if p not in self.output_property_arrays:
                self.output_property_arrays.append(p)

    def set_output_arrays(self, props):
        self.output_property_arrays = list(props)

    def remove_property(self, name):
        self.properties.pop(name, None)
        self.default_values.pop(name, None)
        self.stride.pop(name, None)
        self._device_state = None

    # ------------------------------------------------------------------
    # Data access
    # ------------------------------------------------------------------
    def get(self, *args, **kw):
        only_real = kw.get('only_real_particles', True)
        result = []
        for name in args:
            if name in self.properties:
                arr = self.properties[name]
                if only_real:
                    s = self.stride.get(name, 1)
                    arr = arr[:self.num_real_particles * s]
                result.append(arr)
            elif name in self.constants:
                result.append(self.constants[name])
            else:
                raise AttributeError('No property/constant %r' % name)
        return result[0] if len(result) == 1 else tuple(result)

    def set(self, **props):
        for name, data in props.items():
            if name not in self.properties:
                self.add_property(name, data=data)
            else:
                arr = self.properties[name]
                data = np.asarray(data, dtype=arr.dtype).ravel()
                arr[:data.size] = data
        self._device_state = None

    def __getattr__(self, name):
        # Only called when normal lookup fails.
        props = self.__dict__.get('properties')
        if props is not None and name in props:
            return self.get(name)
        consts = self.__dict__.get('constants')
        if consts is not None and name in consts:
            return consts[name]
        raise AttributeError('%r object has no attribute %r' %
                             (self.__class__.__name__, name))

    def __setattr__(self, name, value):
        if name not in ('properties', 'constants') and \
                'properties' in self.__dict__ and name in self.properties:
            self.set(**{name: value})
        else:
            object.__setattr__(self, name, value)

    def get_carray(self, name):
        return self.properties[name]

    # ------------------------------------------------------------------
    # Particle add/remove (host-side; rare path)
    # ------------------------------------------------------------------
    def extend(self, num):
        """Append ``num`` default-valued particles."""
        for name, arr in self.properties.items():
            s = self.stride.get(name, 1)
            extra = np.full(num * s, self.default_values[name],
                            dtype=arr.dtype)
            self.properties[name] = np.concatenate([arr, extra])
        self._device_state = None

    def add_particles(self, align=True, **props):
        """Append particles given per-property data arrays (reference
        particle_array.pyx:1004)."""
        num = 0
        for name, data in props.items():
            s = self.stride.get(name, 1)
            num = max(num,
                      np.atleast_1d(np.asarray(data)).size // s)
        if num == 0:
            return
        old_n = self.get_number_of_particles()
        self.extend(num)
        for name, data in props.items():
            if name not in self.properties:
                continue
            s = self.stride.get(name, 1)
            arr = np.atleast_1d(np.asarray(data)).ravel()
            self.properties[name][old_n * s:old_n * s + arr.size] = arr
        self._update_num_real()
        self._device_state = None

    def get_property_arrays(self, all=True, only_real=False):
        """Dict of property name -> numpy array (reference
        particle_array.pyx:1475)."""
        n = self.num_real_particles if only_real else \
            self.get_number_of_particles()
        out = {}
        for name, arr in self.properties.items():
            s = self.stride.get(name, 1)
            out[name] = arr[:n * s]
        return out

    def remove_particles(self, indices, align=True):
        indices = np.asarray(indices, dtype=np.int64)
        n = self.get_number_of_particles()
        keep = np.ones(n, dtype=bool)
        keep[indices] = False
        self._filter(keep)

    def remove_tagged_particles(self, tag, align=True):
        keep = self.properties['tag'] != tag
        self._filter(keep)

    def _filter(self, keep):
        for name, arr in self.properties.items():
            s = self.stride.get(name, 1)
            if s == 1:
                self.properties[name] = arr[keep]
            else:
                self.properties[name] = arr.reshape(-1, s)[keep].ravel()
        self._update_num_real()
        self._device_state = None

    def align_particles(self):
        """Real (Local) particles first, mirroring particle_array.pyx:1092."""
        if 'tag' not in self.properties:
            return
        tag = self.properties['tag']
        order = np.argsort(tag != ParticleTAGS.Local, kind='stable')
        for name, arr in self.properties.items():
            s = self.stride.get(name, 1)
            if s == 1:
                self.properties[name] = arr[order]
            else:
                self.properties[name] = arr.reshape(-1, s)[order].ravel()
        self._update_num_real()
        self._device_state = None

    def append_parray(self, parray, align=True, update_constants=False):
        """Append all particles of ``parray`` (reference :1130)."""
        num_extra = parray.get_number_of_particles()
        if num_extra == 0:
            return
        old_n = self.get_number_of_particles()
        self.extend(num_extra)
        for name in self.properties:
            s = self.stride.get(name, 1)
            dst = self.properties[name]
            if name in parray.properties:
                src = parray.properties[name]
                dst[old_n * s:old_n * s + src.size] = src
        # add any new properties from parray
        for name in parray.properties:
            if name not in self.properties:
                self.add_property(
                    name, type=parray._type.get(name, 'double'),
                    default=parray.default_values.get(name, 0),
                    stride=parray.stride.get(name, 1))
                s = self.stride[name]
                src = parray.properties[name]
                self.properties[name][old_n * s:old_n * s + src.size] = src
        if update_constants:
            for name, v in parray.constants.items():
                if name not in self.constants:
                    self.constants[name] = v.copy()
        if align:
            self.align_particles()
        self._update_num_real()
        self._device_state = None

    def extract_particles(self, indices, dest_array=None, align=True,
                          props=None):
        """Copy the given particles into ``dest_array`` (APPENDING, as
        the reference does, particle_array.pyx:1237) or into a fresh
        clone when no destination is given."""
        indices = np.asarray(indices, dtype=np.int64)
        use = list(self.properties.keys()) if props is None else props
        data = {}
        for name in use:
            s = self.stride.get(name, 1)
            src = self.properties[name]
            if s == 1:
                data[name] = src[indices].copy()
            else:
                data[name] = src.reshape(-1, s)[indices].ravel().copy()
        if dest_array is None:
            dest_array = self.empty_clone(props=props)
        missing = [n for n in use if n not in dest_array.properties]
        for name in missing:
            dest_array.add_property(
                name, type=self._type.get(name, 'double'),
                default=self.default_values.get(name, 0),
                stride=self.stride.get(name, 1))
        dest_array.add_particles(**data)
        return dest_array

    def empty_clone(self, props=None):
        """An empty ParticleArray with the same property metadata."""
        clone = ParticleArray(name=self.name)
        use = list(self.properties.keys()) if props is None else props
        for name in use:
            clone.add_property(
                name, type=self._type.get(name, 'double'),
                default=self.default_values.get(name, 0),
                stride=self.stride.get(name, 1), _n=0)
        for name, v in self.constants.items():
            clone.constants[name] = v.copy()
        clone.set_output_arrays(list(self.output_property_arrays))
        return clone

    # ------------------------------------------------------------------
    # Device state (the TPU hot-path representation)
    # ------------------------------------------------------------------
    def to_device(self, capacity=None):
        """Return (state, capacity): a dict of padded jnp arrays.

        Strided properties become (capacity, stride) arrays.  ``tag`` for
        padding slots is ``ParticleTAGS.Padding``.
        """
        n = self.get_number_of_particles()
        if capacity is None:
            capacity = max(128, -(-max(n, 1) // 128) * 128)
        if capacity < n:
            raise ValueError('capacity %d < particle count %d' %
                             (capacity, n))
        state = {}
        for name, arr in self.properties.items():
            s = self.stride.get(name, 1)
            default = self.default_values[name]
            if name == 'tag':
                default = ParticleTAGS.Padding
            pad_n = capacity - n
            if s == 1:
                padded = np.concatenate([
                    arr, np.full(pad_n, default, dtype=arr.dtype)])
            else:
                padded = np.concatenate([
                    arr.reshape(n, s) if n else arr.reshape(0, s),
                    np.full((pad_n, s), default, dtype=arr.dtype)], axis=0)
            state[name] = jnp.asarray(padded)
        # Constants ride along unpadded so equations can read/write them
        # (e.g. rigid-body reductions mutate cm/force/torque each step).
        for name, v in self.constants.items():
            if name in state:
                raise ValueError('constant %r shadows a property' % name)
            state[name] = jnp.asarray(v)
        state['n_act'] = jnp.asarray(n, dtype=np.int32)
        return state, capacity

    def update_from_device(self, state):
        """Copy a device state dict back into the host arrays."""
        n_act = int(state['n_act'])
        resized = n_act != self.get_number_of_particles()
        for name, dev in state.items():
            if name == 'n_act':
                continue
            if name in self.constants:
                # np.array (not asarray): views of jax arrays are
                # read-only, but host code mutates constants (e.g.
                # the hybrid inlet's uref relaxation)
                self.constants[name] = np.array(dev)
                continue
            if name not in self.properties:
                continue
            host = np.asarray(dev)
            s = self.stride.get(name, 1)
            data = host[:n_act].ravel() if s > 1 else host[:n_act]
            if resized:
                self.properties[name] = data.astype(
                    self.properties[name].dtype)
            else:
                self.properties[name][:] = data
        self._update_num_real()

    # pickling support (mirrors reference :179)
    def __reduce__(self):
        d = dict(
            name=self.name,
            properties={k: v for k, v in self.properties.items()},
            stride=dict(self.stride),
            types=dict(self._type),
            defaults=dict(self.default_values),
            constants={k: v for k, v in self.constants.items()},
            output=list(self.output_property_arrays),
        )
        return (_rebuild_particle_array, (d,))


def _rebuild_particle_array(d):
    pa = ParticleArray(name=d['name'])
    for name, arr in d['properties'].items():
        pa.add_property(
            name, type=d['types'].get(name, 'double'),
            default=d['defaults'].get(name, 0),
            stride=d['stride'].get(name, 1), data=arr,
            _n=arr.size // d['stride'].get(name, 1))
    for name, v in d['constants'].items():
        pa.constants[name] = v
    pa.set_output_arrays(d['output'])
    pa._update_num_real()
    return pa
