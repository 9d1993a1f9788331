"""Domain manager: simulation box, periodicity and coordinate wrapping.

Mirrors the role of the reference ``DomainManager``
(/root/reference/pysph/base/nnps_base.pyx:227-816): it defines the
simulation box and periodic axes, box-wraps particles that leave the domain
and makes neighbor relations across periodic faces work.

TPU-native design: instead of materializing periodic ghost particles each
step (reference nnps_base.pyx:751), periodicity is handled *algebraically*:

- cell indices wrap modulo the grid in the periodic dimensions, and
- pair displacements use the minimum-image convention.

This keeps particle counts static (no ghost-region resizing), is exactly
equivalent for boxes wider than two support radii, and costs one
``round``/``floor`` per pair instead of ghost bookkeeping.
"""

import jax.numpy as jnp


class DomainManager(object):
    def __init__(self, xmin=-1000.0, xmax=1000.0, ymin=0.0, ymax=0.0,
                 zmin=0.0, zmax=0.0, periodic_in_x=False, periodic_in_y=False,
                 periodic_in_z=False, n_layers=2.0, mirror_in_x=False,
                 mirror_in_y=False, mirror_in_z=False, props=None,
                 novel=False):
        self.xmin, self.xmax = float(xmin), float(xmax)
        self.ymin, self.ymax = float(ymin), float(ymax)
        self.zmin, self.zmax = float(zmin), float(zmax)
        self.periodic_in_x = bool(periodic_in_x)
        self.periodic_in_y = bool(periodic_in_y)
        self.periodic_in_z = bool(periodic_in_z)
        self.mirror_in_x = bool(mirror_in_x)
        self.mirror_in_y = bool(mirror_in_y)
        self.mirror_in_z = bool(mirror_in_z)
        self.is_mirror = (self.mirror_in_x or self.mirror_in_y or
                          self.mirror_in_z)
        self.n_layers = n_layers
        self.props = props
        self.is_periodic = (self.periodic_in_x or self.periodic_in_y or
                            self.periodic_in_z)

    def __repr__(self):
        return ('DomainManager(periodic=%s%s%s)' %
                tuple('xyz'[i] if f else ''
                      for i, f in enumerate(self.periodic)))

    @property
    def periodic(self):
        return (self.periodic_in_x, self.periodic_in_y, self.periodic_in_z)

    @property
    def mins(self):
        return (self.xmin, self.ymin, self.zmin)

    @property
    def lengths(self):
        return (self.xmax - self.xmin, self.ymax - self.ymin,
                self.zmax - self.zmin)

    # ------------------------------------------------------------------
    # jit-friendly operations
    # ------------------------------------------------------------------
    def wrap_positions(self, x, y, z):
        """Box-wrap the periodic coordinates (reference nnps_base.pyx:699)."""
        out = []
        for c, lo, L, flag in zip(
                (x, y, z), self.mins, self.lengths, self.periodic):
            if flag:
                out.append(lo + jnp.mod(c - lo, L))
            else:
                out.append(c)
        return tuple(out)

    def wrap_state(self, state):
        if not self.is_periodic:
            return state
        x, y, z = self.wrap_positions(state['x'], state['y'], state['z'])
        out = dict(state)
        out['x'], out['y'], out['z'] = x, y, z
        return out

    def minimum_image(self, dx, dy, dz):
        """Apply the minimum-image convention to pair displacements."""
        out = []
        for d, L, flag in zip((dx, dy, dz), self.lengths, self.periodic):
            if flag:
                out.append(d - L * jnp.round(d / L))
            else:
                out.append(d)
        return tuple(out)

    # ------------------------------------------------------------------
    # Mirror (reflective) boundaries
    # ------------------------------------------------------------------
    # The reference materializes mirror-image ghost particles each step
    # (nnps_base.pyx:505-660: position reflected about the face, the
    # normal velocity component negated, everything else copied, corner
    # images via sequential per-axis passes).  Here the same semantics
    # run as a traced, static-shape scatter: images of near-face
    # particles are written into the capacity tail of the flat state
    # and ``n_act`` grows to cover them; the integrator strips them
    # (``strip_mirror_ghosts``) and re-creates them every step, and the
    # steppers never advance them (tag == Ghost).

    def strip_mirror_ghosts(self, state):
        """Reset ``n_act`` to exclude trailing mirror ghosts."""
        from pysph_tpu.base.particle_array import ParticleTAGS
        cap = state['x'].shape[0]
        act = jnp.arange(cap, dtype=jnp.int32) < state['n_act']
        n_ghost = jnp.sum(
            (act & (state['tag'] == ParticleTAGS.Ghost)).astype(
                jnp.int32))
        out = dict(state)
        out['n_act'] = state['n_act'] - n_ghost
        return out

    def add_mirror_ghosts(self, state, cell_size, props):
        """Append mirror-image ghosts of near-face particles.

        ``cell_size`` is the ghost band width (n_layers * support
        cell, traced scalar ok); ``props`` is the set of per-particle
        property names (so constants are never scattered).  Returns
        ``(new_state, overflow)`` where ``overflow`` flags ghosts that
        did not fit in the capacity tail (the solver grows capacity
        and redoes the step, like any other overflow).
        """
        from pysph_tpu.base.particle_array import ParticleTAGS
        mirrors = ((self.mirror_in_x, 'x', 'u', self.xmin, self.xmax),
                   (self.mirror_in_y, 'y', 'v', self.ymin, self.ymax),
                   (self.mirror_in_z, 'z', 'w', self.zmin, self.zmax))
        overflow = jnp.asarray(False)
        for flag, coord, vel, lo, hi in mirrors:
            if not flag:
                continue
            state, ovf = self._mirror_one_axis(
                state, coord, vel, lo, hi, cell_size, props,
                ParticleTAGS.Ghost)
            overflow = overflow | ovf
        return state, overflow

    def _mirror_one_axis(self, state, coord, vel, lo, hi, cell_size,
                         props, ghost_tag):
        cap = state['x'].shape[0]
        idx = jnp.arange(cap, dtype=jnp.int32)
        n = state['n_act']
        act = idx < n
        c = state[coord]
        near_lo = act & ((c - lo) <= cell_size)
        near_hi = act & ((hi - c) <= cell_size)
        cnt_lo = jnp.cumsum(near_lo.astype(jnp.int32))
        g_lo = cnt_lo[-1]
        cnt_hi = jnp.cumsum(near_hi.astype(jnp.int32))
        g_hi = cnt_hi[-1]
        # destination rows in the capacity tail; `cap` (out of bounds,
        # mode='drop') for particles that are not imaged
        dest_lo = jnp.where(near_lo, n + cnt_lo - 1, cap)
        dest_hi = jnp.where(near_hi, n + g_lo + cnt_hi - 1, cap)
        new_n = n + g_lo + g_hi
        overflow = new_n > cap
        out = dict(state)
        for k in props:
            if k not in state:
                continue
            v = state[k]
            if not hasattr(v, 'ndim') or v.ndim == 0 or \
                    v.shape[0] != cap:
                continue
            if k == coord:
                lo_vals, hi_vals = 2.0 * lo - v, 2.0 * hi - v
            elif k == vel:
                lo_vals = hi_vals = -v
            elif k == 'tag':
                lo_vals = hi_vals = jnp.full_like(v, ghost_tag)
            else:
                lo_vals = hi_vals = v
            nv = v.at[dest_lo].set(lo_vals, mode='drop')
            nv = nv.at[dest_hi].set(hi_vals, mode='drop')
            out[k] = nv
        out['n_act'] = jnp.minimum(new_n, cap)
        return out, overflow
