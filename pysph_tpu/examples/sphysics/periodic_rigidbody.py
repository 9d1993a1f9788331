"""Keep rigid-body particles grouped with their center of mass across
periodic faces so body moments stay well defined (parity with
/root/reference/pysph/examples/sphysics/periodic_rigidbody.py)."""

import jax.numpy as jnp

from pysph_tpu.sph.equation import Equation


class GroupParticles(Equation):
    def __init__(self, dest, sources=None, xmin=0.0, xmax=0.0,
                 ymin=0.0, ymax=0.0, zmin=0.0, zmax=0.0,
                 periodic_in_x=False, periodic_in_y=False,
                 periodic_in_z=False):
        self.periodic_in_x = periodic_in_x
        self.periodic_in_y = periodic_in_y
        self.periodic_in_z = periodic_in_z
        self.xlen = abs(xmax - xmin)
        self.xmin, self.xmax = xmin, xmax
        self.ylen = abs(ymax - ymin)
        self.ymin, self.ymax = ymin, ymax
        self.zlen = abs(zmax - zmin)
        self.zmin, self.zmax = zmin, zmax
        super(GroupParticles, self).__init__(dest, sources)

    def loop(self, d_idx, d_cm, d_body_id, d_x, d_y, d_z):
        b = d_body_id[d_idx] * 3
        if self.periodic_in_x:
            cm = d_cm[b + 0]
            stray = jnp.abs(d_x[d_idx] - cm) > (self.xlen / 2.0)
            shift = jnp.where(cm > self.xmin + self.xlen / 2.0,
                              self.xlen, -self.xlen)
            d_x[d_idx] = d_x[d_idx] + jnp.where(stray, shift, 0.0)
        if self.periodic_in_y:
            cm = d_cm[b + 1]
            stray = jnp.abs(d_y[d_idx] - cm) > (self.ylen / 2.0)
            shift = jnp.where(cm > self.ymin + self.ylen / 2.0,
                              self.ylen, -self.ylen)
            d_y[d_idx] = d_y[d_idx] + jnp.where(stray, shift, 0.0)
        if self.periodic_in_z:
            cm = d_cm[b + 2]
            stray = jnp.abs(d_z[d_idx] - cm) > (self.zlen / 2.0)
            shift = jnp.where(cm > self.zmin + self.zlen / 2.0,
                              self.zlen, -self.zlen)
            d_z[d_idx] = d_z[d_idx] + jnp.where(stray, shift, 0.0)
