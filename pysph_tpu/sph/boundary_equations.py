"""SPH boundary force equations (parity with
/root/reference/pysph/sph/boundary_equations.py)."""

import jax.numpy as jnp

from pysph_tpu.sph.equation import Equation


def wendland_quintic(rij=1.0, h=1.0):
    """Unnormalized Wendland C4-style shape used by the Kajtar force
    (reference boundary_equations.py:8)."""
    q = rij / h
    q1 = 2.0 - q
    val = (1 + 2.5 * q + 2 * q * q) * q1 ** 5
    return jnp.where(q < 2.0, val, 0.0)


class MonaghanBoundaryForce(Equation):
    """Monaghan's normal/tangential boundary force
    (reference boundary_equations.py:18)."""

    def __init__(self, dest, sources, deltap):
        self.deltap = deltap
        super(MonaghanBoundaryForce, self).__init__(dest, sources)

    def loop(self, d_idx, s_idx, s_m, d_m, d_cs, d_h,
             s_tx, s_ty, s_tz, s_nx, s_ny, s_nz,
             d_au, d_av, d_aw, XIJ):
        ma = d_m[d_idx]
        mb = s_m[s_idx]
        cs = d_cs[d_idx]
        nx, ny, nz = s_nx[s_idx], s_ny[s_idx], s_nz[s_idx]
        tx, ty, tz = s_tx[s_idx], s_ty[s_idx], s_tz[s_idx]

        x = XIJ[0] * tx + XIJ[1] * ty + XIJ[2] * tz
        y = XIJ[0] * nx + XIJ[1] * ny + XIJ[2] * nz

        q = y / d_h[d_idx]
        xabs = jnp.abs(x)
        in_range = (xabs >= 0) & (xabs <= self.deltap)
        safe_y = jnp.where(jnp.abs(y) > 1e-12, y, 1.0)
        beta = 0.02 * cs * cs / safe_y
        tforce = 1.0 - xabs / self.deltap
        nforce = jnp.where(
            (q > 0) & (q <= 2.0 / 3.0), 2.0 / 3.0,
            jnp.where((q > 2.0 / 3.0) & (q <= 1.0),
                      2 * q * (1.0 - 0.75 * q),
                      jnp.where((q > 1.0) & (q <= 2.0),
                                0.5 * (2 - q) * (2 - q), 0.0)))
        force = jnp.where(in_range,
                          (mb / (ma + mb)) * nforce * tforce * beta,
                          0.0)
        d_au[d_idx] += force * nx
        d_av[d_idx] += force * ny
        d_aw[d_idx] += force * nz


class MonaghanKajtarBoundaryForce(Equation):
    """Monaghan-Kajtar repulsive boundary force
    (reference boundary_equations.py:81)."""

    def __init__(self, dest, sources, K=None, beta=None, h=None):
        self.K = K
        self.beta = beta
        self.h = h
        if None in (K, beta, h):
            raise ValueError('Invalid parameter values')
        super(MonaghanKajtarBoundaryForce, self).__init__(dest, sources)

    def loop(self, d_idx, s_idx, d_m, s_m, d_au, d_av, d_aw, RIJ,
             R2IJ, XIJ):
        ma = d_m[d_idx]
        mb = s_m[s_idx]
        w = wendland_quintic(RIJ, self.h)
        safe_r2 = jnp.where(R2IJ > 1e-12, R2IJ, 1.0)
        force = jnp.where(
            R2IJ > 1e-12,
            self.K / self.beta * w / safe_r2 * 2 * mb / (ma + mb), 0.0)
        d_au[d_idx] += force * XIJ[0]
        d_av[d_idx] += force * XIJ[1]
        d_aw[d_idx] += force * XIJ[2]
