"""Small linear-algebra helpers for equations (parity with
/root/reference/pysph/sph/wc/linalg.py).

The reference provides scalar-loop Gauss-Jordan routines injected into
generated code; here they are batched jnp operations.  ``mat`` arguments
are arrays whose *last* one/two axes are the matrix axes and may carry
any leading batch shape (e.g. (n_slots,))."""

import jax.numpy as jnp


def identity(n, batch_shape=()):
    """n x n identity, optionally batched."""
    return jnp.broadcast_to(jnp.eye(n), batch_shape + (n, n))


def dot(a, b, n=None):
    """Dot product over the last axis."""
    return jnp.sum(a * b, axis=-1)


def mat_mult(a, b, n=None):
    """Matrix multiply over the trailing axes."""
    return a @ b


def mat_vec_mult(a, b, n=None):
    """Matrix-vector multiply over the trailing axes."""
    return jnp.einsum('...ij,...j->...i', a, b)


def augmented_matrix(A, b, n=None, na=1, nmax=None):
    """[A | b] (reference linalg.py augmented_matrix)."""
    if b.ndim == A.ndim - 1:
        b = b[..., None]
    return jnp.concatenate([A, b], axis=-1)


def gj_solve(A, b=None, n=None, nb=1):
    """Solve A x = b (the reference's in-place Gauss-Jordan becomes a
    batched ``jnp.linalg.solve`` with a singularity guard: singular
    systems return zeros instead of crashing)."""
    if b is None:
        # augmented form [A | b]
        m = A.shape[-1] - 1
        b = A[..., m]
        A = A[..., :m]
    det = jnp.linalg.det(A)
    ok = jnp.abs(det) > 1e-30
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    A_safe = jnp.where(ok[..., None, None], A, eye)
    x = jnp.linalg.solve(A_safe, b[..., None])[..., 0]
    return jnp.where(ok[..., None], x, 0.0)


def small_solve_cols(a, w, n, tiny=1e-30):
    """Solve ``A x = w`` for n in (1, 2, 3) with closed-form adjugate
    arithmetic — plain mul/add/div only, so it lowers inside pallas
    kernels (Mosaic has no LU primitive; ``jnp.linalg.inv`` fails
    with "Unimplemented primitive ... lu" on hardware).

    ``a``: nested list ``a[i][j]`` of broadcast-compatible arrays;
    ``w``: list of n arrays.  Singular systems return ``w`` unchanged
    (the callers' relative-change tolerance then treats the
    correction as identity — the same net effect as the reference's
    unpivoted gj_solve whose garbage solution fails the tol test)."""
    if n == 1:
        det = a[0][0]
        ok = jnp.abs(det) > tiny
        d = jnp.where(ok, det, 1.0)
        return [jnp.where(ok, w[0] / d, w[0])]
    if n == 2:
        det = a[0][0] * a[1][1] - a[0][1] * a[1][0]
        ok = jnp.abs(det) > tiny
        d = jnp.where(ok, det, 1.0)
        x0 = (a[1][1] * w[0] - a[0][1] * w[1]) / d
        x1 = (a[0][0] * w[1] - a[1][0] * w[0]) / d
        return [jnp.where(ok, x0, w[0]), jnp.where(ok, x1, w[1])]
    if n == 3:
        c00 = a[1][1] * a[2][2] - a[1][2] * a[2][1]
        c01 = -(a[1][0] * a[2][2] - a[1][2] * a[2][0])
        c02 = a[1][0] * a[2][1] - a[1][1] * a[2][0]
        c10 = -(a[0][1] * a[2][2] - a[0][2] * a[2][1])
        c11 = a[0][0] * a[2][2] - a[0][2] * a[2][0]
        c12 = -(a[0][0] * a[2][1] - a[0][1] * a[2][0])
        c20 = a[0][1] * a[1][2] - a[0][2] * a[1][1]
        c21 = -(a[0][0] * a[1][2] - a[0][2] * a[1][0])
        c22 = a[0][0] * a[1][1] - a[0][1] * a[1][0]
        det = a[0][0] * c00 + a[0][1] * c01 + a[0][2] * c02
        ok = jnp.abs(det) > tiny
        d = jnp.where(ok, det, 1.0)
        # inv(A)_ij = C_ji / det
        x0 = (c00 * w[0] + c10 * w[1] + c20 * w[2]) / d
        x1 = (c01 * w[0] + c11 * w[1] + c21 * w[2]) / d
        x2 = (c02 * w[0] + c12 * w[1] + c22 * w[2]) / d
        return [jnp.where(ok, x0, w[0]), jnp.where(ok, x1, w[1]),
                jnp.where(ok, x2, w[2])]
    raise ValueError('small_solve_cols supports n <= 3')
