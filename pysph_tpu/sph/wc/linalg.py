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
