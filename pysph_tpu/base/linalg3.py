"""3x3 linear algebra helpers (parity with
/root/reference/pysph/base/linalg3.pyx) — batched jnp versions.

Arrays may carry arbitrary leading batch dimensions; the matrix axes are
the trailing two."""

import jax.numpy as jnp


def eigen_decomposition(A):
    """Eigen decomposition of a symmetric 3x3 (batched) matrix.

    Returns (R, V): eigenvector matrix (columns) and eigenvalues, like
    the reference ``eigen_decomposition`` (linalg3.pyx)."""
    V, R = jnp.linalg.eigh(A)
    return R, V


def transform(A, P):
    """P^T A P."""
    return jnp.swapaxes(P, -1, -2) @ A @ P


def transform_diag(d, P):
    """P^T diag(d) P."""
    return transform(jnp.zeros(d.shape + (3,)).at[..., 0, 0].set(0) +
                     jnp.eye(3) * d[..., None, :], P)


def transform_diag_inv(d, P):
    """P diag(d) P^T (reference ``transform_diag_inv``)."""
    D = jnp.eye(3) * d[..., None, :]
    return P @ D @ jnp.swapaxes(P, -1, -2)


def py_get_eigenvalues(A):
    return jnp.linalg.eigvalsh(A)


def py_get_eigenvector(A):
    return jnp.linalg.eigh(A)[1]
