"""3x3 linear-algebra helper tests (behavioral parity with reference
base/tests/test_linalg3.py: eigenvalues, eigen decomposition,
transform round-trips — on the same classes of symmetric matrices)."""

import numpy as np

from pysph_tpu.base import linalg3


def _sym_cases():
    rng = np.random.RandomState(7)
    cases = [
        np.eye(3),
        np.diag([3.0, 2.0, 1.0]),
        np.array([[2.0, 1.0, 0.0],
                  [1.0, 2.0, 1.0],
                  [0.0, 1.0, 2.0]]),
        np.zeros((3, 3)),
        # degenerate (repeated) eigenvalues
        np.array([[2.0, 0.0, 0.0],
                  [0.0, 2.0, 0.0],
                  [0.0, 0.0, 5.0]]),
    ]
    for _ in range(5):
        B = rng.randn(3, 3)
        cases.append(0.5 * (B + B.T))
    return cases


def test_eigenvalues_match_numpy():
    for A in _sym_cases():
        got = np.sort(np.asarray(linalg3.py_get_eigenvalues(A)))
        want = np.sort(np.linalg.eigvalsh(A))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_eigen_decomposition_reconstructs():
    for A in _sym_cases():
        R, V = linalg3.eigen_decomposition(np.asarray(A))
        R = np.asarray(R)
        V = np.asarray(V)
        # A = R diag(V) R^T
        np.testing.assert_allclose(R @ np.diag(V) @ R.T, A,
                                   atol=1e-5)
        # columns orthonormal
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)


def test_transform_is_congruence():
    rng = np.random.RandomState(3)
    A = rng.randn(3, 3)
    P = rng.randn(3, 3)
    got = np.asarray(linalg3.transform(A, P))
    np.testing.assert_allclose(got, P.T @ A @ P, rtol=1e-5,
                               atol=1e-6)


def test_transform_diag_round_trip():
    # transform_diag_inv(eigvals, eigvecs) reconstructs the matrix,
    # and transform_diag(eigvals, eigvecs) diagonalizes back
    for A in _sym_cases():
        R, V = linalg3.eigen_decomposition(np.asarray(A))
        back = np.asarray(linalg3.transform_diag_inv(V, R))
        np.testing.assert_allclose(back, A, atol=1e-5)
        # transform(A, R) = R^T A R diagonalizes A
        diag = np.asarray(linalg3.transform(np.asarray(A),
                                            np.asarray(R)))
        np.testing.assert_allclose(diag, np.diag(np.asarray(V)),
                                   atol=1e-5)
        # transform_diag(d, P) is the P^T diag(d) P congruence
        td = np.asarray(linalg3.transform_diag(V, np.asarray(R)))
        np.testing.assert_allclose(
            td, np.asarray(R).T @ np.diag(np.asarray(V))
            @ np.asarray(R), atol=1e-5)


def test_batched_matches_loop():
    rng = np.random.RandomState(11)
    B = rng.randn(8, 3, 3)
    A = 0.5 * (B + np.swapaxes(B, -1, -2))
    Rb, Vb = linalg3.eigen_decomposition(A)
    Rb, Vb = np.asarray(Rb), np.asarray(Vb)
    for i in range(8):
        Ri, Vi = linalg3.eigen_decomposition(A[i])
        np.testing.assert_allclose(np.asarray(Vi), Vb[i], atol=1e-5)
        np.testing.assert_allclose(np.asarray(Ri), Rb[i], atol=1e-5)
