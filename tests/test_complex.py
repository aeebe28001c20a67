"""Complex Hermitian operators through the whole stack (the reference has the
machinery commented out — unittests/test_lanczos.py:19 — and its
non-conjugated Gram-Schmidt would break it; here complex data orthogonalizes
with the Hermitian inner product)."""

import numpy as np
import pytest
import scipy.linalg as la

from eigensolvers_tpu import (JaxVector, inexactLanczosDiagonalization,
                              find_nearest)


@pytest.fixture(scope="module")
def problem():
    n = 80
    ev = np.linspace(1, 160, n)
    rng = np.random.RandomState(7)
    Q = la.qr(rng.rand(n, n) + 1j * rng.rand(n, n))[0]
    A = Q.conj().T @ np.diag(ev) @ Q
    assert np.allclose(A, A.conj().T)
    return A, ev


def test_complex_hermitian_lanczos(problem):
    A, ev = problem
    rng = np.random.RandomState(0)
    opts = {"linearSystemArgs": {"linearSolver": "gmres", "linearIter": 3000,
                                 "linear_tol": 1e-5,
                                 "errorOnNonConvergence": False}}
    Y0 = JaxVector(rng.rand(A.shape[0]) + 1j * rng.rand(A.shape[0]), opts)
    sigma = 50.2
    evL, uvL, st = inexactLanczosDiagonalization(
        A, Y0, sigma, 8, 6, 1e-8, writeOut=False)
    got = find_nearest(evL, sigma)[1]
    want = find_nearest(ev, sigma)[1]
    assert abs(got - want) <= 1e-5
    # returned basis orthonormal under the Hermitian inner product
    S = JaxVector.overlapMatrix(uvL)
    np.testing.assert_allclose(S, np.eye(S.shape[0]), atol=1e-5)


def test_complex_orthogonalize(problem):
    rng = np.random.RandomState(1)
    n = 64
    qs = []
    q = JaxVector((rng.rand(n) + 1j * rng.rand(n)))
    qs.append(q.normalize())
    for _ in range(3):
        x = JaxVector(rng.rand(n) + 1j * rng.rand(n))
        q = JaxVector.orthogonalize_against_set(x, qs)
        assert q is not None
        qs.append(q)
    S = JaxVector.overlapMatrix(qs)
    np.testing.assert_allclose(S, np.eye(4), atol=1e-12)


def test_split_complex_not_selected_for_complex_operator():
    """A complex-Hermitian operator with REAL guess vectors must not route to
    the real-only split-complex FEAST path (regression: the auto-selection
    once keyed on subspace dtype only)."""
    from eigensolvers_tpu.solvers.feast import _use_split_complex
    from eigensolvers_tpu import JaxVector
    rng = np.random.RandomState(0)
    n = 16
    M = rng.rand(n, n) + 1j * rng.rand(n, n)
    A = (M + M.conj().T) / 2
    Y = [JaxVector(rng.rand(n),
                   {"linearSystemArgs": {"splitComplex": True}})]
    assert not _use_split_complex(A, Y)
    # and with a real operator, forcing works
    assert _use_split_complex(A.real + A.real.T, Y)
