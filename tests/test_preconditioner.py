"""Jacobi-preconditioned inner solves.

A framework extension beyond the reference (its scipy solvers ran
unpreconditioned, reference: numpyVector.py:161-171): diag(sigma*I - H)
preconditioning for the shifted Krylov solves, exposed per-vector via
options["linearSystemArgs"]["preconditioner"] = "jacobi".
"""

import numpy as np
import pytest

from eigensolvers_tpu import (DenseOperator, DiagonalOperator, JaxVector,
                              SumOfProductOperator, GroupedSoPOperator,
                              as_operator, inexactLanczosDiagonalization,
                              find_nearest)
from eigensolvers_tpu.ops import linear_solvers as ls


def _dd_matrix(n, seed=3, dominance=2.5):
    """Diagonally dominant symmetric matrix with spread-out diagonal."""
    rng = np.random.RandomState(seed)
    A = rng.rand(n, n) - 0.5
    A = (A + A.T) / 2
    A[np.diag_indices(n)] = np.linspace(1.0, 50.0, n) * dominance
    return A


# ---------------------------------------------------------------------------
# diagonal() across operator types
# ---------------------------------------------------------------------------
def test_diagonal_dense_diag_banded_bsr():
    from eigensolvers_tpu.ops.sparse import BandedOperator, BSROperator
    A = _dd_matrix(64)
    np.testing.assert_allclose(np.asarray(DenseOperator(A).diagonal()),
                               np.diag(A))
    d = np.linspace(1, 2, 64)
    np.testing.assert_allclose(np.asarray(DiagonalOperator(d).diagonal()), d)
    band = np.triu(np.tril(A, 2), -2)
    bop = BandedOperator.from_dense(band)
    np.testing.assert_allclose(np.asarray(bop.diagonal()), np.diag(band))
    bsr = BSROperator.from_dense(band, block_size=16, drop_tol=1e-12)
    np.testing.assert_allclose(np.asarray(bsr.diagonal()), np.diag(band))


def test_diagonal_sop_and_grouped():
    rng = np.random.RandomState(5)
    dims = (3, 4, 5)
    terms = []
    for _ in range(4):
        modes = sorted(rng.choice(3, size=rng.randint(1, 3), replace=False))
        facs = {int(d): rng.rand(dims[d], dims[d]) for d in modes}
        terms.append((float(rng.rand()), facs))
    terms.append((0.7, {}))  # pure identity term
    sop = SumOfProductOperator.from_terms(3, dims, terms)
    grp = GroupedSoPOperator.from_terms(3, dims, terms)
    truth = np.diag(np.asarray(grp.to_dense()))
    np.testing.assert_allclose(np.asarray(sop.diagonal()),
                               np.diag(np.asarray(sop.to_dense())), atol=1e-12)
    np.testing.assert_allclose(np.asarray(grp.diagonal()), truth, atol=1e-12)


def test_diagonal_padded():
    from eigensolvers_tpu.ops.operators import PaddedOperator
    A = _dd_matrix(10)
    pad = PaddedOperator(as_operator(A), 16)
    d = np.asarray(pad.diagonal())
    np.testing.assert_allclose(d[:10], np.diag(A))
    np.testing.assert_allclose(d[10:], 0.0)


# ---------------------------------------------------------------------------
# preconditioned solves: same answer, fewer iterations
# ---------------------------------------------------------------------------
def test_minres_jacobi_same_solution_fewer_iterations():
    n = 400
    A = _dd_matrix(n)
    op = as_operator(A)
    rng = np.random.RandomState(0)
    b = rng.rand(n)
    sigma = 40.0  # interior shift -> indefinite system
    plain = ls.minres(op, b, sigma, rtol=1e-8, maxiter=4000)
    prec = ls.minres(op, b, sigma, rtol=1e-8, maxiter=4000, precond="jacobi")
    x_ref = np.linalg.solve(sigma * np.eye(n) - A, b)
    assert bool(prec.converged)
    np.testing.assert_allclose(np.asarray(prec.x), x_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(plain.x), x_ref, atol=1e-5)
    assert int(prec.iterations) < int(plain.iterations), \
        (int(prec.iterations), int(plain.iterations))


def test_gmres_jacobi_complex_shift():
    n = 300
    A = _dd_matrix(n, seed=11)
    op = as_operator(A)
    rng = np.random.RandomState(1)
    b = rng.rand(n)
    z = 40.0 + 3.0j
    plain = ls.gmres(op, b, z, rtol=1e-8, maxiter=3000)
    prec = ls.gmres(op, b, z, rtol=1e-8, maxiter=3000, precond="jacobi")
    x_ref = np.linalg.solve(z * np.eye(n) - A, b)
    assert bool(prec.converged)
    np.testing.assert_allclose(np.asarray(prec.x), x_ref, atol=1e-5)
    assert int(prec.iterations) <= int(plain.iterations)


def test_batched_precond_matches_unbatched():
    n = 200
    A = _dd_matrix(n, seed=7)
    op = as_operator(A)
    rng = np.random.RandomState(2)
    B = rng.rand(3, n)
    sigmas = np.array([35.0, 40.0, 45.0])
    res = ls.minres_batch(op, B, sigmas, rtol=1e-8, maxiter=4000,
                          precond="jacobi")
    for k in range(3):
        x_ref = np.linalg.solve(sigmas[k] * np.eye(n) - A, B[k])
        np.testing.assert_allclose(np.asarray(res.x[k]), x_ref, atol=1e-5)


def test_unknown_preconditioner_raises():
    A = _dd_matrix(16)
    with pytest.raises(ValueError, match="preconditioner"):
        ls.minres(as_operator(A), np.ones(16), 5.0, precond="ilu")


# ---------------------------------------------------------------------------
# end-to-end: Lanczos with preconditioned inner solves
# ---------------------------------------------------------------------------
def test_lanczos_with_jacobi_preconditioner():
    n = 300
    A = _dd_matrix(n, seed=21)
    evE = np.linalg.eigvalsh(A)
    sigma = float(evE[n // 2] + 0.3 * (evE[n // 2 + 1] - evE[n // 2]))
    rng = np.random.RandomState(4)
    guess = rng.rand(n)
    opts = {"linearSystemArgs": {"linearSolver": "minres", "linearIter": 4000,
                                 "linear_tol": 1e-6, "linear_atol": 1e-6,
                                 "preconditioner": "jacobi"}}
    Y0 = [JaxVector(guess / np.linalg.norm(guess), opts)]
    ev, Y, status = inexactLanczosDiagonalization(
        A, Y0, sigma, 8, 6, 1e-9, writeOut=False)
    got = find_nearest(np.asarray(ev), sigma)[1]
    want = find_nearest(evE, sigma)[1]
    assert abs(got - want) < 1e-6 * max(1.0, abs(want))
    assert status["isConverged"]
