"""Utility-layer contracts: quadrature rules, units, residuals, selection,
reporting sentinels."""

import os

import numpy as np
import pytest

from eigensolvers_tpu import (
    JaxVector,
    eigenvalueResidual,
    find_nearest,
    calculateTarget,
    inexactLanczosDiagonalization,
    lowdinOrtho,
    quadraturePointsWeights,
    select_within_range,
)
from eigensolvers_tpu.models.synthetic import known_spectrum_matrix
from eigensolvers_tpu.utils.units import au2unit, unit2au


def test_legendre_quadrature():
    gk, wk = quadraturePointsWeights(8, "legendre", positiveHalf=False)
    assert len(gk) == 8
    np.testing.assert_allclose(np.sum(wk), 2.0, atol=1e-12)
    # integrates cubics exactly
    np.testing.assert_allclose(np.sum(wk * gk ** 3), 0.0, atol=1e-12)
    gp, wp = quadraturePointsWeights(8, "legendre", positiveHalf=True)
    assert len(gp) == 4 and np.all(gp > 0)


def test_trapezoidal_quadrature_correct():
    """The reference's trapezoidal rule is off-by-one in points and weights
    (reference: util_funcs.py:14-27); ours must integrate constants and
    linears exactly on [-1, 1]."""
    gk, wk = quadraturePointsWeights(9, "trapezoidal", positiveHalf=False)
    np.testing.assert_allclose(np.sum(wk), 2.0, atol=1e-12)
    np.testing.assert_allclose(np.sum(wk * gk), 0.0, atol=1e-12)
    assert gk[0] == -1.0 and gk[-1] == 1.0


def test_hermite_quadrature():
    gk, wk = quadraturePointsWeights(6, "hermite", positiveHalf=False)
    np.testing.assert_allclose(np.sum(wk), np.sqrt(np.pi), rtol=1e-12)


def test_units_roundtrip():
    for unit in ("cm-1", "ev", "kcal/mol", "au"):
        x = 0.123
        np.testing.assert_allclose(unit2au(au2unit(x, unit), unit), x,
                                   rtol=1e-12)
    np.testing.assert_allclose(au2unit(1.0, "cm-1"), 219474.6313632)
    with pytest.raises(ValueError):
        au2unit(1.0, "furlongs")


def test_eigenvalue_residual_range_filter():
    ev = np.array([1.0, 5.0, 9.0])
    ref = np.array([1.1, 5.0, 9.5])
    full = eigenvalueResidual(ev, ref)
    windowed = eigenvalueResidual(ev, ref, [4.0, 6.0])
    assert windowed == 0.0
    assert full > 0


def test_lowdin_drops_dependent_directions():
    v = np.random.RandomState(0).rand(5)
    S = np.outer(v, v) + 1e-3 * np.eye(5)   # near rank-1
    idx, info, X = lowdinOrtho(S, tol=1e-2)
    assert not info
    assert X.shape[1] < 5
    np.testing.assert_allclose(X.conj().T @ S @ X, np.eye(X.shape[1]),
                               atol=1e-10)


def test_selection_helpers():
    arr = np.array([3.0, 1.0, 7.0, 5.0])
    vals, idx = select_within_range(arr, 2.0, 6.0)
    np.testing.assert_array_equal(vals, [3.0, 5.0])
    assert idx == [0, 3]
    assert find_nearest(arr, 4.9) == (3, 5.0)
    ev = np.linspace(0, 10, 11)
    t = calculateTarget(ev, 5)
    assert 5.0 < t < 5.5


def test_report_files_and_sentinels(tmp_path):
    """Two-file reporting contract: startingPoint/endingPoint sentinels and
    fixed-width summary rows (reference printUtils format family)."""
    n = 60
    H, ev = known_spectrum_matrix(n, eigenvalues=np.linspace(1, 100, n),
                                  seed=2)
    rng = np.random.RandomState(0)
    Y0 = JaxVector(rng.rand(n), {"linearSystemArgs": {
        "errorOnNonConvergence": False}})
    outf = str(tmp_path / "it.out")
    sumf = str(tmp_path / "sum.out")
    inexactLanczosDiagonalization(H, Y0, 30.0, 5, 2, 1e-6, writeOut=True,
                                  outFileName=outf, summaryFileName=sumf)
    assert os.path.exists(outf) and os.path.exists(sumf)
    summary = open(sumf).read()
    assert summary.startswith("startingPoint")
    assert "endingPoint" in summary
    assert "EvalueBlock1" in summary
    detail = open(outf).read()
    assert "OVERLAP MATRIX" in detail
    assert "overlap condition number" in detail
    assert "FINAL RESULTS" in detail


def test_orthogonalize_set_contract():
    """Whole-set orthogonalize (reference: abstractVector.py:112,
    util_funcs.py:170-194): orthonormal output, dependent directions
    dropped, span preserved — on the dense JAX and numpy backends."""
    from eigensolvers_tpu import JaxVector
    from eigensolvers_tpu.vectors.numpy_backend import NumpyVector
    rng = np.random.RandomState(42)
    n, m = 60, 4
    G = rng.rand(n, m)
    for cls in (JaxVector, NumpyVector):
        xs = [cls(G[:, i]) for i in range(m)]
        out = cls.orthogonalize(xs)
        assert len(out) == m
        V = np.stack([np.asarray(v.array).ravel() for v in out])
        np.testing.assert_allclose(V.conj() @ V.T, np.eye(m), atol=1e-12)
        # span preserved: projector onto out equals projector onto G
        Q, _ = np.linalg.qr(G)
        np.testing.assert_allclose(V @ Q @ Q.T @ V.T if False else
                                   np.linalg.norm(V - V @ Q @ Q.T), 0.0,
                                   atol=1e-10)
        # a dependent vector gets dropped
        xs_dep = xs + [cls(G[:, 0] + G[:, 1])]
        out2 = cls.orthogonalize(xs_dep)
        assert len(out2) == m


def test_orthogonalize_set_mps():
    from eigensolvers_tpu.vectors.mps import MPSVector
    rng = np.random.RandomState(0)
    dims = (4, 4, 4)
    opts = {"compressArgs": {"maxD": 32, "eps": 0.0}}
    vs = [MPSVector.from_dense(rng.rand(*dims), dims, opts) for _ in range(3)]
    out = MPSVector.orthogonalize(vs)
    assert len(out) == 3
    S = MPSVector.overlapMatrix(out)
    np.testing.assert_allclose(S, np.eye(3), atol=1e-10)
    # exact duplicate dropped
    out2 = MPSVector.orthogonalize(vs + [vs[0].copy()])
    assert len(out2) == 3
