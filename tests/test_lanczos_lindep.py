"""Adversarial configs that force the linear-dependence failure paths.

Strategy parity: reference unittests/test_lanczosLINDEP.py — a large problem
near the spectrum edge with a loose inner tolerance engineered to hit linear
dependence (no mocks: real failure, SURVEY.md §4).  Contract asserted:
``status["lindep"]`` flagged; on a Gram-Schmidt abort the returned basis is
truncated; with an unreachable eConv, restarts are counted as futile.
"""

import numpy as np
import pytest
import scipy.linalg as la

from eigensolvers_tpu import JaxVector, inexactLanczosDiagonalization
from eigensolvers_tpu.solvers.lanczos import terminateRestart


@pytest.fixture(scope="module")
def problem():
    n = 600
    ev = np.linspace(1, 400, n)
    rng = np.random.RandomState(10)
    Q = la.qr(rng.rand(n, n))[0]
    A = Q.T @ np.diag(ev) @ Q
    options = {"linearSystemArgs": {
        "linearSolver": "gcrotmk", "linearIter": 500, "linear_tol": 1e-1,
        "errorOnNonConvergence": False}}
    Y0 = JaxVector(rng.rand(n), options)
    return A, Y0


def test_lindep_flag_and_truncation():
    """Deterministic lindep: starting from an exact eigenvector, the Krylov
    space of (sigma - H)^{-1} is one-dimensional — the first exact solve
    returns a parallel vector, so the very first Gram-Schmidt must detect
    linear dependence (before any convergence check can trigger)."""
    n = 32
    ev = np.linspace(1, 40, n)
    rng = np.random.RandomState(7)
    Q = la.qr(rng.rand(n, n))[0]
    A = Q.T @ np.diag(ev) @ Q
    evEigh, uvEigh = np.linalg.eigh(A)
    options = {"linearSystemArgs": {"linearSolver": "exact"}}
    Y0 = JaxVector(uvEigh[:, 16], options)   # exact interior eigenvector
    evL, uvL, status = inexactLanczosDiagonalization(
        A, Y0, sigma=evEigh[16] + 0.3, L=8, maxit=3, eConv=1e-18,
        writeOut=False, status={"writeOut": False})
    assert status["lindep"] is True
    # Gram-Schmidt abort on the FIRST step: degenerate input — the solver
    # returns the guess's Rayleigh-Ritz value (here: the exact eigenvalue)
    # with the basis truncated to the inner iteration count.
    np.testing.assert_allclose(evL[0], evEigh[16], atol=1e-10)
    assert len(uvL) == status["innerIter"]


class _LindepSolveVector(JaxVector):
    """Deterministic inexact backend for the futile-restart path: every odd
    solve returns the exact solution plus seeded counter-keyed noise (so the
    Ritz values jitter above the 1e-9 improvement threshold on each restart),
    and every even solve replays the previous result verbatim (parallel to
    the newest basis vector, so Gram-Schmidt hits lindep on the second inner
    iteration of every outer iteration)."""

    _ncall = 0
    _last = None

    @classmethod
    def solve(cls, H, b, sigma, x0=None, opType="her", reverseGF=False):
        cls._ncall += 1
        if cls._ncall % 2 == 0 and cls._last is not None:
            return cls(np.asarray(cls._last.array).copy(), b.options)
        x = JaxVector.solve.__func__(cls, H, b, sigma, x0=x0, opType=opType,
                                     reverseGF=reverseGF)
        noise = np.random.RandomState(cls._ncall).rand(len(x.array)) - 0.5
        arr = np.asarray(x.array) + 1e-2 * float(JaxVector.norm(x)) * noise
        out = cls(arr, b.options)
        cls._last = out
        return out


def test_futile_restarts():
    """With an unreachable eConv and a solver that deterministically produces
    linear dependence plus eigenvalue jitter, the restart loop must terminate
    through the futile-restart counter (>3 fruitless restarts), not spin to
    maxit (reference semantics: inexact_Lanczos.py:167-194)."""
    n = 64
    ev = np.linspace(1, 80, n)
    rng = np.random.RandomState(3)
    Q = la.qr(rng.rand(n, n))[0]
    A = Q.T @ np.diag(ev) @ Q
    _LindepSolveVector._ncall = 0
    _LindepSolveVector._last = None
    Y0 = _LindepSolveVector(
        rng.rand(n), {"linearSystemArgs": {"linearSolver": "exact"}})
    with pytest.warns(UserWarning):
        status = inexactLanczosDiagonalization(
            A, Y0, sigma=40.3, L=8, maxit=1000, eConv=1e-18,
            writeOut=False, status={"writeOut": False})[2]
    assert status["lindep"] is True
    assert status["futileRestarts"] > 3
    assert status["outerIter"] < 999


@pytest.mark.slow
def test_lindep_integration_large(problem):
    """Reference-parity adversarial config (unittests/test_lanczosLINDEP.py):
    large problem near the spectrum edge with a loose inner tolerance; the
    run must flag lindep or terminate early through restarts."""
    A, Y0 = problem
    status = inexactLanczosDiagonalization(
        A, Y0, sigma=390, L=100, maxit=50, eConv=1e-18,
        writeOut=False, status={"writeOut": False})[2]
    assert status["lindep"] or status["outerIter"] == 49


def test_terminate_restart_unit():
    """Unit-level contract of the futile-restart counter
    (improvement threshold max(1e-9, eConv), limit 3)."""
    status = {"lindep": True, "futileRestarts": 0,
              "ref": [np.array([1.0, 2.0])]}
    # residual > threshold → one futile restart counted
    assert terminateRestart(np.array([1.1, 2.1]), 1e-6, status) is False
    assert status["futileRestarts"] == 1
    status["futileRestarts"] = 4
    with pytest.warns(UserWarning):
        assert terminateRestart(np.array([1.1, 2.1]), 1e-6, status) is True
    # no lindep → no counting
    status2 = {"lindep": False, "futileRestarts": 0,
               "ref": [np.array([1.0, 2.0])]}
    terminateRestart(np.array([5.0, 6.0]), 1e-6, status2)
    assert status2["futileRestarts"] == 0
