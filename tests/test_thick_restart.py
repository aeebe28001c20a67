"""Thick restart (VERDICT r3 item 8; the reference's own TODO at
inexact_Lanczos.py:392 "could be improved to thick restart"): restarting
with the tracked Ritz vectors PLUS retained extra Ritz columns, S/H
recomputed exactly on the kept set.  Contract: restart-count reduction on a
converging interior config at unchanged accuracy, reference semantics
recoverable via thickRestart=False, and the lindep failure contract
(flags, futile counting) untouched."""

import numpy as np
import pytest
import scipy.linalg as la

from eigensolvers_tpu import JaxVector, inexactLanczosDiagonalization
from eigensolvers_tpu.models.synthetic import known_spectrum_matrix


def _run(thick, n=400, L=3, maxit=30, eConv=1e-9, sigma=190.3, seed=5):
    H, ev = known_spectrum_matrix(n, eigenvalues=np.linspace(1, 400, n),
                                  seed=seed)
    rng = np.random.RandomState(3)
    Y0 = JaxVector(rng.rand(n), {"linearSystemArgs": {
        "linearSolver": "minres", "linearIter": 3000, "linear_tol": 1e-5,
        "errorOnNonConvergence": False}})
    evL, uvL, st = inexactLanczosDiagonalization(
        np.asarray(H), Y0, sigma, L=L, maxit=maxit, eConv=eConv,
        writeOut=False, thickRestart=thick)
    lam = np.asarray(ev)
    truth = lam[np.argmin(np.abs(lam - sigma))]
    near = np.asarray(evL)[np.argmin(np.abs(np.asarray(evL) - sigma))]
    return st, abs(float(near) - float(truth))


def test_thick_restart_reduces_restart_count():
    """Small-L interior config forced through restarts: top-k retention
    must converge with strictly fewer restarts than the nBlock-only
    restart, at comparable accuracy (measured: 3 -> 2 restarts,
    7 -> 6 cumulative iterations)."""
    st_simple, err_simple = _run(thick=False)
    st_thick, err_thick = _run(thick=True)
    assert st_simple["isConverged"] and st_thick["isConverged"]
    assert st_thick["restarts"] < st_simple["restarts"], \
        (st_thick["restarts"], st_simple["restarts"])
    assert st_thick["cumIter"] <= st_simple["cumIter"]
    # accuracy comparable: both bounded by the inexact-solve floor
    assert err_thick < 1e-6 and err_simple < 1e-6


def test_thick_restart_false_recovers_reference_semantics():
    """thickRestart=False restarts with nBlock vectors only (the restart
    basis never exceeds nBlock between cycles)."""
    st, err = _run(thick=False)
    assert st["restarts"] > 0 and st["isConverged"]


def test_thick_restart_keeps_lindep_contract():
    """The lindep failure contract (flag + futile counting + early
    termination) is unchanged under thick restart (adversarial config:
    loose solves, near-edge sigma, small L, unreachable eConv)."""
    n = 600
    ev = np.linspace(1, 400, n)
    rng = np.random.RandomState(10)
    Q = la.qr(rng.rand(n, n))[0]
    A = Q.T @ np.diag(ev) @ Q
    Y0 = JaxVector(np.random.RandomState(11).rand(n), {"linearSystemArgs": {
        "linearSolver": "gcrotmk", "linearIter": 300, "linear_tol": 1e-1,
        "errorOnNonConvergence": False}})
    with pytest.warns(UserWarning):
        st = inexactLanczosDiagonalization(
            A, Y0, sigma=390, L=8, maxit=60, eConv=1e-18, writeOut=False,
            thickRestart=True)[2]
    assert st["lindep"] is True
    assert st["futileRestarts"] > 3      # terminated via the futile counter
    assert st["outerIter"] < 59          # ... not by running to maxit
