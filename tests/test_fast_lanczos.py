"""Fused low-latency Lanczos driver (the bench path) vs the general driver.

The fused driver runs each Krylov iteration as one device program
(solvers/step.py) and must reproduce the general driver's eigenpairs under
the same convergence contract (same eConv / zero-vector / lindep semantics,
SURVEY.md §7).
"""

import numpy as np
import scipy.linalg as la

from eigensolvers_tpu import (JaxVector, inexactLanczosDiagonalization,
                              find_nearest)
from eigensolvers_tpu.solvers.fast_lanczos import fastLanczosDiagonalization


def _problem(n=100, seed=1212, lam=(1, 200)):
    ev = np.linspace(*lam, n)
    rng = np.random.RandomState(seed)
    Q = la.qr(rng.rand(n, n))[0]
    A = Q.T @ np.diag(ev) @ Q
    return A, ev, rng


OPTS = {"linearSystemArgs": {"linearSolver": "gmres", "linearIter": 2000,
                             "linear_tol": 1e-5, "linear_atol": 1e-5,
                             "errorOnNonConvergence": False}}


def test_fast_matches_general_single_vector():
    A, evE, rng = _problem()
    sigma = 30.0
    guess = rng.rand(100)
    Y0 = [JaxVector(guess / np.linalg.norm(guess), OPTS)]
    evG, YG, stG = inexactLanczosDiagonalization(
        A, list(Y0), sigma, 6, 4, 1e-8, writeOut=False)
    Y0 = [JaxVector(guess / np.linalg.norm(guess), OPTS)]
    evF, YF, stF = fastLanczosDiagonalization(A, Y0, sigma, 6, 4, 1e-8)
    want = find_nearest(evE, sigma)[1]
    assert abs(find_nearest(np.asarray(evF), sigma)[1] - want) < 1e-4
    assert abs(find_nearest(np.asarray(evG), sigma)[1] -
               find_nearest(np.asarray(evF), sigma)[1]) < 1e-6
    assert stF["isConverged"]
    # returned Ritz vector matches the exact eigenvector up to phase
    evals, uv = np.linalg.eigh(A)
    vex = uv[:, np.argmin(np.abs(evals - sigma))]
    vf = np.asarray(YF[0].array)
    assert abs(abs(vex @ vf) - 1.0) < 1e-4


def test_fast_block_degenerate():
    n = 100
    ev = np.linspace(1, 200, n)
    ev[5:8] = ev[5]  # 3-fold cluster (reference: unittests/test_lanczosBlock.py:17-19)
    rng = np.random.RandomState(4)
    Q = la.qr(rng.rand(n, n))[0]
    A = Q.T @ np.diag(ev) @ Q
    sigma = float(ev[5]) + 1.5  # off-cluster shift, as the reference test
    G = la.qr(rng.rand(n, 3), mode="economic")[0]
    Y0 = [JaxVector(G[:, i], OPTS) for i in range(3)]
    evF, YF, stF = fastLanczosDiagonalization(A, Y0, sigma, 5, 6, 1e-7)
    got = np.sort(np.asarray(evF)[np.argsort(np.abs(np.asarray(evF) - sigma))[:3]])
    np.testing.assert_allclose(got, ev[5:8], rtol=1e-5)


def test_fast_restart_path():
    """Force restarts (L too small to converge in one sweep) — the restart
    branch must keep the subspace consistent."""
    A, evE, rng = _problem(n=300, seed=9, lam=(1, 600))
    sigma = 90.0
    guess = rng.rand(300)
    Y0 = [JaxVector(guess / np.linalg.norm(guess), OPTS)]
    evF, YF, stF = fastLanczosDiagonalization(A, Y0, sigma, 4, 12, 1e-9)
    want = find_nearest(evE, sigma)[1]
    assert abs(find_nearest(np.asarray(evF), sigma)[1] - want) < 1e-5
    assert stF["outerIter"] >= 1  # at least one restart happened


def test_fast_preconditioned_matches_general():
    """Jacobi-preconditioned fused path: same convergence contract and
    eigenvalue as the general driver with the same options (VERDICT r1
    item 5)."""
    A, evE, rng = _problem(n=150, seed=6, lam=(1, 300))
    sigma = 45.0
    opts = {"linearSystemArgs": {"linearSolver": "minres", "linearIter": 4000,
                                 "linear_tol": 1e-6,
                                 "preconditioner": "jacobi",
                                 "errorOnNonConvergence": False}}
    guess = rng.rand(150)
    g = guess / np.linalg.norm(guess)
    evG, _, stG = inexactLanczosDiagonalization(
        A, [JaxVector(g, opts)], sigma, 6, 4, 1e-8, writeOut=False)
    evF, _, stF = fastLanczosDiagonalization(
        A, [JaxVector(g, opts)], sigma, 6, 4, 1e-8)
    assert stF["isConverged"] and stG["isConverged"]
    assert abs(find_nearest(np.asarray(evF), sigma)[1] -
               find_nearest(np.asarray(evG), sigma)[1]) < 1e-7
    assert abs(find_nearest(np.asarray(evF), sigma)[1] -
               find_nearest(evE, sigma)[1]) < 1e-4


def test_fast_complex_shift_matches_general():
    """Complex shift through the fused GMRES kernel: the Krylov space of
    (sigma - H)^{-1} with Im(sigma) != 0 is complex, but the Hermitian Ritz
    values must match the general driver and converge to the same
    eigenvalue near Re(sigma)."""
    A, evE, rng = _problem(n=100, seed=3)
    sigma = 30.0 + 0.75j
    opts = {"linearSystemArgs": {"linearSolver": "gmres", "linearIter": 4000,
                                 "gmresRestart": 60, "linear_tol": 1e-7,
                                 "splitComplex": False,
                                 "errorOnNonConvergence": False}}
    guess = rng.rand(100)
    g = guess / np.linalg.norm(guess)
    evG, _, stG = inexactLanczosDiagonalization(
        A, [JaxVector(g, opts)], sigma, 6, 4, 1e-8, writeOut=False)
    evF, _, stF = fastLanczosDiagonalization(
        A, [JaxVector(g, opts)], sigma, 6, 4, 1e-8)
    want = find_nearest(evE, sigma.real)[1]
    gotF = find_nearest(np.real(np.asarray(evF)), sigma.real)[1]
    gotG = find_nearest(np.real(np.asarray(evG)), sigma.real)[1]
    assert abs(gotF - want) < 1e-4, (gotF, want)
    assert abs(gotF - gotG) < 1e-6
    assert stF["isConverged"]


def test_fast_reporting_and_checkpoint(tmp_path):
    """Reporter and checkpoint hooks on the fused driver: two-file output
    with sentinels, and resumable per-iteration checkpoints."""
    import os
    from eigensolvers_tpu.utils import checkpointing
    A, evE, rng = _problem()
    guess = rng.rand(100)
    g = guess / np.linalg.norm(guess)
    out = str(tmp_path / "iterations_fast.out")
    summ = str(tmp_path / "summary_fast.out")
    ckdir = str(tmp_path / "ck")
    evF, YF, stF = fastLanczosDiagonalization(
        A, [JaxVector(g, OPTS)], 30.0, 6, 4, 1e-8,
        writeOut=True, outFileName=out, summaryFileName=summ,
        saveEachIteration=True, saveDir=ckdir)
    assert os.path.exists(out) and os.path.exists(summ)
    stxt = open(summ).read()
    assert "startingPoint" in stxt and "endingPoint" in stxt
    itxt = open(out).read()
    assert "OVERLAP MATRIX" in itxt and "FINAL RESULTS" in itxt
    tag = checkpointing.latest_tag(ckdir)
    assert tag is not None
    vecs, meta = checkpointing.load_checkpoint(ckdir, tag, JaxVector)
    assert len(vecs) >= 2  # the basis had grown past the guess
    assert "eigenvalues" in meta
    assert meta["status"]["cumIter"] == tag


def test_fast_state_following_maxovlp():
    """maxOvlp pick on the fused path: track a TARGETED eigenvector past a
    nearer-to-sigma root (reference: unittests/test_stateFollowingHO.py
    strategy), using the lazy basis-row proxies."""
    from eigensolvers_tpu import get_pick_function_maxOvlp
    A, evE, rng = _problem(n=120, seed=2, lam=(1, 240))
    evals, uv = np.linalg.eigh(A)
    sigma = 50.0
    order = np.argsort(np.abs(evals - sigma))
    target = order[1]  # second-nearest: following must beat proximity
    ref = JaxVector(uv[:, target])
    pick = get_pick_function_maxOvlp(ref)
    guess = uv[:, target] + 0.05 * rng.rand(120)
    Y0 = [JaxVector(guess / np.linalg.norm(guess), OPTS)]
    evF, YF, stF = fastLanczosDiagonalization(A, Y0, sigma, 8, 6, 1e-9,
                                              pick=pick)
    got = float(np.asarray(evF)[0])
    assert abs(got - evals[target]) < 1e-4 * max(1.0, abs(evals[target]))
    v = np.asarray(YF[0].array)
    assert abs(abs(uv[:, target] @ v) - 1.0) < 1e-3
