"""Chebyshev-filtered subspace iteration: the solve-free window eigensolver
(framework extension; the reference has only solve-based algorithms).

Oracle strategy follows the FEAST tests: known-spectrum synthetic matrix,
window with a known eigenvalue count, exact eigh truth.
"""

import numpy as np
import pytest
import scipy.linalg as la

from eigensolvers_tpu import (
    JaxVector,
    chebyshevFilteredDiagonalization,
    find_nearest,
    select_within_range,
)
from eigensolvers_tpu.solvers.chebyshev import (
    chebyshev_window_coefficients,
    estimate_spectral_bounds,
)


@pytest.fixture(scope="module")
def problem():
    n = 100
    ev = np.linspace(1, 200, n)
    rng = np.random.RandomState(10)
    Q = la.qr(rng.rand(n, n))[0]
    A = Q.T @ np.diag(ev) @ Q
    evE, uvE = np.linalg.eigh(A)
    return dict(A=A, ev=ev, evE=evE, uvE=uvE, rmin=160.0, rmax=166.0)


def test_window_coefficients_reproduce_indicator():
    """The damped expansion evaluated by Clenshaw must approximate the
    indicator: ~1 inside the window, ~0 far outside, monotone shoulders."""
    a, b, lo, hi = -1.2, 1.2, 0.1, 0.4
    c = chebyshev_window_coefficients(400, a, b, lo, hi, jackson=True)
    xs = np.linspace(a + 1e-3, b - 1e-3, 2001)
    t = (2 * xs - (a + b)) / (b - a)
    # Clenshaw evaluation of sum c_k T_k(t)
    bk1 = np.zeros_like(t)
    bk2 = np.zeros_like(t)
    for ck in c[:0:-1]:
        bk1, bk2 = 2 * t * bk1 - bk2 + ck, bk1
    p = t * bk1 - bk2 + c[0]
    inside = (xs > lo + 0.02) & (xs < hi - 0.02)
    far = (xs < lo - 0.05) | (xs > hi + 0.05)
    assert np.all(np.abs(p[inside] - 1.0) < 0.05)
    assert np.all(np.abs(p[far]) < 0.05)
    assert np.all(p > -1e-3)        # Jackson damping: no negative lobes


def test_spectral_bounds_enclose(problem):
    from eigensolvers_tpu import as_operator
    a, b = estimate_spectral_bounds(as_operator(problem["A"]), 100)
    assert a <= problem["evE"][0] and b >= problem["evE"][-1]


def test_chebyshev_window_eigenpairs(problem):
    p = problem
    m0 = 6
    Yg = la.qr(np.random.RandomState(3).rand(100, m0), mode="economic")[0]
    Y = [JaxVector(Yg[:, i], {}) for i in range(m0)]
    ev, uv, status = chebyshevFilteredDiagonalization(
        p["A"], Y, 150, p["rmin"], p["rmax"], 1e-10, 40, writeOut=False)

    assert status["isConverged"]
    true_in = select_within_range(p["ev"], p["rmin"], p["rmax"])[0]
    assert len(true_in) == 3
    for target in true_in:
        assert abs(find_nearest(ev, target)[1] - target) <= 1e-8
    for target in true_in:
        iE = find_nearest(p["evE"], target)[0]
        iC = find_nearest(ev, target)[0]
        v = np.asarray(uv[iC].array).ravel()
        v = v / np.linalg.norm(v)
        assert abs(np.vdot(v, p["uvE"][:, iE])) > 0.9999


def test_chebyshev_matches_feast(problem):
    """Drop-in equivalence with FEAST on the same window/guesses."""
    from eigensolvers_tpu import feastDiagonalization
    p = problem
    m0 = 6
    Yg = la.qr(np.random.RandomState(4).rand(100, m0), mode="economic")[0]
    opts = {"linearSystemArgs": {"linearSolver": "minres", "linearIter": 2000,
                                 "linear_tol": 1e-8,
                                 "errorOnNonConvergence": False}}
    Yc = [JaxVector(Yg[:, i], {}) for i in range(m0)]
    Yf = [JaxVector(Yg[:, i], opts) for i in range(m0)]
    evC, _, _ = chebyshevFilteredDiagonalization(
        p["A"], Yc, 150, p["rmin"], p["rmax"], 1e-10, 40, writeOut=False)
    evF, _, _ = feastDiagonalization(
        p["A"], Yf, 8, "legendre", p["rmin"], p["rmax"], 1e-10, 20,
        writeOut=False)
    true_in = select_within_range(p["ev"], p["rmin"], p["rmax"])[0]
    for target in true_in:
        assert abs(find_nearest(evC, target)[1]
                   - find_nearest(evF, target)[1]) < 1e-6


def test_chebyshev_sharded(problem):
    """1-vs-8-device equivalence on the virtual mesh: the stacked filter
    recurrence runs under GSPMD with the state dimension sharded."""
    from eigensolvers_tpu.parallel import ShardedVector, make_mesh
    p = problem
    m0 = 6
    Yg = la.qr(np.random.RandomState(5).rand(100, m0), mode="economic")[0]
    mesh = make_mesh(shard=8)
    # n=100 is NOT divisible by 8: exercises the transparent padding path
    Y = [ShardedVector(Yg[:, i], {}, mesh=mesh) for i in range(m0)]
    ev, uv, status = chebyshevFilteredDiagonalization(
        p["A"], Y, 150, p["rmin"], p["rmax"], 1e-10, 40, writeOut=False)
    assert status["isConverged"]
    true_in = select_within_range(p["ev"], p["rmin"], p["rmax"])[0]
    for target in true_in:
        assert abs(find_nearest(ev, target)[1] - target) <= 1e-8
    assert isinstance(uv[0], ShardedVector)


def test_compressed_backend_rejected():
    from eigensolvers_tpu.vectors.mps import MPSVector
    v = MPSVector.random([2, 2, 2], maxD=2, seed=0)
    with pytest.raises(TypeError, match="array-backed"):
        chebyshevFilteredDiagonalization(None, [v], 10, 0.0, 1.0, 1e-6, 1)


def test_bad_window_rejected():
    with pytest.raises(ValueError, match="inside"):
        chebyshev_window_coefficients(50, 0.0, 1.0, 0.5, 1.5)


def test_fused_path_status_certificate(problem):
    """The fused (writeOut=False) path must return per-state vector
    residual certificates and a resolved adaptive degree in status."""
    import scipy.linalg as la
    from eigensolvers_tpu import (JaxVector, as_operator,
                                  chebyshevFilteredDiagonalization,
                                  select_within_range)

    H, ev = problem["A"], problem["ev"]
    eMin, eMax = problem["rmin"], problem["rmax"]
    m0 = 8
    truth = select_within_range(np.asarray(ev), eMin, eMax)[0]
    rng = np.random.RandomState(3)
    Yg = la.qr(rng.rand(H.shape[0], m0), mode="economic")[0]
    Y = [JaxVector(Yg[:, i].astype(np.float32), {}) for i in range(m0)]
    evC, vecs, st = chebyshevFilteredDiagonalization(
        as_operator(np.asarray(H).astype(np.float32)), Y, None, eMin, eMax,
        1e-6, 30, writeOut=False)
    assert st["degree"] > 0
    vres = np.asarray(st["vecResiduals"])
    assert vres.shape == (m0,)
    got = np.asarray(evC)
    in_win = (got >= eMin) & (got <= eMax)
    assert in_win.sum() >= len(truth)
    # in-window states carry small certified residuals
    assert float(vres[in_win].max()) < 1e-2 * max(abs(eMin), abs(eMax))
