"""Spectrum slicing: KPM counts, load-balanced windows, full-interval sweep.

Oracle style follows the reference suite: known-spectrum synthetic matrices
(reference: unittests/test_feast.py:14-50) so exact counts/eigenvalues are
available.
"""

import numpy as np
import pytest

from eigensolvers_tpu.models.synthetic import known_spectrum_matrix
from eigensolvers_tpu.solvers.slicing import (
    chebyshev_moments,
    partition_windows,
    spectrumSlicingDiagonalization,
    window_count_from_moments,
)


@pytest.fixture(scope="module")
def problem():
    n = 240
    H, ev = known_spectrum_matrix(n, eigenvalues=np.linspace(1, 2 * n, n),
                                  seed=10)
    return np.asarray(H), np.asarray(ev), n


@pytest.fixture(scope="module")
def moments(problem):
    H, ev, n = problem
    mu, (a, b) = chebyshev_moments(H, n, degree=400, nProbes=12, seed=3,
                                   dtype=np.float64)
    return mu, a, b


def test_bounds_enclose_spectrum(problem, moments):
    H, ev, n = problem
    _, a, b = moments
    assert a <= ev[0] and b >= ev[-1]


def test_kpm_window_counts(problem, moments):
    """KPM count estimates track exact counts within stochastic error."""
    H, ev, n = problem
    mu, a, b = moments
    for lo, hi in [(100.0, 200.0), (30.0, 90.0), (350.0, 470.0)]:
        exact = int(np.sum((ev >= lo) & (ev <= hi)))
        est = window_count_from_moments(mu, a, b, lo, hi, n)
        # uniform spectrum, 12 probes, degree 400: few-percent accuracy
        assert abs(est - exact) <= max(3.0, 0.15 * exact), \
            f"[{lo},{hi}]: est {est:.1f} vs exact {exact}"


def test_partition_balances_counts(problem, moments):
    H, ev, n = problem
    mu, a, b = moments
    eMin, eMax, W = 50.0, 430.0, 4
    bnds = partition_windows(mu, a, b, eMin, eMax, W, n)
    assert len(bnds) == W + 1
    assert bnds[0] == eMin and bnds[-1] == eMax
    assert np.all(np.diff(bnds) > 0)
    counts = [int(np.sum((ev >= bnds[i]) & (ev < bnds[i + 1])))
              for i in range(W)]
    # ~equal by construction (uniform density here): within 35% of the mean
    mean = np.mean(counts)
    assert all(abs(c - mean) <= max(2.0, 0.35 * mean) for c in counts), counts


def test_full_sweep_finds_every_eigenvalue_once(problem):
    """3-window slicing over a 24-eigenvalue interval: every eigenvalue
    found exactly once, at FEAST accuracy (reference per-ev gate 1e-4,
    unittests/test_feast.py:113-119)."""
    H, ev, n = problem
    eMin, eMax = 160.25, 208.25   # boundaries fall between spectrum points
    exact = ev[(ev >= eMin) & (ev <= eMax)]
    assert len(exact) == 24

    ev_s, vec_s, st = spectrumSlicingDiagonalization(
        H, eMin, eMax, nWindows=3, nc=8, eConv=1e-8, maxit=12,
        degree=400, nProbes=12, seed=5)
    assert st["isConverged"]
    assert st["found_total"] == len(exact), \
        (st["found_total"], len(exact), [w["found"] for w in st["windows"]])
    assert np.allclose(ev_s, exact, atol=1e-4)
    # no duplicates across window boundaries
    assert np.all(np.diff(ev_s) > 1e-6)
    # polish: every merged eigenpair at true vector-residual quality
    # (raw FEAST vectors stall ~1e-2 at contour edges; see _polish_pairs)
    assert st["residuals"] is not None
    assert st["residuals"].max() < 1e-5, st["residuals"].max()
    for i in [0, len(ev_s) // 2, len(ev_s) - 1]:
        x = np.asarray(vec_s[i].array, np.float64).ravel()
        r = np.linalg.norm(H @ x - ev_s[i] * x)
        assert r < 1e-5, f"residual {r:.2e} at {ev_s[i]}"


def test_explicit_windows_and_status(problem):
    H, ev, n = problem
    eMin, eMax = 100.5, 140.5
    exact = ev[(ev >= eMin) & (ev <= eMax)]
    ev_s, _, st = spectrumSlicingDiagonalization(
        H, eMin, eMax, windows=[eMin, 120.5, eMax], nc=8, eConv=1e-8,
        maxit=10, degree=400, nProbes=12, seed=7)
    assert st["found_total"] == len(exact)
    assert len(st["windows"]) == 2
    assert np.allclose(ev_s, exact, atol=1e-4)
    assert st["estimated_total"] == pytest.approx(len(exact), rel=0.3)


def test_sharded_slicing_matches_dense():
    """The whole slicing sweep mesh-parallel (vector_cls=ShardedVector over
    the 8-device CPU mesh) reproduces the dense-backend eigenvalues — the
    multi-device capability the reference never had (SURVEY.md §2.4)."""
    import jax

    from eigensolvers_tpu.parallel import (ShardedVector, make_mesh,
                                           shard_operator)

    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    n = 240
    H, ev = known_spectrum_matrix(n, eigenvalues=np.linspace(1, 2 * n, n),
                                  seed=10)
    H = np.asarray(H)
    eMin, eMax = 100.5, 140.5
    exact = ev[(ev >= eMin) & (ev <= eMax)]

    mesh = make_mesh(batch=1, shard=8)
    ShardedVector.set_default_mesh(mesh)
    try:
        Hsh = shard_operator(H, mesh)
        ev_s, vec_s, st = spectrumSlicingDiagonalization(
            Hsh, eMin, eMax, nWindows=2, nc=8, eConv=1e-8, maxit=12,
            degree=300, nProbes=8, seed=7, vector_cls=ShardedVector)
    finally:
        ShardedVector.set_default_mesh(None)
    assert st["found_total"] == len(exact), \
        (st["found_total"], len(exact))
    assert np.allclose(ev_s, exact, atol=1e-6)
    assert st["residuals"].max() < 1e-5
    assert isinstance(vec_s[0], ShardedVector)


def test_spectral_density_cdf(problem, moments):
    """KPM cumulative density: monotone, ~0 at the bottom, ~n at the top."""
    from eigensolvers_tpu.solvers.slicing import estimate_spectral_density

    H, ev, n = problem
    mu, a, b = moments
    xs, cdf = estimate_spectral_density(mu, a, b, n, nGrid=100)
    assert xs.shape == cdf.shape == (100,)
    assert np.all(np.diff(cdf) >= 0)
    assert cdf[0] < 0.05 * n
    assert abs(cdf[-1] - n) < 0.05 * n
    # mid-spectrum: CDF tracks the exact counting function
    mid = n // 2
    x_mid = ev[mid]
    k = int(np.searchsorted(xs, x_mid))
    if 0 < k < len(xs):
        assert abs(cdf[k] - mid) < 0.08 * n
