"""Fused single-program FEAST iterations (solvers/fast_feast.py).

The fused loop must (a) actually engage for eligible configs, (b) produce
the same answers as the generic batched path — it is a dispatch-count
optimization, not an algorithm change — and (c) stay out of the way for
backends/configs it does not cover.
"""

import numpy as np
import pytest
import scipy.linalg as la

from eigensolvers_tpu import (JaxVector, as_operator, feastDiagonalization,
                              select_within_range)
from eigensolvers_tpu.models.synthetic import known_spectrum_matrix
import eigensolvers_tpu.solvers.feast as feast_mod


N = 400
EMIN, EMAX = 200.25, 204.75
M0, NC = 8, 8


@pytest.fixture(scope="module")
def problem():
    H, ev = known_spectrum_matrix(N, eigenvalues=np.linspace(1.0, 400.0, N),
                                  seed=10)
    rng = np.random.RandomState(3)
    Yg = la.qr(rng.rand(N, M0), mode="economic")[0]
    truth = select_within_range(ev, EMIN, EMAX)[0]
    return np.asarray(H), Yg, truth


def _run(H, Yg, batch, warm, spy_calls=None, ls_extra=None):
    ls = {"linearSolver": "minres", "linearIter": 4000, "linear_tol": 1e-8,
          "errorOnNonConvergence": False}
    ls.update(ls_extra or {})
    Y = [JaxVector(Yg[:, i], {"linearSystemArgs": dict(ls)})
         for i in range(M0)]
    return feastDiagonalization(as_operator(H), Y, NC, "legendre",
                                EMIN, EMAX, 1e-9, 10, writeOut=False,
                                batchQuadratureSolves=batch,
                                warmStartSolves=warm)


@pytest.mark.slow
def test_fused_engages_and_matches_generic(problem, monkeypatch):
    H, Yg, truth = problem
    calls = {"n": 0}
    orig = feast_mod._feast_loop_fused

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(feast_mod, "_feast_loop_fused", spy)

    evF, YF, stF = _run(H, Yg, batch=True, warm=False)
    assert calls["n"] == 1, "fused loop did not engage for an eligible config"

    evG, YG, stG = _run(H, Yg, batch=False, warm=False)
    # identical algorithm, same solves: eigenvalues agree far below eConv
    gotF = np.sort(select_within_range(np.asarray(evF), EMIN, EMAX)[0])
    gotG = np.sort(select_within_range(np.asarray(evG), EMIN, EMAX)[0])
    assert len(gotF) == len(gotG) >= len(truth)
    np.testing.assert_allclose(gotF, gotG, rtol=1e-7, atol=1e-7)
    # and the in-window eigenvalues are correct vs the known spectrum
    errs = [min(abs(gotF - t)) for t in truth]
    assert max(errs) < 1e-5

    # returned vectors match the generic path's (up to sign): the fused
    # loop's deferred basisTransformation materializes the same subspace
    for yF, yG in zip(YF, YG):
        xF = np.asarray(yF.array).ravel()
        xG = np.asarray(yG.array).ravel()
        assert abs(abs(np.dot(xF, xG)) - 1.0) < 1e-6


@pytest.mark.slow
def test_fused_warm_starts_match(problem):
    H, Yg, truth = problem
    evW, _, stW = _run(H, Yg, batch=True, warm=True)
    gotW = np.sort(select_within_range(np.asarray(evW), EMIN, EMAX)[0])
    errs = [min(abs(gotW - t)) for t in truth]
    assert len(gotW) >= len(truth) and max(errs) < 1e-5
    assert stW["solverIterations"] > 0


def test_fused_skips_exact_solver(problem, monkeypatch):
    H, Yg, truth = problem
    calls = {"n": 0}
    orig = feast_mod._feast_loop_fused

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(feast_mod, "_feast_loop_fused", spy)
    ev, _, _ = _run(H, Yg, batch=True, warm=False,
                    ls_extra={"linearSolver": "exact"})
    assert calls["n"] == 0, "fused loop must not engage for exact solves"
    got = np.sort(select_within_range(np.asarray(ev), EMIN, EMAX)[0])
    errs = [min(abs(got - t)) for t in truth]
    assert len(got) >= len(truth) and max(errs) < 1e-5


def _collect_dot_precisions(jaxpr, out):
    """All dot_general precision params in a jaxpr, recursively."""
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            out.append((eqn.params.get("precision"),
                        [tuple(v.aval.shape) for v in eqn.invars]))
        for v in eqn.params.values():
            for w in (v if isinstance(v, (list, tuple)) else [v]):
                if hasattr(w, "jaxpr"):
                    _collect_dot_precisions(w.jaxpr, out)
    return out


def test_fused_program_pins_matmul_precision():
    """TPU regression guard: every contraction in the fused FEAST program
    must pin HIGHEST precision.  The TPU MXU's default bf16-input dot loses
    ~3 decimal digits; measured on a v5e, a default-precision S/Hm assembly
    gives 1e-1 eigenvalue errors where the generic path reaches 1.5e-6.
    CPU ignores the precision param, so this asserts on the jaxpr (the only
    way to catch the regression without TPU hardware in CI)."""
    import jax
    import jax.numpy as jnp
    from eigensolvers_tpu import as_operator
    from eigensolvers_tpu.solvers.fast_feast import feast_filter_program

    n, m0, nk = 64, 3, 2
    op = as_operator(np.eye(n, dtype=np.float32))
    args = (op, jnp.ones((m0, n), np.float32), jnp.eye(m0, dtype=np.float32),
            jnp.ones(nk, np.float32), jnp.ones(nk, np.float32),
            jnp.ones(nk, np.float32), jnp.ones(nk, np.float32),
            jnp.zeros(m0, np.float32), jnp.float32(1e-4), jnp.float32(1e-4))
    jaxpr = jax.make_jaxpr(lambda *a: feast_filter_program(*a, maxiter=5))(
        *args)
    dots = _collect_dot_precisions(jaxpr.jaxpr, [])
    assert dots, "expected dot_general ops in the fused program"
    bad = [d for d in dots if d[0] is None]
    assert not bad, f"default-precision dots in fused FEAST program: {bad}"


def test_dense_kernels_pin_matmul_precision():
    """Same guard for the JaxVector subspace-algebra kernels."""
    import jax
    import jax.numpy as jnp
    from eigensolvers_tpu.vectors import dense as dv
    from eigensolvers_tpu import as_operator

    op = as_operator(np.eye(16, dtype=np.float32))
    V = jnp.ones((4, 16), np.float32)
    w = jnp.ones(16, np.float32)
    checks = [
        ("overlap", lambda: dv._overlap_kernel(V)),
        ("matrep", lambda: dv._matrep_kernel(op, V)),
        ("lincomb", lambda: dv._lincomb_kernel(V, jnp.ones(4, np.float32))),
        ("lincomb_batch", lambda: dv._lincomb_batch_kernel(
            V, jnp.ones((4, 2), np.float32))),
        ("ext_col", lambda: dv._ext_col_kernel(V, w)),
        ("ext_col_op", lambda: dv._ext_col_op_kernel(op, V, w)),
        ("mgs", lambda: dv._mgs_kernel(w, V)),
    ]
    for name, fn in checks:
        dots = _collect_dot_precisions(jax.make_jaxpr(fn)().jaxpr, [])
        bad = [d for d in dots if d[0] is None]
        assert not bad, f"default-precision dots in {name}: {bad}"


def test_f32_auto_policy_is_warm_with_cold_refresh(problem, monkeypatch):
    """AUTO warm starts (warmStartSolves=None): f64 runs always-warm after
    iteration 0; f32 runs warm with a cold solve every COLD_REFRESH_EVERY
    iterations (the deterministic-fixed-point fix: cold solves re-roll the
    f32 solve noise that Rayleigh-Ritz averages down — see the
    warmStartSolves doc for the measured 2.3e-4 frozen floor this breaks)."""
    H, Yg, truth = problem
    from eigensolvers_tpu.solvers import fast_feast

    flags = []
    orig = fast_feast.feast_filter_program

    def spy(*args, **kw):
        flags.append(bool(kw.get("warm")))
        return orig(*args, **kw)

    monkeypatch.setattr(fast_feast, "feast_filter_program", spy)
    ls = {"linearSolver": "minres", "linearIter": 800, "linear_tol": 1e-4,
          "errorOnNonConvergence": False}

    def run(dtype):
        flags.clear()
        Y = [JaxVector(Yg[:, i].astype(dtype), {"linearSystemArgs": dict(ls)})
             for i in range(M0)]
        feastDiagonalization(as_operator(H.astype(dtype)), Y, NC, "legendre",
                             EMIN, EMAX, 1e-12, 7, writeOut=False,
                             warmStartSolves=None)
        return list(flags)

    ce = feast_mod.COLD_REFRESH_EVERY
    f32_flags = run(np.float32)
    want32 = [bool(i > 0 and i % ce != 0) for i in range(len(f32_flags))]
    assert f32_flags == want32, (f32_flags, want32)
    f64_flags = run(np.float64)
    assert f64_flags == [False] + [True] * (len(f64_flags) - 1), f64_flags


def test_f32_auto_accuracy_within_2x_cold(problem):
    """Oracle-gated accuracy: the f32 auto policy must land within 2x of
    always-cold's true eigenvalue error (the VERDICT r2 item-9 gate; the
    always-warm freeze it guards against is a factor ~150 at n=2048)."""
    H, Yg, truth = problem
    ls = {"linearSolver": "minres", "linearIter": 3000, "linear_tol": 1e-5,
          "errorOnNonConvergence": False}

    def run(ws):
        Y = [JaxVector(Yg[:, i].astype(np.float32),
                       {"linearSystemArgs": dict(ls)}) for i in range(M0)]
        evF, _, st = feastDiagonalization(
            as_operator(H.astype(np.float32)), Y, NC, "legendre",
            EMIN, EMAX, 1e-5, 8, writeOut=False, warmStartSolves=ws)
        got = np.sort(select_within_range(np.asarray(evF), EMIN, EMAX)[0])
        assert len(got) >= len(truth)
        return max(min(abs(got - t)) for t in truth)

    err_cold = run(False)
    err_auto = run(None)
    assert err_auto <= 2 * err_cold + 1e-6, (err_auto, err_cold)


def test_lane_escalation_converges_all_contour_lanes(problem):
    """Lane-level iteration escalation (VERDICT r3 item 4): the near-real-
    axis contour nodes need ~1.6x more MINRES iterations than mid-contour
    nodes (kappa ~ 1/|Im z|); with the boost every lane converges at a
    maxiter that starves them flat, and the boost only spends iterations
    on the lanes that need it."""
    import warnings as _w
    from eigensolvers_tpu.solvers.feast import _contour
    from eigensolvers_tpu.ops.linear_solvers import gmres_splitc_batch

    H, Yg, truth = problem
    gk, wk, thetas, zs = _contour(EMIN, EMAX, NC, "legendre", 1.0)
    B = np.tile(Yg.T, (len(zs), 1)).astype(np.float32)
    sig = np.repeat(zs, M0)
    op = as_operator(H.astype(np.float32))

    r0 = gmres_splitc_batch(op, B, sig, rtol=1e-4, maxiter=800, escalate=0)
    r3 = gmres_splitc_batch(op, B, sig, rtol=1e-4, maxiter=800, escalate=3)
    bad0 = int(np.sum(~np.asarray(r0.converged)))
    bad3 = int(np.sum(~np.asarray(r3.converged)))
    assert bad0 > 0, "problem no longer starves any lane at maxiter=800"
    assert bad3 == 0, f"escalation left {bad3} lanes unconverged"
    it3 = np.asarray(r3.iterations)
    # converged lanes pay ~nothing extra; starved lanes use the boost
    assert it3.max() > 800 and it3.min() < 800 + 10, it3


def test_warm_start_guard_falls_back_to_zero_seed(problem):
    """A warm seed worse than no seed (early-iteration Ritz garbage) must
    not degrade the solve: the per-lane guard reverts to the zero start."""
    from eigensolvers_tpu.solvers.feast import _contour
    from eigensolvers_tpu.ops.linear_solvers import gmres_splitc_batch

    H, Yg, truth = problem
    gk, wk, thetas, zs = _contour(EMIN, EMAX, NC, "legendre", 1.0)
    B = Yg.T[:4].astype(np.float32)
    sig = np.asarray(zs[:4])
    op = as_operator(H.astype(np.float32))
    rng = np.random.RandomState(0)
    bad_x0 = 50.0 * rng.rand(4, 2, N).astype(np.float32)   # terrible seeds

    r_cold = gmres_splitc_batch(op, B, sig, rtol=1e-4, maxiter=3000)
    r_bad = gmres_splitc_batch(op, B, sig, x0s=bad_x0, rtol=1e-4,
                               maxiter=3000)
    assert np.all(np.asarray(r_bad.converged))
    # guard makes the bad-seed run equivalent to the cold run
    assert np.allclose(np.asarray(r_bad.iterations),
                       np.asarray(r_cold.iterations), atol=2)


def test_f32_rtol_clamped_at_attainable_floor(problem):
    """An rtol below the f32 roundoff floor (the warm-tightened inexact-
    FEAST schedule can request 1e-10) is clamped instead of burning the
    whole escalated budget to report failure at the floor."""
    from eigensolvers_tpu.solvers.feast import _contour
    from eigensolvers_tpu.ops.linear_solvers import gmres_splitc_batch

    H, Yg, truth = problem
    gk, wk, thetas, zs = _contour(EMIN, EMAX, NC, "legendre", 1.0)
    B = Yg.T[:2].astype(np.float32)
    sig = np.asarray(zs[:2])
    op = as_operator(H.astype(np.float32))
    r = gmres_splitc_batch(op, B, sig, rtol=1e-12, maxiter=4000)
    assert np.all(np.asarray(r.converged)), \
        "sub-floor rtol must clamp to the attainable f32 floor"
    assert float(np.max(np.asarray(r.resnorm))) < 1e-4


def test_f32_policy_run_emits_no_nonconvergence_warnings(problem):
    """End-to-end regression for VERDICT r3 weak #3: the f32 auto-policy
    FEAST run must complete without any 'lanes did not converge' warnings
    (previously 21/32 lanes at 1e-1 residuals)."""
    import warnings as _w
    H, Yg, truth = problem
    ls = {"linearSolver": "minres", "linearIter": 800, "linear_tol": 1e-4,
          "errorOnNonConvergence": False}
    Y = [JaxVector(Yg[:, i].astype(np.float32), {"linearSystemArgs": dict(ls)})
         for i in range(M0)]
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        feastDiagonalization(as_operator(H.astype(np.float32)), Y, NC,
                             "legendre", EMIN, EMAX, 1e-12, 7,
                             writeOut=False, warmStartSolves=None)
    bad = [str(w.message) for w in caught
           if "did not converge" in str(w.message)]
    assert not bad, bad
