"""MPS backend: interface conformance and solver integration.

Strategy parity with the reference's TTNS tests (unittests/test_lanczosTTNS.py,
test_lanczosBlockTTNS.py): random SoP operator on a multi-mode product space
(~810-dim), exact oracle via densification, generous maxD so compression is
effectively exact; plus tight-maxD behavior checks (inexactness enters
through truncation).
"""

import numpy as np
import pytest

from eigensolvers_tpu import (
    SumOfProductOperator,
    inexactLanczosDiagonalization,
    calculateTarget,
    find_nearest,
)
from eigensolvers_tpu.models.synthetic import (
    coupled_quartic_oscillator_2d,
    random_sop_terms,
)
from eigensolvers_tpu.vectors.mps import (
    MPO, MPSVector, mps_dense, mps_from_dense, mps_vdot)

DIMS = [3, 2, 3, 3, 3, 5]


@pytest.fixture(scope="module")
def sop():
    terms = random_sop_terms(nDim=6, dims=DIMS, nSum=3, seed=1212)
    op = SumOfProductOperator.from_terms(6, DIMS, terms)
    H = np.asarray(op.to_dense())
    evEigh, uvEigh = np.linalg.eigh(H)
    return dict(op=op, H=H, evEigh=evEigh, uvEigh=uvEigh)


def _opts(maxD=100, eps=1e-12, tol=1e-4, iters=400):
    return {"compressArgs": {"maxD": maxD, "eps": eps},
            "linearSystemArgs": {"linearSolver": "minres", "linearIter": iters,
                                 "linear_tol": tol, "maxD": maxD, "eps": eps}}


def test_roundtrip_and_vdot(sop):
    rng = np.random.RandomState(0)
    x = rng.rand(*DIMS)
    ts = mps_from_dense(x, DIMS)
    np.testing.assert_allclose(mps_dense(ts), x, atol=1e-12)
    y = rng.rand(*DIMS)
    ty = mps_from_dense(y, DIMS)
    np.testing.assert_allclose(mps_vdot(ts, ty), np.vdot(x.ravel(), y.ravel()),
                               atol=1e-10)


def test_mpo_matches_sop(sop):
    mpo = MPO.from_sop(sop["op"])
    rng = np.random.RandomState(1)
    x = rng.rand(*DIMS)
    ts = mps_from_dense(x, DIMS)
    y = mps_dense(mpo.apply(ts))
    np.testing.assert_allclose(y.ravel(), sop["H"] @ x.ravel(), atol=1e-9)
    # sandwich oracle
    z = rng.rand(*DIMS)
    tz = mps_from_dense(z, DIMS)
    np.testing.assert_allclose(mpo.sandwich(tz, ts),
                               np.vdot(z.ravel(), sop["H"] @ x.ravel()),
                               atol=1e-9)


def test_mpo_compress(sop):
    mpo = MPO.from_sop(sop["op"]).compress()
    rng = np.random.RandomState(2)
    x = rng.rand(*DIMS)
    ts = mps_from_dense(x, DIMS)
    np.testing.assert_allclose(mps_dense(mpo.apply(ts)).ravel(),
                               sop["H"] @ x.ravel(), atol=1e-8)


def test_compress_truncates():
    rng = np.random.RandomState(3)
    x = rng.rand(*DIMS)
    v = MPSVector.from_dense(x, DIMS, _opts(maxD=4))
    assert v.maxD > 4
    vc = v.compress()
    assert vc.maxD <= 4
    # dominant structure survives
    ovlp = abs(np.vdot(vc.to_dense().ravel(), x.ravel())) / \
        (np.linalg.norm(vc.to_dense()) * np.linalg.norm(x))
    assert ovlp > 0.5


def test_interface_extension(sop):
    """Incremental S/H extension == full rebuild (TTNS-test pattern,
    reference test_lanczosTTNS.py:108-116)."""
    rng = np.random.RandomState(4)
    vecs = [MPSVector.from_dense(rng.rand(*DIMS), DIMS, _opts()).normalize()
            for _ in range(4)]
    S1 = MPSVector.overlapMatrix(vecs[:-1])
    S = MPSVector.extendOverlapMatrix(vecs, S1)
    Sfull = MPSVector.overlapMatrix(vecs)
    np.testing.assert_allclose(S, Sfull, atol=1e-9)

    H1 = MPSVector.matrixRepresentation(sop["op"], vecs[:-1])
    Hext = MPSVector.extendMatrixRepresentation(sop["op"], vecs, H1)
    Hfull = MPSVector.matrixRepresentation(sop["op"], vecs)
    np.testing.assert_allclose(Hext, Hfull, atol=1e-9)
    # oracle against dense
    Vd = np.stack([v.to_dense().ravel() for v in vecs])
    np.testing.assert_allclose(Hfull, Vd.conj() @ (sop["H"] @ Vd.T), atol=1e-8)


def test_solve_compressed(sop):
    """Compressed-Krylov shifted solve reproduces the dense solution at
    generous maxD."""
    rng = np.random.RandomState(5)
    b = MPSVector.from_dense(rng.rand(*DIMS), DIMS,
                             _opts(maxD=120, tol=1e-6, iters=2000)).normalize()
    sigma = calculateTarget(sop["evEigh"], 8)
    x = MPSVector.solve(sop["op"], b, sigma)
    xd = x.to_dense().ravel()
    x_exact = np.linalg.solve(sigma * np.eye(len(xd)) - sop["H"],
                              b.to_dense().ravel())
    rel = np.linalg.norm(xd - x_exact) / np.linalg.norm(x_exact)
    assert rel < 1e-3, rel


@pytest.mark.slow
def test_lanczos_mps(sop):
    """Targeted eigenpair through the MPS backend (rel-err ≤ 1e-5, vector
    overlap — the reference TTNS accuracy contract)."""
    target = calculateTarget(sop["evEigh"], 4)
    guess = MPSVector.random(DIMS, maxD=60, options=_opts(maxD=80, tol=1e-3,
                                                          iters=800),
                             seed=1212)
    evL, uvL, status = inexactLanczosDiagonalization(
        sop["op"], guess, target, L=25, maxit=10, eConv=1e-7, writeOut=False)
    got = find_nearest(evL, target)[1]
    want = find_nearest(sop["evEigh"], target)[1]
    assert abs(got - want) / abs(want) <= 1e-5

    idxT = find_nearest(evL, target)[0]
    idxE = find_nearest(sop["evEigh"], target)[0]
    vec = uvL[idxT].to_dense().ravel()
    ovlp = np.vdot(vec, sop["uvEigh"][:, idxE])
    np.testing.assert_allclose(abs(ovlp), 1, rtol=1e-4)
    # bond-dimension telemetry flows through the status dict
    assert status["KSmaxD"][0] >= 1


@pytest.mark.slow
def test_block_lanczos_mps_degenerate_pair():
    """Degenerate pair of the 2-D coupled quartic oscillator through the MPS
    backend (reference test_lanczosBlockTTNS.py workload)."""
    terms, bases = coupled_quartic_oscillator_2d(N=15, coupling=0.1)
    dims = [b.N for b in bases]
    op = SumOfProductOperator.from_terms(2, dims, terms)
    H = np.asarray(op.to_dense())
    evEigh = np.linalg.eigvalsh(H)
    # first excited pair is (nearly) degenerate by symmetry
    pair = evEigh[1:3]
    sigma = float(pair.mean())

    opts = _opts(maxD=24, tol=1e-3, iters=600)
    guesses = [MPSVector.random(dims, maxD=10, options=opts, seed=s).normalize()
               for s in (1, 2)]
    # orthogonalize the second against the first
    g2 = MPSVector.orthogonalize_against_set(guesses[1], [guesses[0]])
    evL, uvL, status = inexactLanczosDiagonalization(
        op, [guesses[0], g2], sigma, L=8, maxit=8, eConv=1e-8, writeOut=False)
    np.testing.assert_allclose(np.sort(evL[:2]), pair, rtol=1e-5, atol=1e-5)


def test_als_sweep_solver(sop):
    """Two-site ALS sweep solve matches the dense solution (the reference's
    LinearSystem-sweep analog) and adapts bond dimensions."""
    rng = np.random.RandomState(6)
    opts = _opts(maxD=120, tol=1e-8, iters=300)
    opts["linearSystemArgs"]["method"] = "als"
    opts["linearSystemArgs"]["nSweep"] = 30
    opts["linearSystemArgs"]["convTol"] = 1e-9
    b = MPSVector.from_dense(rng.rand(*DIMS), DIMS, opts).normalize()
    sigma = calculateTarget(sop["evEigh"], 8)
    x = MPSVector.solve(sop["op"], b, sigma)
    xd = x.to_dense().ravel()
    x_exact = np.linalg.solve(sigma * np.eye(len(xd)) - sop["H"],
                              b.to_dense().ravel())
    rel = np.linalg.norm(xd - x_exact) / np.linalg.norm(x_exact)
    assert rel < 1e-5, rel


def test_als_sweep_truncated(sop):
    """With a tight maxD the ALS solve degrades gracefully (best rank-D
    approximation of the solution, not garbage)."""
    rng = np.random.RandomState(8)
    opts = _opts(maxD=8, tol=1e-6, iters=300)
    opts["linearSystemArgs"]["method"] = "als"
    b = MPSVector.from_dense(rng.rand(*DIMS), DIMS, opts).normalize()
    sigma = calculateTarget(sop["evEigh"], 8)
    x = MPSVector.solve(sop["op"], b, sigma)
    assert x.maxD <= 8
    xd = x.to_dense().ravel()
    x_exact = np.linalg.solve(sigma * np.eye(len(xd)) - sop["H"],
                              b.to_dense().ravel())
    cos = abs(np.vdot(xd, x_exact)) / (np.linalg.norm(xd)
                                       * np.linalg.norm(x_exact))
    assert cos > 0.9, cos


@pytest.mark.slow
def test_lanczos_mps_als(sop):
    """Full inexact Lanczos with the ALS sweep inner solver (reference TTNS
    pipeline shape: sweeps inside, Krylov outside)."""
    target = calculateTarget(sop["evEigh"], 4)
    opts = _opts(maxD=80, tol=1e-3, iters=200)
    opts["linearSystemArgs"]["method"] = "als"
    opts["linearSystemArgs"]["nSweep"] = 8
    opts["linearSystemArgs"]["convTol"] = 1e-4
    guess = MPSVector.random(DIMS, maxD=60, options=opts, seed=1212)
    evL, uvL, status = inexactLanczosDiagonalization(
        sop["op"], guess, target, L=25, maxit=10, eConv=1e-7, writeOut=False)
    got = find_nearest(evL, target)[1]
    want = find_nearest(sop["evEigh"], target)[1]
    assert abs(got - want) / abs(want) <= 1e-5


def test_mpo_cached_and_compressed():
    """Subspace assembly must use ONE bond-compressed MPO per operator
    (VERDICT r1 weak 7): the term-diagonal bond is nSum while the operator
    Schmidt rank is typically O(1)-O(10); rebuilding an uncompressed MPO per
    matrixRepresentation call made assembly scale with the term count."""
    import numpy as np
    from eigensolvers_tpu.ops.operators import SumOfProductOperator
    from eigensolvers_tpu.vectors.mps import MPO, MPSVector, _as_mpo

    rng = np.random.RandomState(5)
    nmodes, n, S = 5, 4, 9
    terms = []
    for _ in range(S):
        modes = sorted(rng.choice(nmodes, size=2, replace=False))
        facs = {int(d): (lambda M: (M + M.T) / 2)(rng.rand(n, n) - 0.5)
                for d in modes}
        terms.append((1.0, facs))
    op = SumOfProductOperator.from_terms(nmodes, [n] * nmodes, terms)

    mpo1 = _as_mpo(op)
    mpo2 = _as_mpo(op)
    assert mpo1 is mpo2, "MPO must be cached on the operator"
    bond = max(t.shape[0] for t in mpo1.tensors)
    assert bond < S, f"MPO not compressed: bond {bond} >= nSum {S}"

    # the compressed MPO is numerically the same operator
    opts = {"compressArgs": {"maxD": 64, "eps": 0.0}}
    vs = [MPSVector.random([n] * nmodes, 8, opts, seed=i) for i in range(4)]
    M_fast = MPSVector.matrixRepresentation(op, vs)
    mpo_ref = MPO.from_sop(op)
    M_ref = MPSVector.matrixRepresentation(mpo_ref, vs)
    np.testing.assert_allclose(M_fast, M_ref, atol=1e-10)


def test_extend_applies_operator_once(monkeypatch):
    """Subspace-column extension must apply the operator ONCE for the shared
    ket and fill the column with plain overlaps — not re-zip the MPO per
    pair (the dominant MPS assembly cost at m = nBlock*L >~ 50)."""
    import eigensolvers_tpu.vectors.mps as mps_mod
    from eigensolvers_tpu import MPSVector, SumOfProductOperator
    from eigensolvers_tpu.models.synthetic import random_sop_terms

    dims = [3, 3, 3, 3]
    op = SumOfProductOperator.from_terms(
        4, dims, random_sop_terms(nDim=4, dims=dims, nSum=2, seed=3))
    vs = [MPSVector.random(dims, 4, seed=s) for s in range(5)]
    M0 = MPSVector.matrixRepresentation(op, vs[:4])

    calls = {"n": 0}
    orig = mps_mod.MPO.apply

    def counting_apply(self, ts):
        calls["n"] += 1
        return orig(self, ts)

    monkeypatch.setattr(mps_mod.MPO, "apply", counting_apply)
    M1 = MPSVector.extendMatrixRepresentation(op, vs[:5], M0)
    assert calls["n"] == 1
    np.testing.assert_allclose(M1[:4, :4], M0, atol=1e-12)
    np.testing.assert_allclose(
        M1, MPSVector.matrixRepresentation(op, vs[:5]), atol=1e-10)
