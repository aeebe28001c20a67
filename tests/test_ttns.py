"""Tree-tensor-network backend: tree algebra vs dense oracles, TTNO apply /
sandwich, and full solver runs over a branched topology — the tree analog of
the reference's TTNS tests (reference: unittests/test_lanczosTTNS.py, which
uses a 6-leaf tree via the external ttns2 package)."""

import numpy as np
import pytest

from eigensolvers_tpu import (
    GroupedSoPOperator,
    SumOfProductOperator,
    TTNSVector,
    TreeTopology,
    inexactLanczosDiagonalization,
    find_nearest,
    parseTree,
)
from eigensolvers_tpu.models.synthetic import random_sop_terms
from eigensolvers_tpu.vectors.ttns import (
    TTNO,
    ttns_add,
    ttns_compress,
    ttns_dense,
    ttns_random,
    ttns_scale,
    ttns_vdot,
)

# 6-node tree: root(0) -> {1, 2}, 2 -> {3, 4}, 4 -> {5}
PARENTS = (-1, 0, 0, 2, 2, 4)
DIMS = [3, 2, 3, 3, 3, 5]            # reference test_lanczosTTNS dims


@pytest.fixture(scope="module")
def topo():
    return TreeTopology(PARENTS)


def test_topology_basics(topo):
    assert topo.children == ((1, 2), (), (3, 4), (), (5,), ())
    assert topo.subtree_size == (6, 1, 4, 1, 2, 1)
    assert topo.child_axis(2, 4) == 3
    # nested-list construction (parseTree parity) gives the same tree
    t2 = parseTree([[], [[], [[]]]])
    assert t2 == topo
    # chains degenerate correctly
    ch = TreeTopology.chain(4)
    assert ch.children == ((1,), (2,), (3,), ())


def test_vdot_and_scale_vs_dense(topo):
    A = ttns_random(topo, DIMS, maxD=6, seed=1)
    B = ttns_random(topo, DIMS, maxD=5, seed=2)
    da, db = ttns_dense(topo, A), ttns_dense(topo, B)
    np.testing.assert_allclose(ttns_vdot(topo, A, B), np.vdot(da, db),
                               rtol=1e-12)
    np.testing.assert_allclose(ttns_dense(topo, ttns_scale(A, 2.5)),
                               2.5 * da, rtol=1e-12)


def test_add_vs_dense(topo):
    A = ttns_random(topo, DIMS, maxD=4, seed=3)
    B = ttns_random(topo, DIMS, maxD=3, seed=4)
    np.testing.assert_allclose(
        ttns_dense(topo, ttns_add(topo, A, B)),
        ttns_dense(topo, A) + ttns_dense(topo, B), atol=1e-12)


def test_compress_lossless_and_truncating(topo):
    A = ttns_random(topo, DIMS, maxD=8, seed=5)
    da = ttns_dense(topo, A)
    # lossless pass preserves the state and cannot grow bonds
    C, disc = ttns_compress(topo, A, maxD=None, eps=0.0)
    np.testing.assert_allclose(ttns_dense(topo, C), da, atol=1e-10)
    assert disc < 1e-20
    # direct-sum of a state with itself compresses back losslessly
    AA = ttns_add(topo, A, ttns_scale(A, -0.5))
    C2, _ = ttns_compress(topo, AA, maxD=8, eps=1e-13)
    np.testing.assert_allclose(ttns_dense(topo, C2), 0.5 * da, atol=1e-9)
    assert max(t.shape[0] for t in C2[1:]) <= 8
    # hard truncation respects maxD and reports discarded weight
    C3, disc3 = ttns_compress(topo, A, maxD=2, eps=0.0)
    assert max(t.shape[0] for t in C3[1:]) <= 2
    assert disc3 > 0


@pytest.fixture(scope="module")
def sop(topo):
    terms = random_sop_terms(nDim=6, dims=DIMS, nSum=3, seed=1212)
    op = SumOfProductOperator.from_terms(6, DIMS, terms)
    H = np.asarray(op.to_dense())
    assert np.allclose(H, H.T.conj())
    ev, uv = np.linalg.eigh(H)
    return dict(op=op, H=H, ev=ev, uv=uv)


def test_ttno_apply_and_sandwich(topo, sop):
    ttno = TTNO.from_sop(topo, sop["op"])
    A = ttns_random(topo, DIMS, maxD=6, seed=6)
    B = ttns_random(topo, DIMS, maxD=5, seed=7)
    da, db = ttns_dense(topo, A), ttns_dense(topo, B)
    H = sop["H"]
    np.testing.assert_allclose(ttns_dense(topo, ttno.apply(B)), H @ db,
                               atol=1e-9)
    np.testing.assert_allclose(ttno.sandwich(A, B), np.vdot(da, H @ db),
                               rtol=1e-10)


def test_contract_methods(topo, sop):
    """AbstractVector contract through the inherited MPSVector machinery:
    orthogonalize, linearCombination, matrixRepresentation + extension."""
    opts = {"compressArgs": {"maxD": 40, "eps": 1e-12}}
    vs = [TTNSVector.random(topo, DIMS, 8, opts, seed=s) for s in range(4)]
    qs = TTNSVector.orthogonalize(vs)
    S = TTNSVector.overlapMatrix(qs)
    np.testing.assert_allclose(S, np.eye(len(qs)), atol=1e-9)

    lc = TTNSVector.linearCombination(vs[:3], [0.5, -1.0, 2.0])
    want = sum(c * ttns_dense(topo, v.tensors)
               for c, v in zip([0.5, -1.0, 2.0], vs[:3]))
    np.testing.assert_allclose(lc.to_dense(), want, atol=1e-8)

    Hm = TTNSVector.matrixRepresentation(sop["op"], qs)
    dense_q = [ttns_dense(topo, q.tensors) for q in qs]
    want_H = np.array([[np.vdot(a, sop["H"] @ b) for b in dense_q]
                       for a in dense_q])
    np.testing.assert_allclose(Hm, want_H, atol=1e-8)
    # incremental extension == full rebuild (reference contract,
    # unittests/test_lanczosTTNS.py:108-116)
    Hext = TTNSVector.extendMatrixRepresentation(sop["op"], qs,
                                                 Hm[:3, :3].copy())
    np.testing.assert_allclose(Hext, Hm, atol=1e-9)
    Sext = TTNSVector.extendOverlapMatrix(qs, S[:3, :3].copy())
    np.testing.assert_allclose(Sext, S, atol=1e-9)


@pytest.mark.parametrize("place", [4, 12])
def test_lanczos_on_tree(topo, sop, place):
    """Interior eigenpairs through the full inexact-Lanczos driver with tree
    states (reference tolerance: rel-err <= 1e-5,
    unittests/test_lanczosTTNS.py:118-142)."""
    from eigensolvers_tpu import calculateTarget
    ev = sop["ev"]
    sigma = float(calculateTarget(ev, place))
    opts = {"compressArgs": {"maxD": 60, "eps": 1e-10},
            "linearSystemArgs": {"linearSolver": "minres", "linearIter": 300,
                                 "linear_tol": 1e-5, "maxD": 60,
                                 "eps": 1e-10}}
    Y0 = TTNSVector.random(topo, DIMS, 8, opts, seed=11)
    evL, uv, st = inexactLanczosDiagonalization(
        sop["op"], Y0, sigma, 10, 6, 1e-8, writeOut=False)
    got = find_nearest(evL, sigma)[1]
    want = find_nearest(ev, sigma)[1]
    assert abs(got - want) / abs(want) <= 1e-5
    # eigenvector via densification
    vec = uv[int(np.argmin(np.abs(np.asarray(evL) - sigma)))].to_dense()
    exact = sop["uv"][:, int(np.argmin(np.abs(ev - want)))]
    overlap = abs(np.vdot(exact, vec) / np.linalg.norm(vec))
    assert abs(overlap - 1.0) < 1e-3


def test_state_dict_roundtrip(topo):
    v = TTNSVector.random(topo, DIMS, 5, seed=13)
    state = v.to_state_dict()
    w = TTNSVector.from_state_dict(state)
    np.testing.assert_allclose(w.to_dense(), v.to_dense(), atol=1e-14)
    assert w.topo == topo


def test_chain_matches_mps():
    """A chain TTNS reproduces the MPS backend bitwise at the dense level."""
    from eigensolvers_tpu import MPSVector
    dims = [3, 4, 3, 2]
    chain = TreeTopology.chain(4)
    terms = random_sop_terms(nDim=4, dims=dims, nSum=2, seed=7)
    op = SumOfProductOperator.from_terms(4, dims, terms)
    rng = np.random.RandomState(0)
    x = rng.rand(*dims)
    vm = MPSVector.from_dense(x, dims)
    # chain shapes coincide except the boundary: the MPS last site carries a
    # trailing bond-1 axis, a TTNS leaf has no child axes
    ts = [t.copy() for t in vm.tensors]
    ts[-1] = ts[-1][:, :, 0]
    vt = TTNSVector(ts, topo=chain)
    np.testing.assert_allclose(vt.to_dense().reshape(dims), x, atol=1e-12)
    a = vt.applyOp(op)
    b = vm.applyOp(op)
    np.testing.assert_allclose(a.to_dense().ravel(),
                               np.asarray(b.to_dense()).ravel(), atol=1e-9)


@pytest.mark.slow
def test_feast_on_tree(topo, sop):
    """FEAST through the tree backend: the inexact-addition quadrature path
    (two conjugate solves per node, Polizzi eq. 12) with complex compressed-
    Krylov solves over a branched topology — the tree analog of the
    reference's FEAST TTNS test (reference: unittests/test_feast_ttns.py,
    which runs FEAST on a ttns2 tree state)."""
    from eigensolvers_tpu import feastDiagonalization, select_within_range

    evE, uvE = sop["ev"], sop["uv"]
    # window with 3 eigenvalues, away from degeneracies
    eMin = float((evE[5] + evE[4]) / 2)
    eMax = float((evE[7] + evE[8]) / 2)
    true_in = select_within_range(evE, eMin, eMax)[0]
    assert len(true_in) == 3

    m0 = 5
    opts = {"compressArgs": {"maxD": 60, "eps": 1e-12},
            "linearSystemArgs": {"linearSolver": "bicgstab",
                                 "linearIter": 600, "linear_tol": 1e-5,
                                 "maxD": 60, "eps": 1e-12}}
    Y = [TTNSVector.random(topo, DIMS, 8, opts, seed=40 + s)
         for s in range(m0)]

    ev, uv, status = feastDiagonalization(
        sop["op"], Y, 6, "legendre", eMin, eMax, 1e-8, 12, writeOut=False)

    assert status["flagAddition"] is False   # the 2-solve tree path ran
    for target in true_in:
        nearest = find_nearest(ev, target)[1]
        assert abs(nearest - target) <= 1e-4, f"{target=} {nearest=}"
    for target in true_in:
        idxE = find_nearest(evE, target)[0]
        idxT = find_nearest(ev, target)[0]
        vec = np.asarray(uv[idxT].to_dense()).ravel()
        vec = vec / np.linalg.norm(vec)
        assert abs(np.vdot(vec, uvE[:, idxE])) > 0.999


def test_ttns_random_production_scale_bonds():
    """Bond-dimension arithmetic must survive production dimension counts:
    np.prod(dims) overflows int64 at 42^12 ~ 3e19 (regression: negative
    bond dims through n_total // sub[i] crashed the production FEAST
    guess construction)."""
    from eigensolvers_tpu.vectors.ttns import ttns_random
    from eigensolvers_tpu.models.molecules import ch3cn_tree

    topo, parts = ch3cn_tree()
    dims = [42 ** len(p) for p in parts]
    ts = ttns_random(topo, dims, maxD=3, seed=1)
    assert len(ts) == len(topo)
    for t in ts:
        assert all(d > 0 for d in t.shape), t.shape
        assert t.shape[0] <= 3 or t.shape[0] == 1
