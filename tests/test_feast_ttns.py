"""FEAST through the TTNS backend on a genuinely branched tree: the
inexact-addition quadrature path (two solves at z and conj(z), Polizzi
eq. 12 — reference feast.py:93-101) with complex-shift tree-ALS sweep
solves.  Reference analog: unittests/test_feast_ttns.py (pyr4+ on an
external-ttns2 tree) at test scale with a dense oracle."""

import numpy as np
import pytest

from eigensolvers_tpu import (SumOfProductOperator, TTNSVector,
                              TreeTopology, feastDiagonalization,
                              find_nearest, select_within_range)
from eigensolvers_tpu.models.synthetic import random_sop_terms
from eigensolvers_tpu.vectors.ttns import ttns_dense, ttns_random

PARENTS = (-1, 0, 0, 2, 2)           # root -> {1,2}, 2 -> {3,4}
DIMS = [3, 2, 3, 3, 3]               # 162-dim (keeps the 2-solve path affordable)


@pytest.fixture(scope="module")
def problem():
    topo = TreeTopology(PARENTS)
    terms = random_sop_terms(nDim=5, dims=DIMS, nSum=3, seed=77)
    op = SumOfProductOperator.from_terms(5, DIMS, terms)
    H = np.asarray(op.to_dense())
    evE, uvE = np.linalg.eigh(H)
    return topo, op, H, evE, uvE


@pytest.mark.slow
def test_feast_ttns_tree(problem):
    topo, op, H, evE, uvE = problem
    eMin = float((evE[5] + evE[4]) / 2)
    eMax = float((evE[8] + evE[9]) / 2)
    true_in = select_within_range(evE, eMin, eMax)[0]
    assert 2 <= len(true_in) <= 5

    m0 = len(true_in) + 2
    opts = {"compressArgs": {"maxD": 60, "eps": 1e-12},
            "linearSystemArgs": {"method": "als", "nSweep": 10,
                                 "convTol": 1e-9, "siteTol": 1e-9,
                                 "linearIter": 400, "linear_tol": 1e-6,
                                 "maxD": 60, "eps": 1e-12}}
    Y = [TTNSVector(ttns_random(topo, DIMS, maxD=20, seed=s), opts,
                    topo=topo).normalize() for s in range(m0)]

    ev, uv, status = feastDiagonalization(
        op, Y, 6, "legendre", eMin, eMax, 1e-8, 10, writeOut=False)

    assert status["flagAddition"] is False   # the 2-solve TNS path ran
    for target in true_in:
        nearest = find_nearest(ev, target)[1]
        assert abs(nearest - target) <= 1e-4, f"{target=} {nearest=}"
    for target in true_in:
        idxE = find_nearest(evE, target)[0]
        idxT = find_nearest(ev, target)[0]
        vec = ttns_dense(topo, uv[idxT].tensors).ravel()
        vec = vec / np.linalg.norm(vec)
        ovlp = abs(np.vdot(vec, uvE[:, idxE]))
        # vector gate at the reference's TTNS-FEAST grade (rtol/atol 1e-3
        # on densified trees, unittests/test_feast_ttns.py:142-175)
        assert ovlp > 0.995, ovlp
