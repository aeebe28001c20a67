"""FEAST through the MPS backend: exercises the inexact-addition quadrature
path (two solves at z and z̄ combined with conjugate coefficients, Polizzi
eq. 12 — reference feast.py:93-101) and complex compressed-Krylov solves.

Strategy parity: reference unittests/test_feast_ttns.py at test scale with a
dense oracle.
"""

import numpy as np
import pytest

from eigensolvers_tpu import SumOfProductOperator, feastDiagonalization, \
    select_within_range, find_nearest
from eigensolvers_tpu.models.synthetic import random_sop_terms
from eigensolvers_tpu.vectors.mps import MPSVector

DIMS = [3, 2, 3, 3, 3]   # 162-dim (keeps the 2-solve path affordable)


@pytest.fixture(scope="module")
def problem():
    terms = random_sop_terms(nDim=5, dims=DIMS, nSum=3, seed=77)
    op = SumOfProductOperator.from_terms(5, DIMS, terms)
    H = np.asarray(op.to_dense())
    evE, uvE = np.linalg.eigh(H)
    return op, H, evE, uvE


@pytest.mark.slow
def test_feast_mps(problem):
    op, H, evE, uvE = problem
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
    Y = [MPSVector.random(DIMS, maxD=40, options=opts, seed=s)
         for s in range(m0)]

    ev, uv, status = feastDiagonalization(
        op, Y, 6, "legendre", eMin, eMax, 1e-8, 12, writeOut=False)

    assert status["flagAddition"] is False   # the 2-solve path ran
    for target in true_in:
        nearest = find_nearest(ev, target)[1]
        assert abs(nearest - target) <= 1e-4, f"{target=} {nearest=}"
    # eigenvectors: densify and compare
    for target in true_in:
        idxE = find_nearest(evE, target)[0]
        idxT = find_nearest(ev, target)[0]
        vec = uv[idxT].to_dense().ravel()
        vec = vec / np.linalg.norm(vec)
        ovlp = abs(np.vdot(vec, uvE[:, idxE]))
        assert ovlp > 0.999, ovlp
