"""Block Lanczos on an engineered 3-fold degenerate cluster.

Strategy parity: reference unittests/test_lanczosBlock.py — eigenvalues
ev[5:8] made equal, 3 orthogonal guesses via QR, sigma centered on the
cluster; block eigenvalues must match to rtol 1e-6 and the degenerate
subspace must be captured (trace of the projector overlap ≈ 3).
"""

import numpy as np
import pytest
import scipy.linalg as la

from eigensolvers_tpu import (
    JaxVector,
    inexactLanczosDiagonalization,
    get_pick_function_close_to_sigma,
)


@pytest.fixture(scope="module", params=["batched", "sequential"])
def result(request):
    n = 100
    nBlock = 3
    iBlock = 5
    ev = np.linspace(1, 200, n)
    ev[iBlock:iBlock + nBlock] = ev[iBlock]
    rng = np.random.RandomState(1212)
    Q = la.qr(rng.rand(n, n))[0]
    A = Q.T @ np.diag(ev) @ Q

    options = {"linearSystemArgs": {
        "linearSolver": "gcrotmk", "linearIter": 1000, "linear_tol": 1e-4}}
    Ys = la.qr(rng.rand(n, nBlock), mode="economic")[0]
    Y0 = [JaxVector(Ys[:, i], options) for i in range(nBlock)]

    sigma = ev[iBlock] + nBlock / 2
    evEigh, uvEigh = np.linalg.eigh(A)
    pick = get_pick_function_close_to_sigma(sigma)
    evL, uvL, status = inexactLanczosDiagonalization(
        A, Y0, sigma, 6, 4, 1e-6, pick=pick, writeOut=False,
        batchBlockSolves=(request.param == "batched"))
    return dict(evL=evL, uvL=uvL, status=status, evBlock=ev[iBlock:iBlock + nBlock],
                uvEigh=uvEigh, iBlock=iBlock, nBlock=nBlock)


def test_block_eigenvalues(result):
    np.testing.assert_allclose(result["evL"][:result["nBlock"]],
                               result["evBlock"], rtol=1e-6)


def test_degenerate_subspace_captured(result):
    nBlock, iBlock = result["nBlock"], result["iBlock"]
    exactVectors = result["uvEigh"][:, iBlock:iBlock + nBlock]
    lanczosVectors = np.vstack(
        [np.asarray(result["uvL"][i].array) for i in range(nBlock)]).T
    ovlp = lanczosVectors.T.conj() @ exactVectors
    trace = np.abs(la.eigvals(ovlp)).sum()
    np.testing.assert_allclose(trace, 3, atol=1e-6)
