"""State-following via the maxOvlp pick function on a sinc-DVR harmonic
oscillator.

Strategy parity: reference unittests/test_stateFollowingHO.py — H = -d²/dx²
+ x² on a 45-point sinc DVR; the pick follows the overlap with the
*second*-nearest exact eigenvector, forcing the solver past a nearer root.
"""

import numpy as np
import pytest
import scipy.linalg as la

from eigensolvers_tpu import (
    JaxVector,
    inexactLanczosDiagonalization,
    find_nearest,
    get_pick_function_maxOvlp,
)
from eigensolvers_tpu.models.bases import SincInfInf


def test_state_following():
    N = 45
    sinc = SincInfInf(SincInfInf.getOptions(N=N, xRange=[-10, 10]))
    T = -sinc.mat_dx2
    V = np.diag(sinc.xi ** 2)
    H = T + V
    evEigh, uvEigh = la.eigh(H)

    sigma = 13.1
    options = {"linearSystemArgs": {
        "linearSolver": "gcrotmk", "linearIter": 30000, "linear_tol": 1e-4}}
    idx = find_nearest(evEigh, sigma)[0]
    ovlpRef = JaxVector(uvEigh[:, idx + 1], options)   # follow the FARTHER state
    energyRef = evEigh[idx + 1]
    rng = np.random.RandomState(13)
    Y0 = JaxVector(rng.rand(N), options)
    pick = get_pick_function_maxOvlp(ovlpRef)

    evL, uvL, status = inexactLanczosDiagonalization(
        H, Y0, sigma, L=16, maxit=200, eConv=1e-10, pick=pick, writeOut=False)

    assert status["isConverged"] is True
    relError = abs(evL[0] - energyRef) / max(abs(energyRef), 1e-14)
    assert relError <= 1e-4, f"{evL[0]=} vs {energyRef=}"

    ovlp = np.vdot(np.asarray(ovlpRef.array), np.asarray(uvL[0].array))
    np.testing.assert_allclose(abs(ovlp), 1, rtol=1e-2)


def test_state_following_mps():
    """maxOvlp pick through the compressed MPS backend, DMRG-seeded
    (reference: unittests/test_stateFollowingHO_ttns.py:118-129 — pyr4+
    vibronic Hamiltonian, guess = bond-truncated copy of the reference
    state, target = energies[idx]*1.001 so a *different* state is nearer;
    tolerances: rel-err <= 1e-4, overlap rtol 1e-5)."""
    from eigensolvers_tpu.models.molecules import pyrazine4_operator
    from eigensolvers_tpu.vectors.mps import MPO, MPSVector, mps_compress
    from eigensolvers_tpu.vectors.mps_sweeps import dmrg_eigensolve

    op, spec, bases = pyrazine4_operator(N=5)
    dims = [2, 5, 5, 5, 5]
    mpo = MPO.from_sop_compressed(op)
    es, xs = dmrg_eigensolve(mpo.tensors, dims, nStates=6, maxD=9,
                             nSweep=20, convTol=1e-9, seed=13)
    idx = 4                      # target just above state 4, follow state 5
    opts = {"compressArgs": {"maxD": 30, "eps": 5e-9},
            "linearSystemArgs": {"linearSolver": "minres",
                                 "linearIter": 1000, "linear_tol": 1e-3,
                                 "maxD": 30, "eps": 5e-9}}
    ovlpRef = MPSVector(xs[idx + 1], opts)
    energyRef = es[idx + 1]
    target = es[idx] * 1.001
    # the pick must pull PAST the nearer root (state idx) to state idx+1
    assert find_nearest(es, target)[0] == idx
    guess_t, _ = mps_compress([t.copy() for t in xs[idx + 1]], maxD=1)
    guess = MPSVector(guess_t, opts)     # TruncationFixed(1) analog
    pick = get_pick_function_maxOvlp(ovlpRef)

    evL, uvL, st = inexactLanczosDiagonalization(
        op, guess, target, 6, 10, 1e-6, pick=pick, writeOut=False)

    assert st["isConverged"] is True
    relError = abs(evL[0] - energyRef) / max(abs(energyRef), 1e-14)
    assert relError <= 1e-4, f"{evL[0]=} vs {energyRef=}"
    ovlp = ovlpRef.vdot(uvL[0])
    np.testing.assert_allclose(abs(ovlp), 1, rtol=1e-5)


def test_state_following_ttns_tree():
    """maxOvlp state-following over a branched tree topology, seeded by the
    tree-DMRG eigensweep (tree analog of the MPS test above)."""
    from eigensolvers_tpu import SumOfProductOperator, TTNSVector, TreeTopology
    from eigensolvers_tpu.models.synthetic import random_sop_terms
    from eigensolvers_tpu.vectors.ttns import TTNO, ttns_compress
    from eigensolvers_tpu.vectors.ttns_sweeps import tree_dmrg_eigensolve

    PARENTS = (-1, 0, 0, 2, 2, 4)
    DIMS = [3, 2, 3, 3, 3, 5]
    topo = TreeTopology(PARENTS)
    terms = random_sop_terms(nDim=6, dims=DIMS, nSum=3, seed=1212)
    op = SumOfProductOperator.from_terms(6, DIMS, terms)
    ttno = TTNO.from_sop(topo, op)
    es, xs = tree_dmrg_eigensolve(topo, ttno.tensors, DIMS, nStates=3,
                                  maxD=16, nSweep=12, convTol=1e-10)
    idx = 1
    opts = {"compressArgs": {"maxD": 40, "eps": 1e-10},
            "linearSystemArgs": {"linearSolver": "minres",
                                 "linearIter": 400, "linear_tol": 1e-4,
                                 "maxD": 40, "eps": 1e-10}}
    ovlpRef = TTNSVector(xs[idx + 1], opts, topo=topo)
    energyRef = es[idx + 1]
    target = es[idx] * 1.001
    assert find_nearest(es, target)[0] == idx
    guess_t, _ = ttns_compress(topo, [t.copy() for t in xs[idx + 1]], maxD=1)
    guess = TTNSVector(guess_t, opts, topo=topo)
    pick = get_pick_function_maxOvlp(ovlpRef)

    evL, uvL, st = inexactLanczosDiagonalization(
        op, guess, target, 6, 10, 1e-6, pick=pick, writeOut=False)

    assert st["isConverged"] is True
    relError = abs(evL[0] - energyRef) / max(abs(energyRef), 1e-14)
    assert relError <= 1e-4
    ovlp = ovlpRef.vdot(uvL[0])
    np.testing.assert_allclose(abs(ovlp), 1, rtol=1e-5)
