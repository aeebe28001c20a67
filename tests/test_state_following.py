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
