"""Backend-neutral checkpoint / resume round-trips.

The reference's checkpointing is TTNS-only, write-only, and crashes its own
dense backend (SURVEY.md §5); ours must round-trip every backend and resume.
"""

import numpy as np
import pytest

from eigensolvers_tpu import JaxVector, inexactLanczosDiagonalization, \
    find_nearest
from eigensolvers_tpu.models.synthetic import known_spectrum_matrix
from eigensolvers_tpu.utils import checkpointing
from eigensolvers_tpu.vectors.mps import MPSVector


def test_dense_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    vecs = [JaxVector(rng.rand(40)) for _ in range(3)]
    status = {"cumIter": 5, "residual": 1e-7, "ref": [np.arange(3.0)]}
    checkpointing.save_checkpoint(str(tmp_path), 5, vecs, status,
                                  eigencoefficients=np.eye(3),
                                  eigenvalues=np.array([1.0, 2.0, 3.0]))
    loaded, meta = checkpointing.load_checkpoint(str(tmp_path), 5, JaxVector)
    assert len(loaded) == 3
    for a, b in zip(vecs, loaded):
        np.testing.assert_allclose(np.asarray(a.array), np.asarray(b.array))
    assert meta["status"]["cumIter"] == 5
    np.testing.assert_allclose(meta["eigenvalues"], [1.0, 2.0, 3.0])
    assert checkpointing.latest_tag(str(tmp_path)) == 5


def test_mps_roundtrip(tmp_path):
    dims = [3, 2, 4]
    v = MPSVector.random(dims, maxD=3, seed=1)
    checkpointing.save_checkpoint(str(tmp_path), 1, [v], {"phase": 1})
    loaded, meta = checkpointing.load_checkpoint(str(tmp_path), 1, MPSVector)
    np.testing.assert_allclose(loaded[0].to_dense(), v.to_dense(), atol=1e-13)


def test_solver_saves_and_resumes(tmp_path):
    """saveEachIteration writes per-iteration checkpoints; the saved basis
    reloads as guesses for a resume run that converges immediately."""
    n = 80
    H, ev = known_spectrum_matrix(n, eigenvalues=np.linspace(1, 150, n),
                                  seed=4)
    opts = {"linearSystemArgs": {"linearSolver": "minres", "linearIter": 2000,
                                 "linear_tol": 1e-4,
                                 "errorOnNonConvergence": False}}
    rng = np.random.RandomState(1)
    Y0 = JaxVector(rng.rand(n), opts)
    sigma = 40.0
    evL, uvL, st = inexactLanczosDiagonalization(
        H, Y0, sigma, 6, 3, 1e-8, writeOut=False,
        saveEachIteration=True, saveDir=str(tmp_path))
    tag = checkpointing.latest_tag(str(tmp_path))
    assert tag is not None and tag >= 1

    loaded, meta = checkpointing.load_checkpoint(str(tmp_path), tag,
                                                 JaxVector, options=opts)
    # resume from the best saved Ritz combination: rebuild guess
    coeffs = np.asarray(meta["eigencoefficients"])[:, 0]
    guess = JaxVector.linearCombination(loaded, coeffs).normalize()
    ev2, _, st2 = inexactLanczosDiagonalization(
        H, guess, sigma, 6, 3, 1e-8, writeOut=False)
    # the resumed run reaches (at least) the same accuracy
    truth = find_nearest(ev, sigma)[1]
    assert abs(find_nearest(ev2, sigma)[1] - truth) <= \
        max(1e-6, abs(find_nearest(evL, sigma)[1] - truth) * 10)
