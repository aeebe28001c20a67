"""DMRG eigensweep: oracle accuracy, deflated excited states, and the CH3CN
zero-point energy at a reduced basis (production-config family;
reference value 9837.4069 cm-1 at N=42/maxD=10, examples/ttns2_ch3cn.py)."""

import numpy as np
import pytest

from eigensolvers_tpu import SumOfProductOperator
from eigensolvers_tpu.models.synthetic import random_sop_terms
from eigensolvers_tpu.vectors.mps import MPO
from eigensolvers_tpu.vectors.mps_sweeps import dmrg_eigensolve

DIMS = [3, 2, 3, 3, 3, 5]


@pytest.fixture(scope="module")
def sop():
    terms = random_sop_terms(nDim=6, dims=DIMS, nSum=3, seed=1212)
    op = SumOfProductOperator.from_terms(6, DIMS, terms)
    evE = np.linalg.eigvalsh(np.asarray(op.to_dense()))
    return op, evE


def test_ground_and_excited_states(sop):
    op, evE = sop
    mpo = MPO.from_sop(op)
    es, xs = dmrg_eigensolve(mpo.tensors, DIMS, nStates=4, maxD=40,
                             nSweep=20, convTol=1e-11)
    np.testing.assert_allclose(es, evE[:4], atol=1e-9)
    # states are orthonormal MPSs; the hard-projection deflation
    # (P H_eff P + shift in the local problems) gives machine-precision
    # orthogonality, not the ~1e-4 of a soft penalty
    from eigensolvers_tpu.vectors.mps import mps_vdot
    for i in range(4):
        np.testing.assert_allclose(abs(mps_vdot(xs[i], xs[i])), 1, atol=1e-8)
        for j in range(i):
            assert abs(mps_vdot(xs[i], xs[j])) < 1e-10


def test_truncated_dmrg_variational(sop):
    """Tight maxD: energy stays variational (above the true ground state)
    and close."""
    op, evE = sop
    mpo = MPO.from_sop(op)
    es, _ = dmrg_eigensolve(mpo.tensors, DIMS, nStates=1, maxD=3,
                            nSweep=12, convTol=1e-10)
    assert es[0] >= evE[0] - 1e-10
    assert es[0] - evE[0] < 5e-2


@pytest.mark.slow
def test_ch3cn_zpve_reduced_basis():
    """CH3CN 12-mode ZPVE at N=12 points/mode, maxD=6 — must land within
    1 cm-1 of the production reference value 9837.4069 (the N=42/maxD=10
    configuration reproduces it to ~0.1 cm-1; kept smaller here for test
    runtime)."""
    from eigensolvers_tpu.models.molecules import ch3cn_operator
    from eigensolvers_tpu.utils.units import au2unit
    op, spec, bases = ch3cn_operator(N=12)
    mpo = MPO.from_sop_compressed(op)
    assert max(t.shape[0] for t in mpo.tensors) <= 30  # true Schmidt ranks
    es, _ = dmrg_eigensolve(mpo.tensors, [12] * 12, nStates=1, maxD=6,
                            nSweep=6, convTol=1e-9, seed=1)
    zpve = float(au2unit(es[0], "cm-1"))
    assert abs(zpve - 9837.4069) < 1.0, zpve
