"""MCTDH .op parser: pyrazine 4-mode vibronic model and CH3CN cuts.

Checks grammar coverage (parameters with units, coefficient expressions,
electronic S<i>&<j> factors, KE/dq^2/q^n labels), hermiticity of the built
operator, and physical sanity of the spectra; plus FEAST on a pyr4+
dense-feasible cut (the workload family of reference
unittests/test_feast_ttns.py).
"""

import numpy as np
import pytest

from eigensolvers_tpu import JaxVector, feastDiagonalization, select_within_range
from eigensolvers_tpu.models.molecules import (
    CH3CN_OP, PYR4_OP, ch3cn_operator, pyrazine4_operator)
from eigensolvers_tpu.models.op_parser import parse_op_file
from eigensolvers_tpu.utils.units import au2unit, unit2au


def test_parse_pyr4():
    spec = parse_op_file(PYR4_OP)
    assert spec.mode_labels == ["el", "v10a", "v6a", "v1", "v9a"]
    # parameters converted from eV to hartree
    assert np.isclose(spec.parameters["w10a"], float(unit2au(0.1139, "ev")))
    assert np.isclose(spec.parameters["delta"], float(unit2au(0.423, "ev")))
    # 4 KE + 4 q^2 + 2 delta + 6 linear + 8 quadratic + 6+3 bilinear = 33
    # (one Lambda line is commented out in the file)
    assert len(spec.terms) == 33
    # electronic factors present
    assert any("S1&2" in t.factors.values() for t in spec.terms)


def test_parse_ch3cn():
    spec = parse_op_file(CH3CN_OP)
    assert spec.nModes == 12
    assert np.isclose(spec.parameters["w1"], float(unit2au(3065.0, "cm-1")))
    # every term line parsed: 12 KE + 12 q^2 + many anharmonic terms
    assert len(spec.terms) > 300


@pytest.fixture(scope="module")
def pyr4_dense():
    op, spec, bases = pyrazine4_operator(N=4)
    H = np.asarray(op.to_dense())
    return op, spec, H


def test_pyr4_hermitian_and_spectrum(pyr4_dense):
    op, spec, H = pyr4_dense
    assert H.shape == (2 * 4 ** 4, 2 * 4 ** 4)
    np.testing.assert_allclose(H, H.T.conj(), atol=1e-12)
    ev = np.linalg.eigvalsh(H)
    ev_ev = au2unit(ev, "ev")
    # vibronic ground state sits below -delta (=-0.423 eV) plus zero-point
    assert -1.0 < ev_ev[0] < 1.0
    # spectrum spans both electronic states (delta gap visible)
    assert ev_ev[-1] > 1.0


@pytest.mark.slow
def test_feast_on_pyr4_cut(pyr4_dense):
    """FEAST finds all eigenvalues in a window of the pyr4+ cut
    (dense-feasible analog of reference test_feast_ttns.py)."""
    op, spec, H = pyr4_dense
    evEigh, _ = np.linalg.eigh(H)
    # window enclosing eigenvalues 3..5 (reference uses the same placement)
    eMin, eMax = evEigh[3] * (1 - 1e-3), evEigh[5] * (1 + 1e-3)
    true_in = select_within_range(evEigh, eMin, eMax)[0]
    m0 = 6
    rng = np.random.RandomState(5)
    options = {"linearSystemArgs": {
        "linearSolver": "gmres", "linearIter": 2000, "linear_tol": 1e-3,
        "errorOnNonConvergence": False}}
    import scipy.linalg as la
    Y1 = la.qr(rng.rand(H.shape[0], m0), mode="economic")[0]
    Y = [JaxVector(Y1[:, i], options) for i in range(m0)]
    ev, uv, status = feastDiagonalization(
        op, Y, 8, "legendre", float(eMin), float(eMax), 1e-8, 20,
        writeOut=False)
    for target in true_in:
        nearest = ev[np.argmin(np.abs(ev - target))]
        assert abs(nearest - target) <= 1e-6 * max(1.0, abs(target))


def test_ch3cn_cut_spectrum():
    """2-mode CH3CN cut: harmonic part dominates; fundamental spacings near
    w11=361 cm-1 for the lowest modes kept."""
    op, spec, bases = ch3cn_operator(N=8, nModesCut=2)
    H = np.asarray(op.to_dense())
    np.testing.assert_allclose(H, H.T.conj(), atol=1e-12)
    ev = np.linalg.eigvalsh(H)
    ev_cm = au2unit(ev - ev[0], "cm-1")
    # first excitation of the cut (modes x1, x2: w1=3065, w2=2297) ≈ w2
    assert 2000 < ev_cm[1] < 2600
