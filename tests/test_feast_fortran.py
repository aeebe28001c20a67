"""Golden-file validation against Polizzi's Fortran FEAST code.

The data file (tests/data/data_fortranCode.out) stores, for a fixed 4×4
matrix and contour [3, 5] with nc=8 Gauss-Legendre nodes and ellipse factor
0.3: the nodes, weights, angles θ_k, contour points z_k, the per-node exact
solves Qe = (z_k I - A)^{-1} Y, and the running accumulated quadrature Q.
Our framework must reproduce all of them through its own quadrature + solve
path (rtol 1e-5, under the Fortran code's node ordering).

Strategy parity: reference unittests/test_feast_fortran.py:14-127 — this is
the bit-level numerical contract for the FEAST quadrature (SURVEY.md §4).
"""

import math
import os

import numpy as np
import pytest

from eigensolvers_tpu import JaxVector, quadraturePointsWeights
from eigensolvers_tpu.solvers.feast import calculateQuadrature, updateQ

FILENAME = os.path.join(os.path.dirname(__file__), "data", "data_fortranCode.out")

RMIN, RMAX = 3.0, 5.0
NC = 8
EFACTOR = 0.3
# Fortran orders nodes differently from numpy's leggauss; fixed permutation
ORDER = [4, 3, 5, 2, 6, 1, 7, 0]


def read_fortran(k=0):
    amat = np.loadtxt(FILENAME, dtype=float, skiprows=1, max_rows=4)
    guess = np.loadtxt(FILENAME, dtype=complex, skiprows=6, max_rows=3)
    xe = np.loadtxt(FILENAME, dtype=float, skiprows=12, max_rows=8)
    we = np.loadtxt(FILENAME, dtype=float, skiprows=22, max_rows=8)
    theta = np.loadtxt(FILENAME, dtype=float, skiprows=32, max_rows=8)
    zne = np.loadtxt(FILENAME, dtype=complex, skiprows=42, max_rows=8)
    Qe = np.loadtxt(FILENAME, dtype=complex, skiprows=62 + k * 5, max_rows=3)
    Q = np.loadtxt(FILENAME, dtype=float, skiprows=102 + k * 5, max_rows=3)
    return amat, guess, xe, we, theta, zne, Qe, Q


@pytest.fixture(scope="module")
def data():
    amat, guess, xe, we, theta, zne, _, _ = read_fortran()
    options = {"linearSystemArgs": {"linearSolver": "exact"}}
    Y = [JaxVector(guess[i, :], options) for i in range(3)]
    return dict(A=amat, Y=Y, xe=xe, we=we, theta=theta, zne=zne)


def _nodes():
    gk, wk = quadraturePointsWeights(NC, "legendre", positiveHalf=False)
    thetas = -(np.pi * 0.5) * (gk - 1.0)
    r = abs(RMAX - RMIN) * 0.5
    zs = ((RMIN + RMAX) * 0.5
          + r * np.cos(thetas) + r * EFACTOR * 1.0j * np.sin(thetas))
    return gk, wk, thetas, zs, r


def test_legendre_points(data):
    gk, wk, _, _, _ = _nodes()
    np.testing.assert_allclose(data["xe"], gk[ORDER], rtol=1e-5, atol=0)
    np.testing.assert_allclose(data["we"], wk[ORDER], rtol=1e-5, atol=0)


def test_theta(data):
    _, _, thetas, _, _ = _nodes()
    np.testing.assert_allclose(data["theta"], thetas[ORDER], rtol=1e-5, atol=0)


def test_zne(data):
    _, _, _, zs, _ = _nodes()
    np.testing.assert_allclose(data["zne"], zs[ORDER], rtol=1e-5, atol=0)


def test_Qe(data):
    """Per-node exact solves (z_k I - A)^{-1} Y vs the Fortran oracle."""
    _, _, _, zs, _ = _nodes()
    zs = zs[ORDER]
    for k in range(NC):
        fQe = read_fortran(k)[6]
        Qe = np.empty((3, 4), dtype=complex)
        for im0 in range(3):
            Qe[im0] = np.asarray(
                JaxVector.solve(data["A"], data["Y"][im0], zs[k]).array)
        np.testing.assert_allclose(Qe, fQe, rtol=1e-5, atol=0)


def test_Q_accumulation(data):
    """Running quadrature accumulation vs the Fortran oracle."""
    _, wk, thetas, _, r = _nodes()
    thetas = thetas[ORDER]
    wk = wk[ORDER]
    Q = [np.nan] * 3
    for k in range(NC):
        fQ = read_fortran(k)[7]
        z = ((RMIN + RMAX) * 0.5
             + r * math.cos(thetas[k]) + r * EFACTOR * 1.0j * math.sin(thetas[k]))
        for im0 in range(3):
            Qquad_k = calculateQuadrature(
                data["A"], data["Y"][im0], z, r, thetas[k], wk[k], EFACTOR)
            Q = updateQ(Q, im0, Qquad_k, k)
        for im0 in range(3):
            np.testing.assert_allclose(np.asarray(Q[im0].array), fQ[im0],
                                       rtol=1e-5, atol=0)
