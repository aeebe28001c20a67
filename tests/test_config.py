"""Typed configuration layer (config.py): dict round-trips, backend
constructor acceptance, and entry-point configs (VERDICT r3 item 5 — the
typed layer must be WIRED, not decoration)."""

import numpy as np
import pytest

from eigensolvers_tpu import (CompressOptions, FeastConfig, JaxVector,
                              LanczosConfig, LinearSystemOptions,
                              NumpyVector, VectorOptions, normalize_options,
                              select_within_range)
from eigensolvers_tpu.models.synthetic import known_spectrum_matrix


def test_linear_system_options_roundtrip_lossless():
    d = {"linearSolver": "gmres", "linearIter": 500, "linear_tol": 1e-6,
         "linear_atol": 0.0, "gmresRestart": 20,
         "errorOnNonConvergence": False,
         # keys outside the typed surface must survive the round trip
         "preconditioner": "jacobi", "escalateIter": 2, "nSweep": 3}
    opts = LinearSystemOptions.from_options(d)
    assert opts.linearSolver == "gmres"
    assert opts.extra["preconditioner"] == "jacobi"
    assert opts.to_options() == d


def test_vector_options_roundtrip_lossless():
    d = {"linearSystemArgs": {"linearSolver": "minres", "linearIter": 100,
                              "linear_tol": 1e-4, "linear_atol": 1e-4,
                              "gmresRestart": 30,
                              "errorOnNonConvergence": True},
         "compressArgs": {"maxD": 12, "eps": 1e-9},
         "stateFittingArgs": {"maxD": 8, "eps": 1e-8, "nSweep": 4},
         "customKey": {"x": 1}}
    v = VectorOptions.from_options(d)
    assert v.compressArgs.maxD == 12
    assert v.stateFittingArgs.extra == {"nSweep": 4}
    assert v.to_options() == d


def test_backends_accept_typed_options():
    vo = VectorOptions(linearSystemArgs=LinearSystemOptions(
        linearSolver="minres", linearIter=321, linear_tol=1e-5))
    for cls in (JaxVector, NumpyVector):
        v = cls(np.ones(8), vo)
        ls = v.options["linearSystemArgs"]
        assert ls["linearIter"] == 321 and ls["linear_tol"] == 1e-5
        # backend defaulting still applies on top
        assert "errorOnNonConvergence" in ls


def test_mps_backend_accepts_typed_options():
    from eigensolvers_tpu import MPSVector
    vo = VectorOptions(
        linearSystemArgs=LinearSystemOptions(linearIter=77),
        compressArgs=CompressOptions(maxD=5, eps=1e-7))
    t = [np.random.RandomState(0).rand(1, 3, 1) for _ in range(2)]
    t = [t[0], np.random.RandomState(1).rand(1, 3, 1)]
    v = MPSVector(t, vo)
    assert v.options["compressArgs"]["maxD"] == 5
    assert v.options["linearSystemArgs"]["linearIter"] == 77
    # MPS defaulting chains compress maxD into the solve args unless given
    assert v.options["linearSystemArgs"]["maxD"] == 5


def test_normalize_options_passthrough():
    assert normalize_options(None) == {}
    d = {"linearSystemArgs": {"linearIter": 9}}
    assert normalize_options(d) == d and normalize_options(d) is not d


def test_lanczos_config_runs():
    H, ev = known_spectrum_matrix(64, eigenvalues=np.linspace(1, 100, 64),
                                  seed=0)
    rng = np.random.RandomState(1)
    Y0 = JaxVector(rng.rand(64), VectorOptions(
        linearSystemArgs=LinearSystemOptions(
            linearIter=2000, linear_tol=1e-5, errorOnNonConvergence=False)))
    cfg = LanczosConfig(sigma=30.0, L=6, maxit=4, eConv=1e-6, writeOut=False)
    evL, YL, st = cfg.run(np.asarray(H), Y0)
    truth = ev[np.argmin(np.abs(np.asarray(ev) - 30.0))]
    assert abs(evL[np.argmin(np.abs(evL - 30.0))] - truth) < 1e-4


def test_feast_config_runs():
    import scipy.linalg as la
    H, ev = known_spectrum_matrix(100, eigenvalues=np.linspace(1, 200, 100),
                                  seed=1212)
    rng = np.random.RandomState(3)
    Yg = la.qr(rng.rand(100, 6), mode="economic")[0]
    Y = [JaxVector(Yg[:, i], VectorOptions(
        linearSystemArgs=LinearSystemOptions(
            linearIter=2000, linear_tol=1e-6, errorOnNonConvergence=False)))
         for i in range(6)]
    cfg = FeastConfig(nc=8, quad="legendre", eMin=160.0, eMax=166.0,
                      eConv=1e-10, maxit=10, writeOut=False)
    evF, _, st = cfg.run(np.asarray(H), Y)
    truth = select_within_range(np.asarray(ev), 160.0, 166.0)[0]
    got = np.sort(select_within_range(np.asarray(evF), 160.0, 166.0)[0])
    assert len(got) >= len(truth)
    for t in truth:
        assert min(abs(got - t)) < 1e-4
