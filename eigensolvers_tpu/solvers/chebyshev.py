"""Chebyshev-filtered subspace iteration — the polynomial (solve-free)
window eigensolver.

Framework extension beyond the reference (which has only the two
solve-based algorithms, inexact Lanczos + FEAST): the rational contour
filter of FEAST (reference: feast.py:126-244) is replaced by a damped
Chebyshev polynomial approximation of the window indicator function
1_{[eMin,eMax]}(H).  Each outer iteration is then a pure chain of
operator applications — no inner linear solves at all — which is the
shape TPUs like best: the whole degree-d filter application over the m0
subspace vectors is ONE jitted `lax.fori_loop` whose body is a single
batched matvec (an MXU matmul for dense/BSR operators, the Kronecker
apply for SoP), with zero host round trips.

Algorithm (Zhou, Saad, Tiago & Chelikowsky, J. Comput. Phys. 219, 172
(2006) for the filtered-subspace-iteration scheme; Jackson damping after
Weiße et al., Rev. Mod. Phys. 78, 275 (2006) — both public-literature
techniques):

  repeat:  W <- p_d(H) Y   (Chebyshev recurrence, Jackson-damped window
                            indicator on the spectral interval [a, b])
           Rayleigh-Ritz in span(W): Löwdin + projected eigh
           Y <- Ritz vectors; converge on the in-window eigenvalue
           residual exactly like FEAST

The convergence machinery (Löwdin orthogonalization with lindep-driven
subspace shrink, nearest-matching of reference eigenvalues, residual
restricted to the window, status dict, two-file reporting) deliberately
mirrors `feastDiagonalization` so the two window solvers are drop-in
replacements for each other.

When to prefer it over FEAST: whenever matvecs are cheap relative to
solves — wide windows, well-separated spectra, or operators whose shifted
systems are ill-conditioned (contour nodes near the real axis).  FEAST
remains stronger for very narrow windows deep inside a dense spectrum
(the rational filter's resolution is set by the contour, not by a
polynomial degree).
"""

from __future__ import annotations

import math
import time
import warnings
from typing import List, Optional, Sequence

import numpy as np

from ..utils.status import feast_status
from ..utils.subspace import (
    eigenvalueResidual,
    lowdinOrthoMatrix,
    diagonalizeHamiltonian,
)
from ..utils.reporting import FeastReporter
from ..utils.profiling import PhaseTimer

__all__ = [
    "chebyshevFilteredDiagonalization",
    "chebyshev_window_coefficients",
    "estimate_spectral_bounds",
]


def chebyshev_window_coefficients(degree: int, a: float, b: float,
                                  eMin: float, eMax: float,
                                  jackson: bool = True) -> np.ndarray:
    """Chebyshev expansion coefficients of the window indicator.

    Expands 1_{[eMin,eMax]} on the spectral interval [a, b] (mapped to
    t in [-1, 1]) in Chebyshev polynomials T_k, k = 0..degree:

        c_0 = (theta_lo_hi span)/pi,   c_k = 2 (sin k*th_hi - sin k*th_lo)/(k pi)

    with th = acos(t) and optional Jackson damping factors g_k (kills the
    Gibbs oscillation of the truncated series; essential for a filter —
    undamped lobes outside the window re-amplify unwanted eigenvectors).
    """
    if not (a < eMin < eMax < b):
        raise ValueError(
            f"window [{eMin}, {eMax}] must lie strictly inside the "
            f"spectral interval [{a}, {b}]")
    c = (a + b) * 0.5
    h = (b - a) * 0.5
    t_lo = (eMin - c) / h
    t_hi = (eMax - c) / h
    th_hi = math.acos(t_lo)          # acos is decreasing: t_lo -> larger angle
    th_lo = math.acos(t_hi)
    k = np.arange(1, degree + 1, dtype=np.float64)
    coeffs = np.empty(degree + 1)
    coeffs[0] = (th_hi - th_lo) / math.pi
    coeffs[1:] = 2.0 * (np.sin(k * th_hi) - np.sin(k * th_lo)) / (k * math.pi)
    if jackson:
        d1 = degree + 1
        g = ((d1 - k + 1) * np.cos(math.pi * k / d1)
             + np.sin(math.pi * k / d1) / math.tan(math.pi / d1)) / d1
        coeffs[1:] *= g
    return coeffs


def estimate_spectral_bounds(op, n: int, iters: int = 30, seed: int = 0,
                             dtype=np.float64):
    """Safe [a, b] enclosing the spectrum of the Hermitian ``op`` via a short
    Lanczos run (host-orchestrated; ``iters`` matvecs) with the standard
    residual-based safety margin b_est + ||r|| (Zhou & Li, upper-bound
    lemma)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    v = jnp.asarray(rng.rand(n).astype(dtype))
    v = v / jnp.linalg.norm(v)
    alphas, betas = [], []
    v_prev = jnp.zeros_like(v)
    beta = 0.0
    mv = jax.jit(op.matvec)
    for _ in range(iters):
        w = mv(v)
        alpha = float(jnp.vdot(v, w).real)
        w = w - alpha * v - beta * v_prev
        alphas.append(alpha)
        new_beta = float(jnp.linalg.norm(w))
        if new_beta < 1e-12:
            beta = 0.0
            break
        v_prev, v, beta = v, w / new_beta, new_beta
        betas.append(new_beta)
    T = np.diag(alphas)
    for i, b_ in enumerate(betas[:len(alphas) - 1]):
        T[i, i + 1] = T[i + 1, i] = b_
    ritz = np.linalg.eigvalsh(T)
    margin = betas[-1] if betas else 0.0
    return float(ritz[0] - margin), float(ritz[-1] + margin)


def _filter_kernel_impl(op, W, cf, c, h):
    import jax
    import jax.numpy as jnp

    def scaled_apply(X):
        return (jax.vmap(op.matvec)(X) - c * X) / h

    def body(k, carry):
        Tkm1, Tk, acc = carry
        Tkp1 = 2.0 * scaled_apply(Tk) - Tkm1
        return Tk, Tkp1, acc + cf[k + 2] * Tkp1

    T0 = W
    T1 = scaled_apply(W)
    acc = cf[0] * T0 + cf[1] * T1
    _, _, acc = jax.lax.fori_loop(0, cf.shape[0] - 2, body, (T0, T1, acc))
    # normalize in-program (one fused kernel, no extra host sync)
    nrm = jnp.linalg.norm(acc, axis=1, keepdims=True)
    return acc / jnp.where(nrm > 0, nrm, 1.0)


def _filter_rr_kernel_impl(op, W, cf, c, h):
    """Filter + Rayleigh-Ritz assembly in ONE device program: returns
    (W_filtered, packed) with packed = stack([S, Hm]) so the host fetches a
    single small (2, m0, m0) array per outer iteration — on remote-executor
    platforms the per-fetch RPC latency (~0.1-0.4 s measured through the
    tunnel) dominated the split S/Hm/W fetch layout (round-4 bench: RR
    phase 0.5-1.2 s/iter, mostly the small-matrix fetches)."""
    import jax
    import jax.numpy as jnp

    Wf = _filter_kernel_impl(op, W, cf, c, h)
    hi = jax.lax.Precision.HIGHEST
    # mixed precision (same design as the split path): filter at the state
    # dtype, subspace assembly promoted to f64 when x64 is live (f32
    # products are exact in f64; only the reduction rounds) — trace-time
    # dtype selection, so jit specializes per input dtype
    x64 = jnp.zeros((), jnp.float64).dtype == np.float64
    if x64:
        rr = jnp.complex128 if jnp.iscomplexobj(Wf) else jnp.float64
        Wrr = Wf.astype(rr)
    else:
        Wrr = Wf
    AW = jax.vmap(op.matvec)(Wrr)
    S = jnp.matmul(Wrr.conj(), Wrr.T, precision=hi)
    Hm = jnp.matmul(Wrr.conj(), AW.T, precision=hi)
    Hm = 0.5 * (Hm + Hm.conj().T)
    return Wf, jnp.stack([S, Hm])


_FILTER_KERNEL = None
_APPLY_STACK = None


def _filter_stack(op, W, coeffs, a, b):
    """Normalized p_d(op) @ W for the stacked subspace W (m0, n) — one
    jitted three-term Chebyshev recurrence; the loop body is a single
    batched matvec.  Operators are jax pytrees, so one compilation serves
    every outer iteration (and every problem of the same shapes)."""
    import jax
    import jax.numpy as jnp

    global _FILTER_KERNEL
    if _FILTER_KERNEL is None:
        _FILTER_KERNEL = jax.jit(_filter_kernel_impl)
    cf = jnp.asarray(coeffs, W.dtype)
    c = jnp.asarray((a + b) * 0.5, W.dtype)
    h = jnp.asarray((b - a) * 0.5, W.dtype)
    return _FILTER_KERNEL(op, W, cf, c, h)


def chebyshevFilteredDiagonalization(
        A, Y: List, degree: int, eMin: float, eMax: float,
        eConv: float, maxit: int,
        specBounds: Optional[Sequence[float]] = None,
        jackson: bool = True,
        writeOut: bool = True, eShift: float = 0.0, convertUnit: str = "au",
        outFileName: Optional[str] = None, summaryFileName: Optional[str] = None,
        status: Optional[dict] = None):
    """All eigenpairs of the Hermitian ``A`` inside [eMin, eMax] by
    Chebyshev-filtered subspace iteration (see module docstring).

    Same call/return shape as :func:`feastDiagonalization`: ``(ev, Y,
    status)`` with the FEAST status keys; ``degree`` replaces FEAST's
    ``nc``/``quad``.  ``Y`` must be an array-backed backend (JaxVector /
    ShardedVector / NumpyVector — the polynomial filter is a dense-subspace
    method; compressed backends should use FEAST, whose per-solve
    truncation is what makes them inexact-friendly).

    :param specBounds: (a, b) enclosing the FULL spectrum; estimated with a
        short Lanczos run when None.
    """
    import jax
    import jax.numpy as jnp

    vec_cls = type(Y[0])
    if not hasattr(Y[0], "array"):
        raise TypeError(
            "chebyshevFilteredDiagonalization needs an array-backed "
            f"backend, got {vec_cls.__name__}; use feastDiagonalization "
            "for compressed backends")
    options = Y[0].options
    mesh = getattr(Y[0], "mesh", None)
    m0 = len(Y)
    n = len(np.ravel(np.asarray(Y[0].array)))

    # backend coercion: ShardedVector pads/row-shards, JaxVector device-puts
    op = vec_cls._as_operator(A, Y[0]) if hasattr(vec_cls, "_as_operator") \
        else A

    if specBounds is None:
        specBounds = estimate_spectral_bounds(
            op, n, dtype=np.result_type(Y[0].dtype, np.float32))
    a, b = float(specBounds[0]), float(specBounds[1])
    # keep the window strictly inside the interval even for user bounds
    pad = 1e-3 * (b - a)
    a = min(a, eMin - pad)
    b = max(b, eMax + pad)
    coeffs = chebyshev_window_coefficients(degree, a, b, eMin, eMax, jackson)

    status = feast_status(status, Y)
    status["degree"] = degree
    status["specBounds"] = (a, b)
    printObj = FeastReporter(Y, degree, "chebyshev", eMin, eMax, eConv,
                             maxit, status.get("writeOut", writeOut), eShift,
                             convertUnit, status, outFileName,
                             summaryFileName)
    printObj.fileHeader()

    W = jnp.stack([jnp.ravel(jnp.asarray(y.array)) for y in Y])
    N_SUBSPACE = m0
    ev = np.full(m0, np.nan)
    ref_ev = None
    timer = PhaseTimer()

    for it in range(maxit):
        status["outerIter"] = it
        status["quadrature"] = degree      # reporter's per-iteration counter

        with timer.phase("filter_apply"):
            W = _filter_stack(op, W, coeffs, a, b)

        with timer.phase("rayleigh_ritz"):
            hi = jax.lax.Precision.HIGHEST   # true f32 on TPU MXUs (bf16x6),
            # matching the per-operator precision convention (PARITY.md).
            # Mixed precision: the filter recurrence stays at the state
            # dtype (the hot cost — `degree` matvecs), but S/Hm accumulate
            # in f64 (f32 products are exact in f64; only the reduction
            # rounds).  An all-f32 assembly floors the Rayleigh-Ritz
            # eigenvalues at ~6e-4 for ||H||~10^3 — above the 1e-4
            # correctness gate; same design as the FEAST carry
            # (solvers/fast_feast.py).
            ptype = None
            if jnp.zeros((), jnp.float64).dtype == np.float64:   # x64 on
                ptype = np.complex128 if jnp.iscomplexobj(W) else np.float64
            # the RR matvecs run in f64 too (m0 promoted matvecs — trivial
            # next to the `degree` f32 filter matvecs): an f32-rounded AW
            # floors the Ritz values at ~3e-4 for ||H||~10^3 (measured),
            # because the deterministic f32 filter gives a fixed point
            # whose systematic error the RR step cannot average away.
            Wrr = W.astype(ptype) if ptype else W
            AW = _apply_stack(op, Wrr)
            Smat = np.asarray(jnp.matmul(Wrr.conj(), Wrr.T, precision=hi))
            Hmat = np.asarray(jnp.matmul(Wrr.conj(), AW.T, precision=hi))
            Hmat = 0.5 * (Hmat + Hmat.conj().T)

        printObj.writeFile("iteration", status)
        printObj.writeFile("overlap", Smat)

        status, uS = lowdinOrthoMatrix(Smat, status)
        ev, uv = diagonalizeHamiltonian(uS, Hmat, printObj)
        uSH = uS @ uv
        # stacked basis transformation: Y_j = sum_i uSH[i, j] W_i
        W = jnp.matmul(jnp.asarray(uSH.T, W.dtype), W,
                       precision=jax.lax.Precision.HIGHEST)

        if it != 0:
            if len(ref_ev) > len(ev):
                indices = np.argmin(np.abs(ref_ev[:, None] - ev[None, :]),
                                    axis=0)
                ref_ev = ref_ev[indices]
            elif len(ref_ev) < len(ev):
                raise RuntimeError(f"{ref_ev=} but {ev=}. Enlarged space?")
            residual = eigenvalueResidual(ev, ref_ev, [eMin, eMax])
            status["runTime"] = time.time() - status["startTime"]
            status["residual"] = residual
            printObj.writeFile("summary", ev, residual, status)
            if residual < eConv:
                if ptype is not None and W.dtype != ptype:
                    # mixed-precision polish: the f32 filter is
                    # deterministic, so its fixed point carries a
                    # systematic ~2.5e-4 span error (measured, ||H||~10^3)
                    # that more f32 iterations cannot reduce.  Upcast the
                    # carry and run ONE f64 filter+RR iteration — `degree`
                    # promoted matvecs, paid once at convergence.
                    W = W.astype(ptype)
                    ref_ev = ev
                    N_SUBSPACE = W.shape[0]
                    continue
                status["isConverged"] = True
                break

        if N_SUBSPACE != W.shape[0]:
            warnings.warn(
                f"Alert! Got {N_SUBSPACE - W.shape[0]} dependent vectors")
        N_SUBSPACE = W.shape[0]
        ref_ev = ev

    status["timers"] = timer.summary()
    printObj.writeFile("results", ev)
    printObj.fileFooter()
    printObj.close()

    rows = [np.asarray(W[i]) for i in range(W.shape[0])]
    if mesh is not None:
        out = [vec_cls(r, options, mesh=mesh) for r in rows]
    else:
        out = [vec_cls(r, options) for r in rows]
    return ev, out, status


def _apply_stack(op, W):
    import jax

    global _APPLY_STACK
    if _APPLY_STACK is None:
        _APPLY_STACK = jax.jit(lambda op, X: jax.vmap(op.matvec)(X))
    return _APPLY_STACK(op, W)
