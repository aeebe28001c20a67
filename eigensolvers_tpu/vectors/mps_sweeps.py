"""Two-site ALS (DMRG-style) sweep solver for shifted linear systems in MPS
form: (sign) * (sigma*I - H) x = b.

This is the algorithmic counterpart of the reference's external sweep engine
(reference: ttnsVector.py:169-196 builds ``SumOfOperators([H, sigma*I])`` and
runs a ``ttns2.sweepAlgorithms.LinearSystem`` sweep): the solution MPS is
optimized two sites at a time against exact left/right environments of the
MPO and the RHS, each local system solved iteratively, and the two-site
tensor split by SVD with ``maxD``/``eps`` truncation — which is where bond
adaptation (the reference's ``TruncationEps``) happens.

Conventions:
  * MPS site tensors (Dl, n, Dr); MPO site tensors (Wl, n_out, n_in, Wr)
    (as built by :class:`eigensolvers_tpu.vectors.mps.MPO`);
  * the solver works on the operator A = sign*(sigma*I - H) directly through
    its environments — H is never materialized.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import scipy.sparse.linalg as spla


def _env_left_op(L, xk_bra, Wk, xk_ket):
    """L (a_bra, w, a_ket) extended by one site of <x|W|x>."""
    # t1: (w, a_ket, n_bra, A_bra)
    t1 = np.tensordot(L, xk_bra.conj(), axes=([0], [0]))   # (w, a_ket, n, A)
    # contract W over (w, n_bra): W (w, n_out, n_in, w')
    t2 = np.tensordot(t1, Wk, axes=([0, 2], [0, 1]))       # (a_ket, A, n_in, w')
    # contract ket tensor over (a_ket, n_in)
    t3 = np.tensordot(t2, xk_ket, axes=([0, 2], [0, 1]))   # (A, w', A_ket)
    return t3


def _env_right_op(R, xk_bra, Wk, xk_ket):
    """R (b_bra, w, b_ket) extended leftwards."""
    t1 = np.tensordot(xk_bra.conj(), R, axes=([2], [0]))   # (A, n, w, b_ket)
    t2 = np.tensordot(Wk, t1, axes=([1, 3], [1, 2]))       # (w_l, n_in, A, b_ket)
    # xk_ket (B, n_in, b_ket): contract its n_in and b_ket
    t3 = np.tensordot(t2, xk_ket, axes=([1, 3], [1, 2]))   # (w_l, A, B_ket)
    return np.transpose(t3, (1, 0, 2))                     # (A_bra, w_l, B_ket)


def _env_left_rhs(Lb, xk_bra, bk):
    """Lb (a_bra, c) extended by <x|b> one site."""
    t1 = np.tensordot(Lb, xk_bra.conj(), axes=([0], [0]))  # (c, n, A)
    return np.tensordot(t1, bk, axes=([0, 1], [0, 1]))     # (A, c')


def _env_right_rhs(Rb, xk_bra, bk):
    t1 = np.tensordot(xk_bra.conj(), Rb, axes=([2], [0]))  # (A, n, c)
    return np.tensordot(t1, bk, axes=([1, 2], [1, 2]))     # (A, C)


def _local_matvec(L, W1, W2, R, v, sigma, sign):
    """Apply sign*(sigma*I - H_eff) to the two-site tensor v
    (Dl, n1, n2, Dr)."""
    t = np.tensordot(L, v, axes=([2], [0]))                # (a_bra, w, n1, n2, Dr)
    t = np.tensordot(t, W1, axes=([1, 2], [0, 2]))         # (a_bra, n2, Dr, m1, w')
    t = np.tensordot(t, W2, axes=([4, 1], [0, 2]))         # (a_bra, Dr, m1, m2, w'')
    t = np.tensordot(t, R, axes=([4, 1], [1, 2]))          # (a_bra, m1, m2, b_bra)
    Hv = np.transpose(t, (0, 1, 2, 3))
    return sign * (sigma * v - Hv)


def _local_rhs(Lb, b1, b2, Rb):
    """Project the RHS onto the two-site basis: (Dl, n1, n2, Dr)."""
    t = np.tensordot(Lb, b1, axes=([1], [0]))              # (A, n1, c)
    t = np.tensordot(t, b2, axes=([2], [0]))               # (A, n1, n2, c')
    t = np.tensordot(t, Rb, axes=([3], [1]))               # (A, n1, n2, B)
    return t


def _split_two_site(theta, maxD: Optional[int], eps: float):
    """SVD-split a solved two-site tensor; returns (left (Dl,n1,k),
    right (k,n2,Dr)) with the singular values absorbed right."""
    Dl, n1, n2, Dr = theta.shape
    mat = theta.reshape(Dl * n1, n2 * Dr)
    u, s, vh = np.linalg.svd(mat, full_matrices=False)
    keep = len(s)
    if eps > 0.0:
        tot = np.sum(s ** 2)
        if tot > 0:
            csum = np.cumsum((s ** 2)[::-1])[::-1]
            keep = max(1, int(np.sum(csum > eps ** 2 * tot)))
    if maxD is not None:
        keep = min(keep, maxD)
    u = u[:, :keep]
    sv = (s[:keep, None] * vh[:keep])
    return u.reshape(Dl, n1, keep), sv.reshape(keep, n2, Dr)


def dmrg_eigensolve(mpo_tensors: List[np.ndarray], dims: List[int],
                    x0: Optional[List[np.ndarray]] = None,
                    nStates: int = 1,
                    maxD: Optional[int] = 32, eps: float = 1e-10,
                    nSweep: int = 30, convTol: float = 1e-9,
                    seed: int = 0, dtype=np.float64):
    """Two-site DMRG eigensweep: lowest ``nStates`` eigenpairs of the MPO.

    Fills the guess-generation role of the reference's external
    ``ttns2.eigenStateComputations`` DMRG runs (reference:
    unittests/test_feast_ttns.py:64-73): ground/low-lying states as MPSs,
    usable directly as Lanczos/FEAST guesses.  Excited states are obtained
    by deflation: each subsequent state is optimized in the complement of
    the previous ones (projector penalty in the local problem).

    :returns: (energies list, list of MPS tensor-lists)
    """
    from .mps import mps_random, mps_vdot

    energies = []
    states = []
    for istate in range(nStates):
        e, x = _dmrg_one_state(mpo_tensors, dims,
                               x0 if istate == 0 else None,
                               states, maxD, eps, nSweep, convTol,
                               seed + istate, dtype)
        energies.append(e)
        states.append(x)
    return energies, states


def _dmrg_one_state(mpo_tensors, dims, x0, lower_states, maxD, eps,
                    nSweep, convTol, seed, dtype):
    from .mps import mps_random, mps_vdot

    W = [w.astype(dtype) for w in mpo_tensors]
    Lsites = len(dims)
    if x0 is not None:
        x = [t.astype(dtype).copy() for t in x0]
    else:
        x = mps_random(dims, maxD or 8, seed=seed, dtype=dtype)

    if Lsites == 1:
        Hfull = W[0][0, :, :, 0]
        ev, uv = np.linalg.eigh(Hfull)
        return float(ev[0]), [uv[:, 0].reshape(1, dims[0], 1)]

    # right-canonicalize
    for k in range(Lsites - 1, 0, -1):
        Dl, n, Dr = x[k].shape
        q, r = np.linalg.qr(x[k].reshape(Dl, n * Dr).conj().T)
        x[k] = q.conj().T.reshape(q.shape[1], n, Dr)
        x[k - 1] = np.tensordot(x[k - 1], r.conj().T, axes=([2], [0]))
    nrm = np.sqrt(abs(mps_vdot(x, x)))
    x[0] = x[0] / nrm

    Lop = [None] * (Lsites + 1)
    Rop = [None] * (Lsites + 1)
    Lop[0] = np.ones((1, 1, 1), dtype)
    Rop[Lsites - 1] = np.ones((1, 1, 1), dtype)
    for k in range(Lsites - 1, 1, -1):
        Rop[k - 1] = _env_right_op(Rop[k], x[k], W[k], x[k])

    # deflation environments against previously found states
    def proj_envs():
        envs = []
        for s in lower_states:
            Lp = [None] * (Lsites + 1)
            Rp = [None] * (Lsites + 1)
            Lp[0] = np.ones((1, 1), dtype)
            Rp[Lsites - 1] = np.ones((1, 1), dtype)
            for k in range(Lsites - 1, 1, -1):
                Rp[k - 1] = _env_right_rhs(Rp[k], x[k], s[k])
            envs.append((s, Lp, Rp))
        return envs

    penv = proj_envs()
    PENALTY = 100.0 * max(1.0, float(np.max(
        [np.abs(w).max() for w in W])))

    def solve_pair(k, theta0, tol):
        shape = theta0.shape
        size = int(np.prod(shape))
        Lk, Rk = Lop[k], Rop[k + 1]

        # deflation: orthonormal basis D of the lower states in the local
        # two-site basis, applied as a HARD projection P = I - D D^H —
        # the local operator becomes P H_eff P + PENALTY (I - P), whose
        # deflated directions are exact eigendirections at PENALTY, so the
        # local ground state is exactly orthogonal to them (the soft
        # penalty H_eff + PENALTY*D D^H of round 1 only suppressed them)
        dvs = []
        for s, Lp, Rp in penv:
            v = _local_rhs(Lp[k], s[k], s[k + 1], Rp[k + 1]).ravel()
            nv = np.linalg.norm(v)
            if nv > 1e-14:
                dvs.append(v / nv)
        D = None
        if dvs:
            Q, R = np.linalg.qr(np.column_stack(dvs))
            keep = np.abs(np.diag(R)) > 1e-12
            D = Q[:, keep] if keep.any() else None

        def project(vflat):
            return vflat - D @ (D.conj().T @ vflat)

        if D is not None:
            t0 = project(theta0.ravel())
            nt = np.linalg.norm(t0)
            if nt < 1e-12:      # start lies inside the deflated space
                rng_loc = np.random.RandomState(k)
                t0 = project(rng_loc.standard_normal(size).astype(dtype))
                nt = np.linalg.norm(t0)
            theta0 = (t0 / nt).reshape(shape) * np.linalg.norm(theta0)

        def mv(vflat):
            v = (project(vflat) if D is not None else vflat).reshape(shape)
            t = np.tensordot(Lk, v, axes=([2], [0]))
            t = np.tensordot(t, W[k], axes=([1, 2], [0, 2]))
            t = np.tensordot(t, W[k + 1], axes=([4, 1], [0, 2]))
            t = np.tensordot(t, Rk, axes=([4, 1], [1, 2]))
            out = t.ravel()
            if D is not None:
                out = project(out) + PENALTY * (vflat - project(vflat))
            return out

        A = spla.LinearOperator((size, size), matvec=mv, dtype=dtype)
        if size <= 4:
            dense = np.column_stack(
                [mv(e) for e in np.eye(size, dtype=dtype)])
            evs, uvs = np.linalg.eigh((dense + dense.conj().T) / 2)
            return float(evs[0]), uvs[:, 0].reshape(shape)

        # Jacobi-preconditioned LOBPCG: diag(H_eff) from the environment
        # diagonals; essential for Hamiltonians whose local spectral range
        # dwarfs the gap (anharmonic PES on wide DVR grids).
        dL = np.einsum("awa->aw", Lk)
        dW1 = np.einsum("wiix->wix", W[k])
        dW2 = np.einsum("xjjy->xjy", W[k + 1])
        dR = np.einsum("bwb->bw", Rk)
        diag = np.einsum("aw,wix,xjy,by->aijb", dL, dW1, dW2, dR,
                         optimize=True).ravel()
        e0 = float(np.real(np.vdot(theta0.ravel(), mv(theta0.ravel()))) /
                   max(np.real(np.vdot(theta0.ravel(), theta0.ravel())),
                       1e-300))
        shift = diag - e0
        shift = np.where(np.abs(shift) < 1e-8, 1e-8, shift)

        def precond(vmat):
            return vmat / shift[:, None]

        M = spla.LinearOperator((size, size), matvec=lambda v:
                                (v / shift), matmat=precond, dtype=dtype)
        X = theta0.reshape(size, 1).astype(dtype)
        try:
            import warnings as _w
            with _w.catch_warnings():
                _w.simplefilter("ignore")
                evs, uvs = spla.lobpcg(A, X, M=M, tol=tol, maxiter=200,
                                       largest=False)
            return float(evs[0]), uvs[:, 0].reshape(shape)
        except Exception:
            try:
                ev, uv = spla.eigsh(A, k=1, which="SA", v0=theta0.ravel(),
                                    maxiter=400, tol=max(tol, 1e-8))
                return float(ev[0]), uv[:, 0].reshape(shape)
            except spla.ArpackNoConvergence as e:
                if len(e.eigenvalues):
                    return float(e.eigenvalues[0]), \
                        e.eigenvectors[:, 0].reshape(shape)
                return None, theta0

    energy = None
    for sweep in range(nSweep):
        # local-solve tolerance schedule: loose while the state is far from
        # converged, tight for the final refinement sweeps
        loc_tol = 1e-4 if sweep < 2 else max(convTol * 1e-2, 1e-11)
        for k in range(Lsites - 1):
            theta0 = np.tensordot(x[k], x[k + 1], axes=([2], [0]))
            e, theta = solve_pair(k, theta0, loc_tol)
            left, right = _split_two_site(theta, maxD, eps)
            Dl, n1, kk = left.shape
            q, r = np.linalg.qr(left.reshape(Dl * n1, kk))
            x[k] = q.reshape(Dl, n1, q.shape[1])
            x[k + 1] = np.tensordot(r, right, axes=([1], [0]))
            Lop[k + 1] = _env_left_op(Lop[k], x[k], W[k], x[k])
            for s, Lp, Rp in penv:
                Lp[k + 1] = _env_left_rhs(Lp[k], x[k], s[k])
        for k in range(Lsites - 2, -1, -1):
            theta0 = np.tensordot(x[k], x[k + 1], axes=([2], [0]))
            e, theta = solve_pair(k, theta0, loc_tol)
            left, right = _split_two_site(theta, maxD, eps)
            kk, n2, Dr = right.shape
            q, r = np.linalg.qr(right.reshape(kk, n2 * Dr).conj().T)
            x[k + 1] = q.conj().T.reshape(q.shape[1], n2, Dr)
            x[k] = np.tensordot(left, r.conj().T, axes=([2], [0]))
            Rop[k] = _env_right_op(Rop[k + 1], x[k + 1], W[k + 1], x[k + 1])
            for s, Lp, Rp in penv:
                Rp[k] = _env_right_rhs(Rp[k + 1], x[k + 1], s[k + 1])
        if energy is not None and abs(e - energy) <= \
                convTol * max(1.0, abs(e)):
            energy = e
            break
        energy = e

    # normalize (center at site 0 after the right-to-left pass)
    from .mps import mps_vdot as _vd
    nrm = np.sqrt(abs(_vd(x, x)))
    x[0] = x[0] / nrm
    return energy, x


def als_solve(mpo_tensors: List[np.ndarray], b: List[np.ndarray], sigma,
              x0: Optional[List[np.ndarray]] = None,
              sign: float = 1.0,
              maxD: Optional[int] = 64, eps: float = 1e-10,
              nSweep: int = 20, convTol: float = 1e-6,
              local_tol: float = 1e-8, local_maxiter: int = 200,
              dtype=None) -> List[np.ndarray]:
    """Solve sign*(sigma*I - H) x = b by two-site ALS sweeps.

    :param mpo_tensors: MPO of H, site tensors (Wl, n_out, n_in, Wr)
    :param b: RHS MPS
    :param x0: initial guess (default: copy of b, reference convention
        ttnsVector.py:173-176)
    :param convTol: sweep convergence on the relative change of x between
        sweeps (overlap-based)
    :returns: solution MPS (right-canonical-ish, bonds adapted by SVD)
    """
    Lsites = len(b)
    dtype = dtype or np.result_type(
        np.asarray(sigma).dtype, *(t.dtype for t in b),
        *(w.dtype for w in mpo_tensors))
    x = [t.astype(dtype).copy() for t in (x0 if x0 is not None else b)]
    b = [t.astype(dtype) for t in b]
    W = [w.astype(dtype) for w in mpo_tensors]

    if Lsites == 1:
        # single site: dense solve in the full (tiny) space
        n = x[0].shape[1]
        Hfull = W[0][0, :, :, 0]
        A = sign * (sigma * np.eye(n, dtype=dtype) - Hfull)
        sol = np.linalg.solve(A, b[0][0, :, 0])
        return [sol.reshape(1, n, 1)]

    # right-canonicalize x so the initial environments are consistent
    for k in range(Lsites - 1, 0, -1):
        Dl, n, Dr = x[k].shape
        q, r = np.linalg.qr(x[k].reshape(Dl, n * Dr).conj().T)
        kdim = q.shape[1]
        x[k] = q.conj().T.reshape(kdim, n, Dr)
        x[k - 1] = np.tensordot(x[k - 1], r.conj().T, axes=([2], [0]))

    # environments: Lop[k] covers sites < k; Rop[k] covers sites > k
    Lop = [None] * (Lsites + 1)
    Rop = [None] * (Lsites + 1)
    Lb_ = [None] * (Lsites + 1)
    Rb_ = [None] * (Lsites + 1)
    Lop[0] = np.ones((1, 1, 1), dtype)
    Rop[Lsites - 1] = np.ones((1, 1, 1), dtype)
    Lb_[0] = np.ones((1, 1), dtype)
    Rb_[Lsites - 1] = np.ones((1, 1), dtype)
    for k in range(Lsites - 1, 1, -1):
        Rop[k - 1] = _env_right_op(Rop[k], x[k], W[k], x[k])
        Rb_[k - 1] = _env_right_rhs(Rb_[k], x[k], b[k])

    def solve_pair(k, theta0):
        Dl, n1, _, n2, Dr = (theta0.shape[0], theta0.shape[1], None,
                             theta0.shape[2], theta0.shape[3])
        shape = theta0.shape
        size = int(np.prod(shape))
        Lk, Rk = Lop[k], Rop[k + 1]
        Lbk, Rbk = Lb_[k], Rb_[k + 1]

        rhs = _local_rhs(Lbk, b[k], b[k + 1], Rbk)

        def mv(vflat):
            v = vflat.reshape(shape)
            return _local_matvec(Lk, W[k], W[k + 1], Rk, v, sigma,
                                 sign).ravel()

        A = spla.LinearOperator((size, size), matvec=mv, dtype=dtype)
        sol, info = spla.gcrotmk(A, rhs.ravel(), x0=theta0.ravel(),
                                 rtol=local_tol, atol=0.0,
                                 maxiter=local_maxiter)
        return sol.reshape(shape)

    prev = None
    for sweep in range(nSweep):
        # left -> right
        for k in range(Lsites - 1):
            theta0 = np.tensordot(x[k], x[k + 1], axes=([2], [0]))
            theta = solve_pair(k, theta0)
            left, right = _split_two_site(theta, maxD, eps)
            # left-orthonormalize `left` for a consistent env (QR)
            Dl, n1, kk = left.shape
            q, r = np.linalg.qr(left.reshape(Dl * n1, kk))
            x[k] = q.reshape(Dl, n1, q.shape[1])
            x[k + 1] = np.tensordot(r, right, axes=([1], [0]))
            Lop[k + 1] = _env_left_op(Lop[k], x[k], W[k], x[k])
            Lb_[k + 1] = _env_left_rhs(Lb_[k], x[k], b[k])
        # right -> left
        for k in range(Lsites - 2, -1, -1):
            theta0 = np.tensordot(x[k], x[k + 1], axes=([2], [0]))
            theta = solve_pair(k, theta0)
            left, right = _split_two_site(theta, maxD, eps)
            # right-orthonormalize `right`
            kk, n2, Dr = right.shape
            q, r = np.linalg.qr(right.reshape(kk, n2 * Dr).conj().T)
            x[k + 1] = q.conj().T.reshape(q.shape[1], n2, Dr)
            x[k] = np.tensordot(left, r.conj().T, axes=([2], [0]))
            Rop[k] = _env_right_op(Rop[k + 1], x[k + 1], W[k + 1], x[k + 1])
            Rb_[k] = _env_right_rhs(Rb_[k + 1], x[k + 1], b[k + 1])

        # sweep-to-sweep convergence via the center tensor change
        from .mps import mps_vdot
        nrm2 = abs(mps_vdot(x, x))
        if prev is not None:
            ovlp = abs(mps_vdot(prev, x))
            denom = np.sqrt(abs(mps_vdot(prev, prev)) * nrm2)
            change = np.sqrt(max(0.0, 1.0 - (ovlp / denom) ** 2)) \
                if denom > 0 else 1.0
            if change < convTol:
                break
        prev = [t.copy() for t in x]
    return x
