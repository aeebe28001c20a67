"""Two-site ALS / DMRG sweep engines over arbitrary tree topologies.

Tree generalization of the chain engines in ``mps_sweeps.py``; fills the
sweep-solver role the reference delegates to the external ``ttns2`` package
for true trees (reference: ttnsVector.py:169-196 runs ``LinearSystem``
sweeps on any tree; sweep options at ttnsVector.py:18-44).

The sweep walks an Euler tour of the rooted tree (pre-order DFS, the
numbering contract of :class:`~eigensolvers_tpu.vectors.ttns.TreeTopology`):
each tree edge ``(p, c)`` is optimized as a two-site problem, the orthogonality
center carried along the tour, and the two-site tensor SVD-split with
``maxD``/``eps`` truncation — bond adaptation exactly as on chains.

Environments are one tensor per directed edge:

* ``down[c]``  — the subtree rooted at ``c``, seen from the ``(p, c)`` bond:
  a three-index ``(bond_bra, ttno_bond, bond_ket)`` tensor for the operator,
  two-index ``(bond_bra, rhs_bond)`` for RHS / deflation states.
* ``up[c]``    — everything *outside* the subtree of ``c`` seen from the same
  bond, built from ``up[parent]`` plus the sibling ``down`` environments.

All local contractions are single ``np.einsum`` calls with integer-list
subscripts built per edge (arbitrary arity — a node may have any number of
children), running on host f64 like the rest of the tensor-network backend
(placement rationale: vectors/mps.py module docstring).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import scipy.sparse.linalg as spla

from .ttns import TreeTopology, ttns_vdot, ttns_random


# ----------------------------------------------------------------------------
# environment contractions (integer-subscript einsum)
# ----------------------------------------------------------------------------
def _einsum_chain(*args):
    """np.einsum along a FIXED sequential pairwise path: operand 0 is
    contracted with 1, the accumulated result with 2, and so on.  Every
    operand list in this module is ordered so consecutive operands share
    indices, making each step a BLAS tensordot.  This matters twice over:
    an einsum_path search per call costs more than these small contractions,
    and the FLOP-'optimal' path routinely ends in a >2-operand step that
    c_einsum executes with naive nested loops (measured 64 ms per local
    H_eff apply vs ~0.1 ms along the pairwise chain)."""
    n_ops = sum(1 for a in args if hasattr(a, "shape"))
    if n_ops == 1:
        return np.einsum(*args)
    path = ["einsum_path", (0, 1)] + [(0, m) for m in range(n_ops - 2, 0, -1)]
    return np.einsum(*args, optimize=path)


def _down_op(topo, x, W, down, i):
    """Operator down-environment of node ``i`` (isometric toward its parent):
    ``E[Ab, Wp, Ak]`` over the (parent, i) bond."""
    ch = topo.children[i]
    k = len(ch)
    xb = [0, 3] + [5 + 3 * j for j in range(k)]
    ws = [1, 3, 4] + [6 + 3 * j for j in range(k)]
    xk = [2, 4] + [7 + 3 * j for j in range(k)]
    ops = [x[i].conj(), xb, W[i], ws]
    for j, c in enumerate(ch):
        ops += [down[c], [5 + 3 * j, 6 + 3 * j, 7 + 3 * j]]
    ops += [x[i], xk]
    return _einsum_chain(*ops, [0, 1, 2])


def _up_op(topo, x, W, up, down, p, c):
    """Operator up-environment of child ``c`` of ``p`` (``x[p]`` isometric
    w.r.t. the (p, c) bond): ``E[Bb, w, Bk]`` over that bond."""
    ch = topo.children[p]
    jc = ch.index(c)
    k = len(ch)
    xb = [0, 3] + [5 + 3 * j for j in range(k)]
    ws = [1, 3, 4] + [6 + 3 * j for j in range(k)]
    xk = [2, 4] + [7 + 3 * j for j in range(k)]
    ops = [up[p], [0, 1, 2], x[p].conj(), xb, W[p], ws]
    for j, e in enumerate(ch):
        if j != jc:
            ops += [down[e], [5 + 3 * j, 6 + 3 * j, 7 + 3 * j]]
    ops += [x[p], xk]
    return _einsum_chain(*ops, [5 + 3 * jc, 6 + 3 * jc, 7 + 3 * jc])


def _down_rhs(topo, x, b, down, i):
    """RHS (two-layer <x|b>) down-environment of node ``i``: ``E[Ab, Ck]``."""
    ch = topo.children[i]
    k = len(ch)
    xb = [0, 2] + [3 + 2 * j for j in range(k)]
    bk = [1, 2] + [4 + 2 * j for j in range(k)]
    ops = [x[i].conj(), xb]
    for j, c in enumerate(ch):
        ops += [down[c], [3 + 2 * j, 4 + 2 * j]]
    ops += [b[i], bk]
    return _einsum_chain(*ops, [0, 1])


def _up_rhs(topo, x, b, up, down, p, c):
    """RHS up-environment of child ``c`` of ``p``: ``E[Bb, Ck]``."""
    ch = topo.children[p]
    jc = ch.index(c)
    k = len(ch)
    xb = [0, 2] + [3 + 2 * j for j in range(k)]
    bk = [1, 2] + [4 + 2 * j for j in range(k)]
    ops = [up[p], [0, 1], x[p].conj(), xb]
    for j, e in enumerate(ch):
        if j != jc:
            ops += [down[e], [3 + 2 * j, 4 + 2 * j]]
    ops += [b[p], bk]
    return _einsum_chain(*ops, [3 + 2 * jc, 4 + 2 * jc])


# ----------------------------------------------------------------------------
# per-edge two-site algebra
# ----------------------------------------------------------------------------
class _Edge:
    """Local two-site problem on tree edge ``(p, c)``.

    The two-site tensor ``theta`` has the canonical layout
    ``(Ap, n_p, B_sib..., n_c, F...)`` — p's parent bond, p's physical index,
    p's other child bonds in child order, c's physical index, c's child
    bonds in order.  ``split`` returns updated site tensors with the new
    (p, c) bond re-inserted at its axis in ``x[p]``.
    """

    def __init__(self, topo: TreeTopology, p: int, c: int):
        self.topo, self.p, self.c = topo, p, c
        self.ch_p = topo.children[p]
        self.jc = self.ch_p.index(c)
        self.ch_c = topo.children[c]
        self.ax = topo.child_axis(p, c)

    # -- theta assembly / split ----------------------------------------------
    def assemble(self, x):
        p, c, jc = self.p, self.c, self.jc
        sp = [0, 1] + [2 if j == jc else 10 + j
                       for j in range(len(self.ch_p))]
        sc = [2, 3] + [30 + f for f in range(len(self.ch_c))]
        out = [0, 1] + [10 + j for j in range(len(self.ch_p)) if j != jc] \
            + [3] + [30 + f for f in range(len(self.ch_c))]
        return np.einsum(x[p], sp, x[c], sc, out,
                         optimize=["einsum_path", (0, 1)])

    def split(self, theta, maxD, eps, center_to):
        """SVD-split theta; ``center_to`` is 'p' or 'c'.  Returns
        (x_p, x_c, discarded_weight)."""
        nrows = 2 + len(self.ch_p) - 1
        rshape = theta.shape[:nrows]
        cshape = theta.shape[nrows:]
        u, s, vh = np.linalg.svd(theta.reshape(int(np.prod(rshape)),
                                               int(np.prod(cshape))),
                                 full_matrices=False)
        keep = len(s)
        if eps > 0.0:
            tot = np.sum(s ** 2)
            if tot > 0:
                csum = np.cumsum((s ** 2)[::-1])[::-1]
                keep = max(1, int(np.sum(csum > eps ** 2 * tot)))
        if maxD is not None:
            keep = min(keep, maxD)
        disc = float(np.sum(s[keep:] ** 2))
        u, s, vh = u[:, :keep], s[:keep], vh[:keep]
        if center_to == "c":
            left, right = u, s[:, None] * vh
        else:
            left, right = u * s[None, :], vh
        xp = np.moveaxis(left.reshape(rshape + (keep,)), -1, self.ax)
        xc = right.reshape((keep,) + cshape)
        return xp, xc, disc

    # -- local operator / rhs -------------------------------------------------
    def build_heff(self, W, up, down):
        """Precompute the edge's effective operator as TWO tensors — built
        ONCE per edge solve, applied per iterative-solver matvec:

        * ``Pside[Ab, n_po, Bb_sib..., w, Ak, n_pi, Bk_sib...]`` =
          up[p] . W[p] . sibling down-envs (everything on the parent side
          of the edge's TTNO bond ``w``);
        * ``Cside[w, n_co, Fb..., n_ci, Fk...]`` = W[c] . child down-envs.

        Any single pairwise chain through theta carries the OUTER product
        of several uncontracted TTNO child bonds when a node has multiple
        children (measured 1.8 GB intermediates / 8 s per matvec on the
        CH3CN production tree at TTNO ranks ~50); the two-sided
        precontraction keeps intermediates at D**2 n**2 prod(w) (parent
        side; n=1 on internal nodes of physical tree layouts) and each
        matvec is two BLAS tensordots.
        """
        p, c, jc = self.p, self.c, self.jc
        kp, kc = len(self.ch_p), len(self.ch_c)
        w_child = [5 if j == jc else 9 + 3 * j for j in range(kp)]
        ops = [up[p], [0, 1, 2], W[p], [1, 3, 4] + w_child]
        for j, e in enumerate(self.ch_p):
            if j != jc:
                ops += [down[e], [8 + 3 * j, 9 + 3 * j, 10 + 3 * j]]
        outP = [0, 3] + [8 + 3 * j for j in range(kp) if j != jc] + [5] \
            + [2, 4] + [10 + 3 * j for j in range(kp) if j != jc]
        Pside = _einsum_chain(*ops, outP)

        base = 20
        ops = [W[c], [5, 6, 7] + [base + 3 * f + 1 for f in range(kc)]]
        for f, e in enumerate(self.ch_c):
            ops += [down[e], [base + 3 * f, base + 3 * f + 1,
                              base + 3 * f + 2]]
        outC = [5, 6] + [base + 3 * f for f in range(kc)] + [7] \
            + [base + 3 * f + 2 for f in range(kc)]
        Cside = _einsum_chain(*ops, outC)
        return Pside, Cside

    def apply_heff(self, Pside, Cside, theta):
        """H_eff @ theta via the precomputed two-sided tensors (two
        tensordots; see build_heff)."""
        nsib = len(self.ch_p) - 1
        kc = len(self.ch_c)
        # contract theta's (n_c, Fk...) with Cside's (n_ci, Fk...)
        t = np.tensordot(
            theta, Cside,
            axes=([2 + nsib] + [3 + nsib + f for f in range(kc)],
                  [2 + kc] + [3 + kc + f for f in range(kc)]))
        # t: (Ak, n_pi, Bk_sib..., w, n_co, Fb...)
        return np.tensordot(
            Pside, t,
            axes=([3 + nsib, 4 + nsib]
                  + [5 + nsib + j for j in range(nsib)] + [2 + nsib],
                  [0, 1] + [2 + j for j in range(nsib)] + [2 + nsib]))

    def diag_heff(self, W, up, down):
        """diag(H_eff) in the theta layout (Jacobi preconditioner)."""
        p, c, jc = self.p, self.c, self.jc
        kp, kc = len(self.ch_p), len(self.ch_c)
        dE = lambda E: np.einsum("awa->aw", E)
        dW = lambda T: np.einsum(T, [0, 1, 1] + list(range(2, T.ndim - 1)),
                                 [0, 1] + list(range(2, T.ndim - 1)))
        w_child = [4 if j == jc else 8 + 2 * j for j in range(kp)]
        ops = [dE(up[p]), [0, 1], dW(W[p]), [1, 3] + w_child]
        for j, e in enumerate(self.ch_p):
            if j != jc:
                ops += [dE(down[e]), [7 + 2 * j, 8 + 2 * j]]
        outP = [0, 3] + [7 + 2 * j for j in range(kp) if j != jc] + [4]
        dP = _einsum_chain(*ops, outP)
        base = 20
        ops = [dW(W[c]), [4, 5] + [base + 2 * f + 1 for f in range(kc)]]
        for f, e in enumerate(self.ch_c):
            ops += [dE(down[e]), [base + 2 * f, base + 2 * f + 1]]
        outC = [4, 5] + [base + 2 * f for f in range(kc)]
        dC = _einsum_chain(*ops, outC)
        return np.tensordot(dP, dC, axes=([dP.ndim - 1], [0]))

    def project_rhs(self, b, up_b, down_b):
        """Project the RHS (or a deflation state) onto the local two-site
        basis: output in the theta layout."""
        p, c, jc = self.p, self.c, self.jc
        kp, kc = len(self.ch_p), len(self.ch_c)
        cb_child = [3 if j == jc else 11 + 2 * j for j in range(kp)]
        ops = [up_b[p], [0, 1], b[p], [1, 2] + cb_child]
        for j, e in enumerate(self.ch_p):
            if j != jc:
                ops += [down_b[e], [10 + 2 * j, 11 + 2 * j]]
        base = 10 + 2 * kp
        ops += [b[c], [3, 7] + [base + 2 * f + 1 for f in range(kc)]]
        for f, e in enumerate(self.ch_c):
            ops += [down_b[e], [base + 2 * f, base + 2 * f + 1]]
        out = [0, 2] + [10 + 2 * j for j in range(kp) if j != jc] \
            + [7] + [base + 2 * f for f in range(kc)]
        return _einsum_chain(*ops, out)


# ----------------------------------------------------------------------------
# shared sweep machinery
# ----------------------------------------------------------------------------
def _canonicalize_to_root(topo, x):
    """Leaves-to-root QR; after this every non-root node is an isometry
    toward its parent and the center sits at the root."""
    from .ttns import _qr_toward_parent
    for i in range(len(topo) - 1, 0, -1):
        _qr_toward_parent(topo, x, i)


def _init_down_ops(topo, x, W):
    down = [None] * len(topo)
    for i in range(len(topo) - 1, 0, -1):
        down[i] = _down_op(topo, x, W, down, i)
    return down


def _init_down_rhs(topo, x, b):
    down = [None] * len(topo)
    for i in range(len(topo) - 1, 0, -1):
        down[i] = _down_rhs(topo, x, b, down, i)
    return down


def _euler_sweep(topo, x, maxD, eps, solve_edge, after_descend, after_ascend):
    """One full Euler-tour sweep; ``solve_edge(edge, theta0) -> theta``;
    the ``after_*`` callbacks refresh environments.  Center starts and ends
    at the root."""

    def visit(p):
        for c in topo.children[p]:
            edge = _Edge(topo, p, c)
            if topo.children[c]:
                theta = solve_edge(edge, edge.assemble(x))
                x[p], x[c], _ = edge.split(theta, maxD, eps, "c")
                after_descend(edge)
                visit(c)
            theta = solve_edge(edge, edge.assemble(x))
            x[p], x[c], _ = edge.split(theta, maxD, eps, "p")
            after_ascend(edge)

    visit(0)


# ----------------------------------------------------------------------------
# tree ALS linear-system solver
# ----------------------------------------------------------------------------
def tree_als_solve(topo: TreeTopology, ttno_tensors: List[np.ndarray],
                   b: List[np.ndarray], sigma,
                   x0: Optional[List[np.ndarray]] = None,
                   sign: float = 1.0,
                   maxD: Optional[int] = 64, eps: float = 1e-10,
                   nSweep: int = 20, convTol: float = 1e-6,
                   local_tol: float = 1e-8, local_maxiter: int = 200,
                   dtype=None) -> List[np.ndarray]:
    """Solve ``sign * (sigma*I - H) x = b`` by two-site ALS sweeps on a tree
    (reference role: ttns2 ``LinearSystem`` sweeps, ttnsVector.py:169-196;
    chain counterpart: :func:`mps_sweeps.als_solve`)."""
    L = len(topo)
    dtype = dtype or np.result_type(
        np.asarray(sigma).dtype, *(t.dtype for t in b),
        *(w.dtype for w in ttno_tensors))
    x = [t.astype(dtype).copy() for t in (x0 if x0 is not None else b)]
    b = [t.astype(dtype) for t in b]
    W = [w.astype(dtype) for w in ttno_tensors]

    if L == 1:
        n = x[0].shape[1]
        Hfull = W[0][0]
        A = sign * (sigma * np.eye(n, dtype=dtype) - Hfull)
        return [np.linalg.solve(A, b[0][0])[None]]

    _canonicalize_to_root(topo, x)
    down = _init_down_ops(topo, x, W)
    down_b = _init_down_rhs(topo, x, b)
    up = [None] * L
    up_b = [None] * L
    up[0] = np.ones((1, 1, 1), dtype)
    up_b[0] = np.ones((1, 1), dtype)

    def solve_edge(edge, theta0):
        shape = theta0.shape
        size = int(np.prod(shape))
        rhs = edge.project_rhs(b, up_b, down_b)
        Pside, Cside = edge.build_heff(W, up, down)

        def mv(v):
            t = v.reshape(shape)
            return (sign * (sigma * t
                            - edge.apply_heff(Pside, Cside, t))).ravel()

        A = spla.LinearOperator((size, size), matvec=mv, dtype=dtype)
        sol, _ = spla.gcrotmk(A, rhs.ravel(), x0=theta0.ravel(),
                              rtol=local_tol, atol=0.0,
                              maxiter=local_maxiter)
        return sol.reshape(shape)

    def after_descend(edge):
        up[edge.c] = _up_op(topo, x, W, up, down, edge.p, edge.c)
        up_b[edge.c] = _up_rhs(topo, x, b, up_b, down_b, edge.p, edge.c)

    def after_ascend(edge):
        down[edge.c] = _down_op(topo, x, W, down, edge.c)
        down_b[edge.c] = _down_rhs(topo, x, b, down_b, edge.c)

    prev = None
    for sweep in range(nSweep):
        _euler_sweep(topo, x, maxD, eps, solve_edge,
                     after_descend, after_ascend)
        nrm2 = abs(ttns_vdot(topo, x, x))
        if prev is not None:
            ovlp = abs(ttns_vdot(topo, prev, x))
            denom = np.sqrt(abs(ttns_vdot(topo, prev, prev)) * nrm2)
            change = np.sqrt(max(0.0, 1.0 - (ovlp / denom) ** 2)) \
                if denom > 0 else 1.0
            if change < convTol:
                break
        prev = [t.copy() for t in x]
    return x


# ----------------------------------------------------------------------------
# tree DMRG eigensweep
# ----------------------------------------------------------------------------
def tree_dmrg_eigensolve(topo: TreeTopology, ttno_tensors: List[np.ndarray],
                         dims: Sequence[int],
                         x0: Optional[List[np.ndarray]] = None,
                         nStates: int = 1,
                         maxD: Optional[int] = 32, eps: float = 1e-10,
                         nSweep: int = 30, convTol: float = 1e-9,
                         seed: int = 0, dtype=np.float64):
    """Two-site DMRG on a tree: lowest ``nStates`` eigenpairs of the TTNO.

    Tree counterpart of :func:`mps_sweeps.dmrg_eigensolve` (reference role:
    ``ttns2.eigenStateComputations`` DMRG guess generation on trees,
    unittests/test_feast_ttns.py:64-73).  Excited states by hard-projection
    deflation in the local two-site problems.

    :returns: (energies list, list of TTNS tensor-lists)
    """
    energies, states = [], []
    for istate in range(nStates):
        e, xs = _tree_dmrg_one_state(topo, ttno_tensors, dims,
                                     x0 if istate == 0 else None,
                                     states, maxD, eps, nSweep, convTol,
                                     seed + istate, dtype)
        energies.append(e)
        states.append(xs)
    return energies, states


def _tree_dmrg_one_state(topo, ttno_tensors, dims, x0, lower_states,
                         maxD, eps, nSweep, convTol, seed, dtype):
    L = len(topo)
    W = [w.astype(dtype) for w in ttno_tensors]
    if x0 is not None:
        x = [t.astype(dtype).copy() for t in x0]
    else:
        x = ttns_random(topo, dims, maxD or 8, seed=seed, dtype=dtype)

    if L == 1:
        # dense eigh gives all states: the k-th excited state is column k
        # (returning column 0 regardless would silently duplicate the
        # ground state for every requested state when nStates > 1)
        ev, uv = np.linalg.eigh(W[0][0])
        k = min(len(lower_states), uv.shape[1] - 1)
        return float(ev[k]), [uv[:, k][None]]

    _canonicalize_to_root(topo, x)
    nrm = np.sqrt(abs(ttns_vdot(topo, x, x)))
    x[0] = x[0] / nrm

    down = _init_down_ops(topo, x, W)
    up = [None] * L
    up[0] = np.ones((1, 1, 1), dtype)

    # deflation environments: one RHS-style env pair per lower state
    denvs = [(_init_down_rhs(topo, x, s), [None] * L, s)
             for s in lower_states]
    for _, up_s, _s in denvs:
        up_s[0] = np.ones((1, 1), dtype)

    PENALTY = 100.0 * max(1.0, float(np.max([np.abs(w).max() for w in W])))
    state = {"energy": None, "loc_tol": 1e-4}

    def solve_edge(edge, theta0):
        shape = theta0.shape
        size = int(np.prod(shape))
        Pside, Cside = edge.build_heff(W, up, down)

        dvs = []
        for down_s, up_s, s in denvs:
            v = edge.project_rhs(s, up_s, down_s).ravel()
            nv = np.linalg.norm(v)
            if nv > 1e-14:
                dvs.append(v / nv)
        D = None
        if dvs:
            Q, R = np.linalg.qr(np.column_stack(dvs))
            keepm = np.abs(np.diag(R)) > 1e-12
            D = Q[:, keepm] if keepm.any() else None

        def project(v):
            return v - D @ (D.conj().T @ v)

        if D is not None:
            t0 = project(theta0.ravel())
            nt = np.linalg.norm(t0)
            if nt < 1e-12:
                rng_loc = np.random.RandomState(edge.p * 131 + edge.c)
                t0 = project(rng_loc.standard_normal(size).astype(dtype))
                nt = np.linalg.norm(t0)
            theta0 = (t0 / nt).reshape(shape) * np.linalg.norm(theta0)

        def mv(v):
            vv = (project(v) if D is not None else v).reshape(shape)
            out = edge.apply_heff(Pside, Cside, vv).ravel()
            if D is not None:
                out = project(out) + PENALTY * (v - project(v))
            return out

        if size <= 4:
            dense = np.column_stack([mv(e) for e in np.eye(size, dtype=dtype)])
            evs, uvs = np.linalg.eigh((dense + dense.conj().T) / 2)
            state["energy"] = float(evs[0])
            return uvs[:, 0].reshape(shape)

        A = spla.LinearOperator((size, size), matvec=mv, dtype=dtype)
        diag = edge.diag_heff(W, up, down).ravel()
        e0 = float(np.real(np.vdot(theta0.ravel(), mv(theta0.ravel()))) /
                   max(np.real(np.vdot(theta0.ravel(), theta0.ravel())),
                       1e-300))
        shift = diag - e0
        shift = np.where(np.abs(shift) < 1e-8, 1e-8, shift)
        M = spla.LinearOperator((size, size),
                                matvec=lambda v: v / shift,
                                matmat=lambda V: V / shift[:, None],
                                dtype=dtype)
        X = theta0.reshape(size, 1).astype(dtype)
        try:
            import warnings as _w
            with _w.catch_warnings():
                _w.simplefilter("ignore")
                evs, uvs = spla.lobpcg(A, X, M=M, tol=state["loc_tol"],
                                       maxiter=200, largest=False)
            state["energy"] = float(evs[0])
            return uvs[:, 0].reshape(shape)
        except Exception:
            try:
                ev, uv = spla.eigsh(A, k=1, which="SA", v0=theta0.ravel(),
                                    maxiter=400,
                                    tol=max(state["loc_tol"], 1e-8))
                state["energy"] = float(ev[0])
                return uv[:, 0].reshape(shape)
            except spla.ArpackNoConvergence as exc:
                if len(exc.eigenvalues):
                    state["energy"] = float(exc.eigenvalues[0])
                    return exc.eigenvectors[:, 0].reshape(shape)
                return theta0

    def after_descend(edge):
        up[edge.c] = _up_op(topo, x, W, up, down, edge.p, edge.c)
        for down_s, up_s, s in denvs:
            up_s[edge.c] = _up_rhs(topo, x, s, up_s, down_s, edge.p, edge.c)

    def after_ascend(edge):
        down[edge.c] = _down_op(topo, x, W, down, edge.c)
        for down_s, up_s, s in denvs:
            down_s[edge.c] = _down_rhs(topo, x, s, down_s, edge.c)

    energy = None
    for sweep in range(nSweep):
        state["loc_tol"] = 1e-4 if sweep < 2 else max(convTol * 1e-2, 1e-11)
        _euler_sweep(topo, x, maxD, eps, solve_edge,
                     after_descend, after_ascend)
        e = state["energy"]
        if energy is not None and e is not None and \
                abs(e - energy) <= convTol * max(1.0, abs(e)):
            energy = e
            break
        energy = e

    nrm = np.sqrt(abs(ttns_vdot(topo, x, x)))
    x[0] = x[0] / nrm
    return energy, x
