"""Fused, jittable Krylov-step kernels — the compiled heart of the solver.

One ``block_krylov_step`` call performs, entirely on device in one XLA
program: the nBlock inexact shifted solves (vmapped MINRES over the batch
axis), CGS2 orthogonalization of the new vectors against the stacked basis
and each other, and the new overlap/Hamiltonian columns.  This is the
"training step" of this framework: under a ("b", "x") mesh the solves
batch over "b" (dp analog) and the state dimension shards over "x"
(tensor/sequence-parallel analog); inner products psum over "x"
(SURVEY.md §2.4).

Used by the multi-chip dry-run (``__graft_entry__.dryrun_multichip``), the
benchmark, and as the building block for fully-fused solver variants.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.linear_solvers import (_gmres_fixed, _minres_fixed,
                                  _resolve_precond, _shifted_matvec)


class KrylovStepResult(NamedTuple):
    new_vectors: jax.Array   # (nBlock, n) orthonormalized Krylov vectors
    h_cols: jax.Array        # (nBlock, m+nBlock) new H columns (padded basis)
    s_cols: jax.Array        # (nBlock, m+nBlock) new S columns
    solve_resnorms: jax.Array  # (nBlock,)
    lindep_flags: jax.Array    # (nBlock,) True where orthogonalization collapsed


def _cgs2(w, V, mask):
    """Two-pass classical Gram-Schmidt of w against masked rows of V;
    returns (orthogonalized w, squared norm)."""
    h1 = (V.conj() @ w) * mask
    w = w - V.T @ h1
    h2 = (V.conj() @ w) * mask
    w = w - V.T @ h2
    nrm2 = jnp.real(jnp.vdot(w, w))
    return w, nrm2


@functools.partial(jax.jit, static_argnames=("maxiter", "solver", "precond",
                                              "restart"))
def block_krylov_step(op, V, nvec, seeds, sigma, rtol, maxiter=200,
                      lindep=1e-14, solver="minres", precond=None,
                      restart=30):
    """One block-Lanczos Krylov step, fused.

    :param op: operator pytree (Hermitian)
    :param V: (M, n) stacked basis buffer, rows >= nvec zero
    :param nvec: number of valid rows in V (traced scalar)
    :param seeds: (nBlock, n) right-hand sides (the latest block vectors)
    :param sigma: shift (complex shifts require ``solver="gmres"`` and a
        complex-dtype basis buffer)
    :param solver: inner shifted solver — "minres" (Hermitian system, the
        default) or "gmres" (general/complex shifts)
    :param precond: None or "jacobi" (same option surface as the general
        driver's linearSystemArgs["preconditioner"])
    :param restart: GMRES restart length (ignored by minres)
    :returns: :class:`KrylovStepResult`; new vectors are zero rows where
        linear dependence was detected.
    """
    M, n = V.shape
    nBlock = seeds.shape[0]

    matvec = _shifted_matvec(op, sigma, 1.0)
    psolve = _resolve_precond(precond, solver, op, sigma, 1.0, seeds.dtype)

    def solve_one(b):
        if solver == "minres":
            res = _minres_fixed(matvec, b, jnp.zeros_like(b), rtol, 0.0,
                                maxiter, psolve=psolve)
        elif solver == "gmres":
            res = _gmres_fixed(matvec, b, jnp.zeros_like(b), rtol, 0.0,
                               restart, maxiter, psolve=psolve)
        else:
            raise ValueError(f"unknown solver {solver!r}")
        nrm = jnp.linalg.norm(res.x)
        x = res.x / jnp.where(nrm > 0, nrm, 1.0)
        return x, res.resnorm

    xs, resnorms = jax.vmap(solve_one)(seeds)

    # Orthogonalize the block vectors against the basis and each other.
    # nBlock is small and static → unrolled loop, all inside one program.
    row_ids = jnp.arange(M)
    newV = jnp.zeros((nBlock, n), V.dtype)
    lindep_flags = jnp.zeros((nBlock,), bool)
    Vwork = V
    nv = nvec
    for i in range(nBlock):
        mask = (row_ids < nv).astype(V.dtype)
        w, nrm2 = _cgs2(xs[i].astype(V.dtype), Vwork, mask)
        ok = nrm2 > lindep
        w = jnp.where(ok, w / jnp.sqrt(jnp.where(ok, nrm2, 1.0)), 0.0)
        newV = newV.at[i].set(w)
        lindep_flags = lindep_flags.at[i].set(~ok)
        Vwork = jnp.where((row_ids == nv)[:, None], w[None, :], Vwork)
        nv = nv + jnp.where(ok, 1, 0)

    # New S/H columns against the extended basis (padded length M):
    # s_cols[i, j] = <v_j | w_i>, h_cols[i, j] = <v_j | H w_i>
    AV = jax.vmap(op.matvec)(newV)
    s_cols = (Vwork.conj() @ newV.T).T
    h_cols = (Vwork.conj() @ AV.T).T
    return KrylovStepResult(newV, h_cols, s_cols, resnorms, lindep_flags)
