"""Explicit-collective (shard_map) SpMV paths vs GSPMD and the dense
oracle, on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from eigensolvers_tpu.parallel.mesh import make_mesh, vector_sharding
from eigensolvers_tpu.parallel.spmd import (
    col_matvec,
    place_col_sharded,
    place_row_sharded,
    row_matvec,
    sharded_vdot,
)


@pytest.fixture(scope="module")
def problem():
    mesh = make_mesh(batch=1)          # ("b"=1, "x"=8)
    n = 512
    rng = np.random.RandomState(5)
    H = rng.standard_normal((n, n))
    H = (H + H.T) / 2
    x = rng.standard_normal(n)
    return mesh, H, x


def test_row_matvec_allgather(problem):
    mesh, H, x = problem
    Hs = place_row_sharded(H, mesh)
    xs = jax.device_put(jnp.asarray(x), vector_sharding(mesh))
    y = row_matvec(mesh)(Hs, xs)
    np.testing.assert_allclose(np.asarray(y), H @ x, rtol=1e-12, atol=1e-12)
    # result stays row-sharded over "x" (no implicit replication)
    assert y.sharding.spec == P("x")


def test_col_matvec_reduce_scatter(problem):
    mesh, H, x = problem
    Hs = place_col_sharded(H, mesh)
    xs = jax.device_put(jnp.asarray(x), vector_sharding(mesh))
    y = col_matvec(mesh)(Hs, xs)
    np.testing.assert_allclose(np.asarray(y), H @ x, rtol=1e-12, atol=1e-12)
    assert y.sharding.spec == P("x")


def test_explicit_matches_gspmd(problem):
    """The hand-written schedule and the partitioner must agree bitwise-ish;
    both are one all-gather + local matmul on this layout."""
    mesh, H, x = problem
    Hs = place_row_sharded(H, mesh)
    xs = jax.device_put(jnp.asarray(x), vector_sharding(mesh))

    @jax.jit
    def gspmd_mv(Hm, v):
        return Hm @ v

    y_gspmd = gspmd_mv(Hs, xs)
    y_explicit = jax.jit(row_matvec(mesh))(Hs, xs)
    np.testing.assert_allclose(np.asarray(y_explicit), np.asarray(y_gspmd),
                               rtol=1e-13, atol=1e-13)


def test_sharded_vdot_psum(problem):
    mesh, H, x = problem
    rng = np.random.RandomState(6)
    b = rng.standard_normal(len(x))
    xs = jax.device_put(jnp.asarray(x), vector_sharding(mesh))
    bs = jax.device_put(jnp.asarray(b), vector_sharding(mesh))
    got = float(sharded_vdot(mesh)(xs, bs))
    assert abs(got - float(np.vdot(x, b))) < 1e-10


def test_row_matvec_inside_minres(problem):
    """The explicit matvec composes with the jitted solver stack: wrap it as
    a MatrixFreeOperator and run a shifted MINRES solve on the mesh."""
    from eigensolvers_tpu.ops.linear_solvers import minres
    from eigensolvers_tpu.ops.operators import CallableOperator
    mesh, H, x = problem
    n = len(x)
    Hs = place_row_sharded(H, mesh)
    mv = row_matvec(mesh)
    op = CallableOperator(lambda v: mv(Hs, v), (n, n), jnp.float64)
    xs = jax.device_put(jnp.asarray(x / np.linalg.norm(x)),
                        vector_sharding(mesh))
    sigma = 3.0
    res = minres(op, xs, sigma, rtol=1e-10, maxiter=2000)
    assert bool(res.converged)
    y = np.asarray(res.x)
    r = sigma * y - H @ y - np.asarray(xs)
    assert np.linalg.norm(r) < 1e-8


# ---------------------------------------------------------------------------
# Collective-schedule audits: the compiled HLO carries exactly the collectives
# the schedule promises (SURVEY.md §2.4; regression guard for GSPMD drift).
# ---------------------------------------------------------------------------
def _collective_counts(txt):
    import re
    return {k: len(re.findall(k, txt))
            for k in ("all-reduce", "all-gather", "collective-permute",
                      "all-to-all", "reduce-scatter")}


def test_lane_local_minres_zero_collectives():
    """Batched MINRES on a P("b", None)-sharded lane stack routes through the
    shard_map local-while-loop schedule: the compiled program must contain NO
    collectives at all (each device solves its lanes independently; GSPMD's
    global loop-termination all-reduce is the overhead this path removes)."""
    from eigensolvers_tpu.ops import linear_solvers as ls
    from eigensolvers_tpu.ops.operators import DenseOperator
    from eigensolvers_tpu.models.synthetic import known_spectrum_matrix

    n, lanes = 256, 8
    H, ev = known_spectrum_matrix(n, eigenvalues=np.linspace(1, 300, n),
                                  seed=2, dtype=np.float64)
    op = DenseOperator(np.asarray(H))
    rng = np.random.RandomState(0)
    B = jnp.asarray(rng.rand(lanes, n))
    sig = jnp.asarray(np.linspace(50, 250, lanes))
    mesh = make_mesh(batch=8)
    Bs = jax.device_put(B, NamedSharding(mesh, P("b", None)))

    assert ls._lane_sharded_mesh(Bs) is mesh
    fn = ls._minres_batch_local_fn(mesh, 300, None, 1.0)
    txt = fn.lower(op, Bs, sig, jnp.zeros_like(Bs), 1e-8, 0.0) \
            .compile().as_text()
    counts = _collective_counts(txt)
    assert all(v == 0 for v in counts.values()), counts

    # and the public entry point routes there with correct results
    res = ls.minres_batch(op, Bs, sig, rtol=1e-8, maxiter=2000)
    X = np.asarray(res.x)
    for k in range(lanes):
        r = float(sig[k]) * X[k] - np.asarray(H) @ X[k] - np.asarray(B[k])
        assert np.linalg.norm(r) <= 1e-8 * np.linalg.norm(np.asarray(B[k])) \
            + 1e-12
    assert all(np.asarray(res.converged))


def test_gspmd_x_sharded_minres_collective_budget():
    """State-sharded ("x") MINRES under GSPMD: the program needs all-gathers
    (row-sharded matvec operand) and all-reduces (inner products, termination)
    — but a bounded number.  Guards against a partitioner regression silently
    inserting resharding traffic (VERDICT r2 next-round item 4)."""
    from eigensolvers_tpu.ops import linear_solvers as ls
    from eigensolvers_tpu.ops.operators import DenseOperator
    from eigensolvers_tpu.models.synthetic import known_spectrum_matrix
    from eigensolvers_tpu.parallel.mesh import operator_row_sharding

    n = 512
    H, ev = known_spectrum_matrix(n, eigenvalues=np.linspace(1, 600, n),
                                  seed=2, dtype=np.float64)
    mesh = make_mesh(batch=1, shard=8)
    Hs = jax.device_put(jnp.asarray(H), operator_row_sharding(mesh))
    op = DenseOperator(Hs)
    rng = np.random.RandomState(0)
    b = jax.device_put(jnp.asarray(rng.rand(n)),
                       vector_sharding(mesh))
    txt = ls._minres_jit.lower(op, b, 300.0, jnp.zeros_like(b), 1e-6, 0.0,
                               1.0, 300, precond=None).compile().as_text()
    counts = _collective_counts(txt)
    # measured-minimal schedule on jax 0.9 CPU: 14 all-reduce / 6 all-gather
    # in the whole program (setup + loop body); small slack for compiler
    # version drift, hard failure on anything resembling per-iteration
    # resharding blowup
    assert counts["all-reduce"] <= 16, counts
    assert counts["all-gather"] <= 8, counts
    assert counts["collective-permute"] == 0, counts
    assert counts["all-to-all"] == 0, counts
