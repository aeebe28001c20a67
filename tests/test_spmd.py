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
