"""Block-sparse (BSR/block-ELL) operator: construction, matvec oracle,
solver integration (the sparse-Hamiltonian path; SpMV is the north-star
kernel metric, BASELINE.md)."""

import numpy as np
import pytest
import scipy.sparse as sp

from eigensolvers_tpu import JaxVector, inexactLanczosDiagonalization, \
    find_nearest
from eigensolvers_tpu.ops.sparse import BSROperator


def _banded(n, bw=3, seed=0):
    rng = np.random.RandomState(seed)
    d = [rng.rand(n - abs(k)) for k in range(-bw, bw + 1)]
    H = sp.diags(d, offsets=range(-bw, bw + 1)).toarray()
    return (H + H.T) / 2


def test_from_dense_matches():
    H = _banded(200, bw=5)
    op = BSROperator.from_dense(H, block_size=32, drop_tol=0.0,
                                use_pallas=False)
    rng = np.random.RandomState(1)
    x = rng.rand(200)
    np.testing.assert_allclose(np.asarray(op.matvec(x)), H @ x, atol=1e-11)
    np.testing.assert_allclose(np.asarray(op.to_dense()), H, atol=1e-13)


def test_from_scipy_matches():
    H = sp.csr_matrix(_banded(150, bw=2))
    op = BSROperator.from_scipy(H, block_size=64, use_pallas=False)
    rng = np.random.RandomState(2)
    x = rng.rand(150)
    np.testing.assert_allclose(np.asarray(op.matvec(x)),
                               H.toarray() @ x, atol=1e-11)


def test_drop_tol_sparsifies():
    H = _banded(128, bw=1)
    dense_blocks = BSROperator.from_dense(H, block_size=32, use_pallas=False)
    # bandwidth 1 with block 32 → at most 2-3 blocks per row-block kept
    assert dense_blocks.data.shape[1] <= 3


def test_lanczos_on_sparse():
    """Interior eigensolve through the sparse operator path."""
    n = 256
    H = _banded(n, bw=4, seed=3)
    evE = np.linalg.eigvalsh(H)
    target = float(evE[n // 2] + 0.2 * (evE[n // 2 + 1] - evE[n // 2]))
    op = BSROperator.from_dense(H, block_size=64, use_pallas=False)
    rng = np.random.RandomState(4)
    opts = {"linearSystemArgs": {"linearSolver": "minres", "linearIter": 4000,
                                 "linear_tol": 1e-4,
                                 "errorOnNonConvergence": False}}
    Y0 = JaxVector(rng.rand(n), opts)
    evL, _, st = inexactLanczosDiagonalization(
        op, Y0, target, 20, 8, 1e-7, writeOut=False)
    got = find_nearest(evL, target)[1]
    want = find_nearest(evE, target)[1]
    assert abs(got - want) <= 1e-5


def test_pallas_kernel_interpret_mode():
    """Validate the Pallas BSR kernel logic in interpreter mode (the suite
    runs on the CPU mesh; the same kernel compiles and validates on real TPU
    via use_pallas=True — traced with x64 disabled to work around a Mosaic
    AOT index-type bug, see _bsr_matvec_pallas)."""
    import jax.numpy as jnp
    from eigensolvers_tpu.ops.sparse import (_bsr_matvec_pallas,
                                             _bsr_matvec_xla)
    rng = np.random.RandomState(0)
    nrb, nbpr, B = 4, 3, 128
    data = rng.standard_normal((nrb, nbpr, B, B))
    idx = rng.randint(0, nrb, (nrb, nbpr)).astype(np.int32)
    x = rng.standard_normal(nrb * B)
    y_ref = np.asarray(_bsr_matvec_xla(jnp.asarray(data), jnp.asarray(idx),
                                       jnp.asarray(x)))
    y_pl = np.asarray(_bsr_matvec_pallas(jnp.asarray(data), jnp.asarray(idx),
                                         jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y_pl, y_ref, atol=1e-10)


def test_matmat_multi_rhs():
    """Fused multi-RHS apply (block data fetched once, reused over all
    columns) matches column-wise matvecs, including non-divisible n."""
    H = _banded(200, bw=5, seed=7)
    op = BSROperator.from_dense(H, block_size=64, use_pallas=False)
    rng = np.random.RandomState(8)
    X = rng.rand(200, 5)
    Y = np.asarray(op.matmat(X))
    np.testing.assert_allclose(Y, H @ X, atol=1e-11)
    # generic AbstractOperator.matmat default (vmap of matvec) agrees
    from eigensolvers_tpu.ops.operators import DenseOperator
    np.testing.assert_allclose(np.asarray(DenseOperator(H).matmat(X)),
                               H @ X, atol=1e-11)


def test_custom_vmap_reroutes_batched_matvec():
    """vmap over the dispatch wrapper must hit the einsum matmat rule (not a
    batched Pallas launch) and agree with per-lane matvecs.  This is the
    path batched shifted solves (FEAST lanes / block Lanczos) take when the
    Pallas default is active on TPU."""
    import jax
    import jax.numpy as jnp
    from eigensolvers_tpu.ops.sparse import (_bsr_matvec_best,
                                             _bsr_matvec_xla)
    rng = np.random.RandomState(3)
    nrb, nbpr, B, m = 4, 2, 128, 6
    data = jnp.asarray(rng.standard_normal((nrb, nbpr, B, B)))
    idx = jnp.asarray(rng.randint(0, nrb, (nrb, nbpr)).astype(np.int32))
    V = jnp.asarray(rng.standard_normal((m, nrb * B)))
    # the batching rule routes to _bsr_matmat_xla, so this runs on any
    # platform (the unbatched pallas branch is never traced here)
    got = np.asarray(jax.vmap(lambda v: _bsr_matvec_best(data, idx, v))(V))
    want = np.stack([np.asarray(_bsr_matvec_xla(data, idx, v)) for v in V])
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_as_operator_accepts_scipy_sparse():
    """scipy.sparse input routes through the block-sparse operator — parity
    with the reference accepting any matmul-able H."""
    from eigensolvers_tpu import as_operator
    H = sp.csr_matrix(_banded(100, bw=2, seed=9))
    op = as_operator(H)
    rng = np.random.RandomState(0)
    x = rng.rand(100)
    np.testing.assert_allclose(np.asarray(op.matvec(x)), H @ x, atol=1e-11)


def test_banded_operator():
    """Gather-free banded matvec vs dense oracle, and a Lanczos run on a
    1-D DVR chain (kinetic + potential, the natural banded family)."""
    from eigensolvers_tpu.ops.sparse import BandedOperator
    from eigensolvers_tpu.models.bases import SincInfInf

    b = SincInfInf(SincInfInf.getOptions(N=128, xRange=[-12, 12]))
    H = -b.mat_dx2 + np.diag(b.xi ** 2)
    # truncate to a band (sinc KE decays like 1/k^2)
    bw = 40
    Hb = np.triu(np.tril(H, bw), -bw)
    op = BandedOperator.from_dense(Hb)
    assert op.bandwidth == bw
    rng = np.random.RandomState(0)
    x = rng.rand(128)
    np.testing.assert_allclose(np.asarray(op.matvec(x)), Hb @ x, atol=1e-10)
    np.testing.assert_allclose(np.asarray(op.to_dense()), Hb, atol=1e-13)

    evE = np.linalg.eigvalsh(Hb)
    target = float(evE[6] + 0.3)
    opts = {"linearSystemArgs": {"linearSolver": "minres", "linearIter": 4000,
                                 "linear_tol": 1e-5,
                                 "errorOnNonConvergence": False}}
    Y0 = JaxVector(rng.rand(128), opts)
    evL, _, _ = inexactLanczosDiagonalization(op, Y0, target, 12, 6, 1e-8,
                                              writeOut=False)
    assert abs(find_nearest(evL, target)[1] - evE[6]) <= 1e-6


def test_split_kernel_interpret_f32_grade():
    """The bf16x3 ("high" precision) Pallas kernel must reproduce the f32
    matvec to f32-grade accuracy (error comparable to host-f32 arithmetic,
    NOT the ~1e-4 of a single bf16 pass) — validated in interpreter mode."""
    import jax.numpy as jnp
    from eigensolvers_tpu.ops.sparse import _bsr_matvec_pallas_split
    rng = np.random.RandomState(3)
    nrb, nbpr, B = 4, 3, 128
    data = rng.standard_normal((nrb, nbpr, B, B)).astype(np.float32)
    idx = rng.randint(0, nrb, (nrb, nbpr)).astype(np.int32)
    x = rng.standard_normal(nrb * B).astype(np.float32)
    dT = np.swapaxes(data, 2, 3)
    hiT = jnp.asarray(dT).astype(jnp.bfloat16)
    loT = (jnp.asarray(dT) - hiT.astype(jnp.float32)).astype(jnp.bfloat16)
    y = np.asarray(_bsr_matvec_pallas_split(hiT, loT, jnp.asarray(idx),
                                            jnp.asarray(x), interpret=True))
    # f64 oracle + f32 host floor
    y64 = np.zeros(nrb * B)
    x64 = x.astype(np.float64)
    for r in range(nrb):
        for t in range(nbpr):
            c = idx[r, t]
            y64[r*B:(r+1)*B] += data[r, t].astype(np.float64) @ x64[c*B:(c+1)*B]
    sc = np.abs(y64).max()
    err = np.abs(y - y64).max() / sc
    assert err < 1e-5, err


def test_bsr_precision_option_roundtrip():
    """precision is part of the operator's static (aux) data: it must
    survive pytree flatten/unflatten (jit closures) and change the
    dispatch."""
    import jax
    H = _banded(256, bw=3, seed=2)
    for prec in ("default", "high", "highest"):
        op = BSROperator.from_dense(H.astype(np.float32), block_size=128,
                                    use_pallas=False, precision=prec)
        leaves, treedef = jax.tree_util.tree_flatten(op)
        op2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert op2.precision == op.precision
        x = np.random.RandomState(0).rand(256).astype(np.float32)
        np.testing.assert_allclose(np.asarray(op2.matvec(x)),
                                   H.astype(np.float32) @ x, rtol=2e-4,
                                   atol=1e-3)
        if prec == "high":
            assert op.dataT_hi is not None and op.dataT_lo is not None
        else:
            assert op.dataT_hi is None
