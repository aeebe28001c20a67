"""Block-sparse operators with a Pallas TPU SpMV kernel.

The reference implicitly supports sparse H through scipy's ``H @ x``
(reference: numpyVector.py:152 works with any matmul-able object); here
sparse Hamiltonians are first-class:

* :class:`BSROperator` — block-ELL layout (fixed number of BxB blocks per
  block-row, zero-padded): ``data (nrb, nbpr, B, B)``, ``idx (nrb, nbpr)``.
  The matvec gathers whole B-blocks of x, so every FLOP is a dense (B, B)
  matmul — MXU work, not scalar gathers.  Block data is stored per-block
  TRANSPOSED (the layout every apply path consumes; re-transposing at apply
  time would stream the whole array an extra time per matvec).  Execution
  paths, selected by measurement on a v5e chip (chained inside one jit,
  results fetched; numbers re-measured 2026-08 at f32-exact precision with
  400-deep chains — shorter chains under-measure badly through the remote
  tunnel's per-dispatch RPC):
    - single RHS on TPU (f32/bf16, 128-multiple blocks): Pallas kernel with
      scalar-prefetched block indices driving dynamic slices of x resident
      in VMEM, T=4 terms fetched per grid step with a K-stacked
      (1, T*B)@(T*B, B) MXU dot per row — 436 GB/s block-data bandwidth,
      which IS this chip's measured streaming roofline: a dense-matvec
      calibration achieves 431 GB/s, an explicit N-deep manual-DMA pipeline
      435, and XLA gather+einsum 425 (the 819 GB/s nameplate is not
      reachable by any streaming pattern measured on this part);
    - batched RHS (vmap over the matvec — FEAST lane stacks, block
      Lanczos): a ``custom_vmap`` rule reroutes to one gather + einsum
      matmat, which XLA tiles onto the MXU with full block-data reuse over
      the RHS axis (~1.34 TFLOP/s f32-exact at m=16, ~10x the single-RHS
      rate); vmapping the Pallas kernel itself would instead re-fetch every
      block per lane.
    - everything else (CPU, f64/complex, odd block sizes): XLA
      gather+einsum.
* :func:`from_scipy` / ``as_operator`` integration for scipy.sparse inputs.

Block size defaults to 128 = MXU tile edge.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .operators import AbstractOperator, resolve_precision


@jax.tree_util.register_pytree_node_class
class BSROperator(AbstractOperator):
    """Block-ELL sparse operator (see module docstring)."""

    def __init__(self, data, idx, n: int, use_pallas: Optional[bool] = None,
                 precision="highest"):
        """``precision`` (see :func:`.operators.resolve_precision`): TPU MXUs
        multiply f32 via bf16 passes — "default" (1 pass) leaves a
        ~3e-4-relative matvec error, two orders above the f32 floor.  The
        default here is "highest" (true f32): the single-RHS kernel is
        DMA-bound on this hardware, so exactness is free (measured 130 vs
        134 GFLOP/s), and the m=16 matmat pays only ~7% (1.34 vs 1.44
        TFLOP/s).  "high" = bf16x3 (~1e-6-relative, same bytes as f32 via a
        precomputed hi/lo bf16 split — Mosaic has no HIGH dot lowering);
        use it where the MXU, not HBM, is the bottleneck."""
        data = jnp.asarray(data)           # (nrb, nbpr, B, B)
        # The canonical on-device layout is per-block TRANSPOSED: every
        # matvec path computes y_row = x_row @ block^T, and transposing at
        # apply time would materialize the whole array once per matvec
        # (measured: ~3x memory traffic, the kernel drops from ~700 to
        # ~250 GB/s).  ``data`` is exposed as a (lazily re-transposed)
        # property for the cold paths (to_dense).
        self.dataT = jnp.swapaxes(data, 2, 3)
        self.idx = jnp.asarray(idx, jnp.int32)  # (nrb, nbpr) block-col ids
        self.n = int(n)                    # logical (unpadded) dimension
        assert self.dataT.ndim == 4 and self.dataT.shape[2] == self.dataT.shape[3]
        assert self.idx.shape == self.dataT.shape[:2]
        self.use_pallas = use_pallas
        self.precision = resolve_precision(precision)
        self._make_split()

    def _make_split(self):
        """bf16 hi/lo split of the (transposed) block data for the "high"
        Pallas path."""
        if (self.precision == jax.lax.Precision.HIGH
                and self.dataT.dtype == jnp.float32):
            hi = self.dataT.astype(jnp.bfloat16)
            self.dataT_hi = hi
            self.dataT_lo = (self.dataT
                             - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        else:
            self.dataT_hi = self.dataT_lo = None

    @property
    def data(self):
        """Blocks in natural (row-major) orientation — cold paths only;
        re-transposes on access."""
        return jnp.swapaxes(self.dataT, 2, 3)

    # -- properties ---------------------------------------------------------
    @property
    def block_size(self) -> int:
        return int(self.dataT.shape[2])

    @property
    def n_padded(self) -> int:
        return int(self.dataT.shape[0] * self.block_size)

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def dtype(self):
        return self.dataT.dtype

    @property
    def nnz(self) -> int:
        """Stored element count (incl. explicit zeros in padding blocks)."""
        return int(np.prod(self.dataT.shape))

    # -- construction -------------------------------------------------------
    @classmethod
    def from_dense(cls, H, block_size: int = 128, drop_tol: float = 0.0,
                   use_pallas: Optional[bool] = None,
                   precision="highest") -> "BSROperator":
        H = np.asarray(H)
        n = H.shape[0]
        B = block_size
        nrb = -(-n // B)
        Hp = np.zeros((nrb * B, nrb * B), H.dtype)
        Hp[:n, :n] = H
        blocks = Hp.reshape(nrb, B, nrb, B).transpose(0, 2, 1, 3)
        norms = np.abs(blocks).max(axis=(2, 3))
        keep = norms > drop_tol
        nbpr = max(1, int(keep.sum(axis=1).max()))
        data = np.zeros((nrb, nbpr, B, B), H.dtype)
        idx = np.zeros((nrb, nbpr), np.int32)
        for r in range(nrb):
            cols = np.nonzero(keep[r])[0]
            for t, c in enumerate(cols[:nbpr]):
                data[r, t] = blocks[r, c]
                idx[r, t] = c
        return cls(data, idx, n, use_pallas=use_pallas, precision=precision)

    @classmethod
    def from_scipy(cls, H, block_size: int = 128,
                   use_pallas: Optional[bool] = None,
                   precision="highest") -> "BSROperator":
        """Build from a scipy.sparse matrix without densifying the whole
        matrix at once (block-row streaming)."""
        import scipy.sparse as sp
        H = sp.csr_matrix(H)
        n = H.shape[0]
        B = block_size
        nrb = -(-n // B)
        ncb = nrb
        # pass 1: which blocks are nonzero
        rows, cols = H.nonzero()
        br = rows // B
        bc = cols // B
        block_ids = {}
        for r, c in zip(br, bc):
            block_ids.setdefault(int(r), set()).add(int(c))
        nbpr = max(1, max((len(v) for v in block_ids.values()), default=1))
        data = np.zeros((nrb, nbpr, B, B), H.dtype)
        idx = np.zeros((nrb, nbpr), np.int32)
        for r in range(nrb):
            cset = sorted(block_ids.get(r, []))
            rl = r * B
            rh = min((r + 1) * B, n)
            strip = H[rl:rh]
            for t, c in enumerate(cset):
                cl = c * B
                ch = min((c + 1) * B, n)
                data[r, t, :rh - rl, :ch - cl] = strip[:, cl:ch].toarray()
                idx[r, t] = c
        return cls(data, idx, n, use_pallas=use_pallas, precision=precision)

    # -- matvec paths -------------------------------------------------------
    def _resolve_pallas(self, dtype) -> bool:
        """Pick the execution path (see module docstring for measurements)."""
        use_pallas = self.use_pallas
        if use_pallas is None:
            B = self.block_size
            use_pallas = (
                _default_backend_is_tpu()
                and B % 128 == 0
                # x stays fully resident in VMEM (~16 MB/core); leave room
                # for the data tiles and the output.
                and self.n_padded * jnp.dtype(dtype).itemsize <= 8 * 2**20
            )
        if use_pallas and dtype not in (jnp.float32, jnp.bfloat16):
            # The Mosaic TPU toolchain has no f64/complex MXU path; the
            # kernel is traced with x64 disabled (see _bsr_matvec_pallas),
            # so wider dtypes take the XLA path.
            use_pallas = False
        return bool(use_pallas)

    def matvec(self, x):
        flat = x.reshape(-1)
        dtype = jnp.result_type(self.dtype, flat.dtype)
        npad = self.n_padded
        xp = jnp.zeros(npad, dtype).at[:self.n].set(flat.astype(dtype))
        if self._resolve_pallas(dtype):
            # custom_vmap wrappers: Pallas kernel when called on one RHS,
            # rerouted to the einsum matmat when this matvec is vmapped
            # (batched shifted solves).
            if self.dataT_hi is not None and dtype == jnp.float32:
                yp = _bsr_matvec_best_split(
                    self.dataT, self.dataT_hi, self.dataT_lo, self.idx, xp)
            else:
                yp = _bsr_matvec_best(self.dataT.astype(dtype), self.idx, xp,
                                      precision=self.precision)
        else:
            yp = _bsr_matvec_xla(self.dataT.astype(dtype), self.idx, xp,
                                 precision=self.precision)
        return yp[:self.n].reshape(x.shape)

    def matmat(self, X):
        """Apply to m stacked RHS at once: X (n, m) -> (n, m).

        One gather + one einsum — the block data is fetched once and reused
        across all m columns (the multi-RHS bandwidth ceiling the single-RHS
        path cannot reach)."""
        X = jnp.asarray(X)
        assert X.ndim == 2 and X.shape[0] == self.n, f"bad RHS shape {X.shape}"
        dtype = jnp.result_type(self.dtype, X.dtype)
        npad = self.n_padded
        Xp = jnp.zeros((X.shape[1], npad), dtype).at[:, :self.n].set(
            X.T.astype(dtype))
        Yp = _bsr_matmat_xla(self.dataT.astype(dtype), self.idx, Xp,
                             precision=self.precision)
        return Yp[:, :self.n].T

    def diagonal(self):
        """diag(H): pick the (i, i) entries of the diagonal blocks (block
        rows where idx[r, t] == r), one vectorized gather."""
        nrb, nbpr, B, _ = self.dataT.shape
        is_diag = (self.idx == jnp.arange(nrb, dtype=self.idx.dtype)[:, None])
        # a block's diagonal is transpose-invariant, so dataT serves directly
        blk_diags = self.dataT.reshape(nrb, nbpr, B * B)[
            :, :, jnp.arange(B) * (B + 1)]                      # (nrb, nbpr, B)
        d = jnp.where(is_diag[:, :, None], blk_diags, 0).sum(axis=1)
        return d.reshape(-1)[:self.n]

    def to_dense(self):
        nrb, nbpr, B, _ = self.dataT.shape
        out = np.zeros((self.n_padded, self.n_padded),
                       np.dtype(self.dataT.dtype.name))
        dataT = np.asarray(self.dataT)
        idx = np.asarray(self.idx)
        for r in range(nrb):
            for t in range(nbpr):
                c = idx[r, t]
                out[r * B:(r + 1) * B, c * B:(c + 1) * B] += dataT[r, t].T
        return jnp.asarray(out[:self.n, :self.n])

    def tree_flatten(self):
        return (self.dataT, self.idx, self.dataT_hi, self.dataT_lo), \
            (self.n, self.use_pallas, self.precision)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.dataT, obj.idx, obj.dataT_hi, obj.dataT_lo = children
        obj.n, obj.use_pallas = aux[0], aux[1]
        obj.precision = aux[2] if len(aux) > 2 else jax.lax.Precision.HIGHEST
        return obj


@functools.lru_cache(maxsize=1)
def _default_backend_is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


@functools.partial(jax.jit, static_argnames=("precision",))
def _bsr_matvec_xla(dataT, idx, xp, precision=None):
    """XLA path: gather the needed x blocks, one batched einsum.  Blocks
    arrive per-block TRANSPOSED (the operator's canonical layout); the
    einsum contracts their first in-block axis, so no re-transpose is
    materialized."""
    nrb, nbpr, B, _ = dataT.shape
    xb = xp.reshape(-1, B)            # (ncb, B)
    gathered = xb[idx]                # (nrb, nbpr, B)
    y = jnp.einsum("rtji,rtj->ri", dataT, gathered,
                   preferred_element_type=dataT.dtype,
                   precision=precision)
    return y.reshape(-1)


@functools.partial(jax.jit, static_argnames=("precision",))
def _bsr_matmat_xla(dataT, idx, Xp, precision=None):
    """Multi-RHS XLA path: Xp (m, npad) -> (m, npad).  The gathered x blocks
    carry the RHS axis, so the contraction is one MXU-tiled einsum with full
    block-data reuse over m.  Blocks arrive transposed (see above)."""
    nrb, nbpr, B, _ = dataT.shape
    m = Xp.shape[0]
    Xb = Xp.reshape(m, -1, B)          # (m, ncb, B)
    gathered = Xb[:, idx]              # (m, nrb, nbpr, B)
    y = jnp.einsum("rtji,mrtj->mri", dataT, gathered,
                   preferred_element_type=dataT.dtype,
                   precision=precision)
    return y.reshape(m, -1)


_ROWS_PER_PROGRAM = 8  # output tile sublane requirement
_TERM_TILE_BYTES = 2 * 2**20   # target block-data tile size per grid step


def _terms_per_program(nbpr: int, B: int, itemsize: int) -> int:
    """Terms fetched per grid step: the largest divisor of nbpr keeping the
    (R, T, B, B) data tile at or under ~2 MiB.  Measured on v5e (n=16384,
    B=128, nbpr=8): T=4 gives 436 GB/s vs 419 at T=1 — at the chip's
    MEASURED achievable HBM streaming rate (~431 GB/s by a dense-matvec
    calibration; the 819 GB/s nameplate is not reachable by any streaming
    access pattern on this part, incl. XLA's own dense matvec)."""
    budget = max(1, _TERM_TILE_BYTES // (_ROWS_PER_PROGRAM * B * B * itemsize))
    T = 1
    for t in range(1, nbpr + 1):
        if nbpr % t == 0 and t <= budget:
            T = t
    return T


def _make_bsr_kernel(nbpr: int, T: int, precision=None):
    def _bsr_kernel(idx_ref, dataT_ref, x_ref, o_ref):
        """Pallas kernel: grid (row-tiles, term-tiles).

        Each program handles 8 block-rows (TPU output tiles need >= 8
        sublanes) × T stored terms; the output tile stays resident in VMEM
        across the term axis and accumulates.  Scalar-prefetched block-column
        indices drive dynamic slices of x (resident in VMEM as a (1, n)
        row); blocks are stored pre-transposed and the T gathered x-blocks
        are concatenated so each row is ONE K-stacked MXU product:
            y_row (1, B) += x_cat (1, T*B) @ blocksT (T*B, B).
        """
        rb = pl.program_id(0)
        tb = pl.program_id(1)
        R = o_ref.shape[0]
        B = dataT_ref.shape[2]

        @pl.when(tb == 0)
        def _():
            o_ref[:, :] = jnp.zeros_like(o_ref)

        for i in range(R):  # static unroll over the tile's rows
            parts = [
                x_ref[:, pl.ds(idx_ref[(rb * R + i) * nbpr + tb * T + u] * B,
                               B)]
                for u in range(T)]
            xcat = jnp.concatenate(parts, axis=1) if T > 1 else parts[0]
            o_ref[pl.ds(i, 1), :] += jnp.dot(
                xcat, dataT_ref[i].reshape(T * B, B),
                preferred_element_type=o_ref.dtype, precision=precision)

    return _bsr_kernel


def _make_bsr_kernel_split(nbpr: int, T: int):
    def _bsr_kernel(idx_ref, hiT_ref, loT_ref, x_ref, o_ref):
        """bf16x3 variant of the kernel above ("high" precision): the f32
        block data arrives pre-split as hi/lo bf16 halves (same total bytes
        as f32), x is split per slice on the VPU, and each accumulation is
        three 1-pass bf16 MXU products
            y += xh@Bh + xh@Bl + xl@Bh
        (the dropped xl@Bl term is O(2^-16) relative).  Mosaic has no HIGH
        dot lowering, so the split is explicit; measured f32-grade error at
        roughly twice the full-f32 ("highest", 6-pass) throughput.
        """
        rb = pl.program_id(0)
        tb = pl.program_id(1)
        R = o_ref.shape[0]
        B = hiT_ref.shape[2]

        @pl.when(tb == 0)
        def _():
            o_ref[:, :] = jnp.zeros_like(o_ref)

        for i in range(R):
            parts = [
                x_ref[:, pl.ds(idx_ref[(rb * R + i) * nbpr + tb * T + u] * B,
                               B)]
                for u in range(T)]
            xb = jnp.concatenate(parts, axis=1) if T > 1 else parts[0]
            xh = xb.astype(jnp.bfloat16)
            xl = (xb - xh.astype(xb.dtype)).astype(jnp.bfloat16)
            Bh = hiT_ref[i].reshape(T * B, B)
            Bl = loT_ref[i].reshape(T * B, B)
            acc = jnp.dot(xh, Bh, preferred_element_type=o_ref.dtype)
            acc += jnp.dot(xh, Bl, preferred_element_type=o_ref.dtype)
            acc += jnp.dot(xl, Bh, preferred_element_type=o_ref.dtype)
            o_ref[pl.ds(i, 1), :] += acc

    return _bsr_kernel


try:  # Pallas import is TPU/CPU-safe; the kernel only launches on TPU
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @functools.partial(jax.jit, static_argnames=("interpret", "precision"))
    def _bsr_matvec_pallas(dataT, idx, xp, interpret=False, precision=None):
        """``dataT``: per-block-transposed blocks — the operator's canonical
        storage (transposing here would materialize the whole array once per
        matvec)."""
        nrb, nbpr, B, _ = dataT.shape
        R = _ROWS_PER_PROGRAM
        pad = (-nrb) % R
        if pad:
            dataT = jnp.concatenate(
                [dataT, jnp.zeros((pad,) + dataT.shape[1:], dataT.dtype)])
            idx = jnp.concatenate(
                [idx, jnp.zeros((pad, nbpr), idx.dtype)])
        nrb_p = nrb + pad
        # Mosaic cannot lower a HIGH dot; route it to the explicit-split
        # kernel path via the caller (matvec dispatch), fall back to f32
        # full precision here.
        if precision == jax.lax.Precision.HIGH:
            precision = jax.lax.Precision.HIGHEST
        T = _terms_per_program(nbpr, B, jnp.dtype(dataT.dtype).itemsize)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nrb_p // R, nbpr // T),
            in_specs=[
                pl.BlockSpec((R, T, B, B),
                             lambda r, t, idx_ref: (r, t, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),   # x, full (1, n)
            ],
            out_specs=pl.BlockSpec((R, B), lambda r, t, idx_ref: (r, 0)),
        )
        # Mosaic AOT cannot lower gridded kernels traced in x64 mode (index
        # types come out i64), so for 32-bit-or-narrower data the launch is
        # traced with x64 off (operands are explicit f32/bf16/int32, so no
        # value dtype changes).  f64 data (interpret mode / CPU) keeps the
        # ambient config so kernel math stays f64.
        launch = functools.partial(
            pl.pallas_call, _make_bsr_kernel(nbpr, T, precision),
            out_shape=jax.ShapeDtypeStruct((nrb_p, B), dataT.dtype),
            grid_spec=grid_spec, interpret=interpret)
        if jnp.dtype(dataT.dtype).itemsize <= 4:
            with jax.enable_x64(False):
                out = launch()(idx.reshape(-1), dataT, xp.reshape(1, -1))
        else:
            out = launch()(idx.reshape(-1), dataT, xp.reshape(1, -1))
        return out.reshape(-1)[:nrb * B]

    @functools.partial(jax.jit, static_argnames=("interpret",))
    def _bsr_matvec_pallas_split(hiT, loT, idx, xp, interpret=False):
        """bf16x3 ("high") launch: pre-split, pre-transposed bf16 block
        data."""
        nrb, nbpr, B, _ = hiT.shape
        R = _ROWS_PER_PROGRAM
        pad = (-nrb) % R
        if pad:
            hiT = jnp.concatenate(
                [hiT, jnp.zeros((pad,) + hiT.shape[1:], hiT.dtype)])
            loT = jnp.concatenate(
                [loT, jnp.zeros((pad,) + loT.shape[1:], loT.dtype)])
            idx = jnp.concatenate(
                [idx, jnp.zeros((pad, nbpr), idx.dtype)])
        nrb_p = nrb + pad
        T = _terms_per_program(nbpr, B, 2 * jnp.dtype(hiT.dtype).itemsize)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nrb_p // R, nbpr // T),
            in_specs=[
                pl.BlockSpec((R, T, B, B),
                             lambda r, t, idx_ref: (r, t, 0, 0)),
                pl.BlockSpec((R, T, B, B),
                             lambda r, t, idx_ref: (r, t, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),   # x, full (1, n)
            ],
            out_specs=pl.BlockSpec((R, B), lambda r, t, idx_ref: (r, 0)),
        )
        launch = functools.partial(
            pl.pallas_call, _make_bsr_kernel_split(nbpr, T),
            out_shape=jax.ShapeDtypeStruct((nrb_p, B), jnp.float32),
            grid_spec=grid_spec, interpret=interpret)
        with jax.enable_x64(False):
            out = launch()(idx.reshape(-1), hiT, loT, xp.reshape(1, -1))
        return out.reshape(-1)[:nrb * B]

    from jax.custom_batching import custom_vmap

    @functools.lru_cache(maxsize=None)
    def _bsr_matvec_best_for(precision):
        """custom_vmap wrapper per (static) precision: single RHS -> Pallas
        kernel; under vmap (batched shifted solves) the rule reroutes to the
        einsum matmat so block data is fetched once per batch, not once per
        lane."""

        @custom_vmap
        def best(data, idx, xp):
            return _bsr_matvec_pallas(data, idx, xp, precision=precision)

        @best.def_vmap
        def rule(axis_size, in_batched, data, idx, xp):
            data_b, idx_b, xp_b = in_batched
            if data_b or idx_b:
                # batched operator (not a production pattern): generic vmap
                # of the XLA path
                out = jax.vmap(
                    functools.partial(_bsr_matvec_xla, precision=precision),
                    in_axes=tuple(0 if b else None for b in in_batched),
                )(data, idx, xp)
                return out, True
            return _bsr_matmat_xla(data, idx, xp, precision=precision), True

        return best

    def _bsr_matvec_best(data, idx, xp, precision=None):
        return _bsr_matvec_best_for(precision)(data, idx, xp)

    @custom_vmap
    def _bsr_matvec_best_split(data, hiT, loT, idx, xp):
        """bf16x3 single-RHS kernel with the same matmat rerouting under
        vmap; ``data`` (the unsplit f32 blocks) is dead in the primal (XLA
        prunes it) and feeds the einsum in the batched rule."""
        return _bsr_matvec_pallas_split(hiT, loT, idx, xp)

    @_bsr_matvec_best_split.def_vmap
    def _bsr_matvec_best_split_vmap_rule(axis_size, in_batched, data, hiT,
                                         loT, idx, xp):
        data_b, hi_b, lo_b, idx_b, xp_b = in_batched
        if data_b or idx_b or hi_b or lo_b:
            out = jax.vmap(
                functools.partial(_bsr_matvec_xla,
                                  precision=jax.lax.Precision.HIGH),
                in_axes=tuple(0 if b else None
                              for b in (data_b, idx_b, xp_b)),
            )(data, idx, xp)
            return out, True
        return _bsr_matmat_xla(data, idx, xp,
                               precision=jax.lax.Precision.HIGH), True
except Exception:  # pragma: no cover - platform without pallas
    _bsr_matvec_pallas = _bsr_matvec_xla
    _bsr_matvec_best = _bsr_matvec_xla

    def _bsr_matvec_best_split(data, hiT, loT, idx, xp):
        return _bsr_matvec_xla(data, idx, xp,
                               precision=jax.lax.Precision.HIGH)


@jax.tree_util.register_pytree_node_class
class BandedOperator(AbstractOperator):
    """Banded operator: H[i, i + offsets[j]] = bands[j, i].

    The matvec is gather-free — each diagonal contributes
    ``bands[j] * x[d_j : d_j + n]`` of a zero-padded x, i.e. static slices
    and elementwise multiplies that XLA fuses into one VPU pass.  The
    natural form for 1-D DVR chains (kinetic + potential) and
    finite-difference Hamiltonians.
    """

    def __init__(self, bands, offsets, n: int):
        self.bands = jnp.asarray(bands)          # (k, n)
        self.offsets = tuple(int(o) for o in offsets)
        self.n = int(n)
        assert self.bands.shape == (len(self.offsets), self.n)

    @classmethod
    def from_dense(cls, H, tol: float = 0.0) -> "BandedOperator":
        H = np.asarray(H)
        n = H.shape[0]
        offsets = []
        bands = []
        for d in range(-(n - 1), n):
            diag = np.diagonal(H, offset=d)
            if np.any(np.abs(diag) > tol):
                offsets.append(d)
                row = np.zeros(n, H.dtype)
                if d >= 0:
                    row[:n - d] = diag
                else:
                    row[-d:] = diag
                bands.append(row)
        return cls(np.stack(bands), offsets, n)

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def dtype(self):
        return self.bands.dtype

    @property
    def bandwidth(self):
        return max(abs(o) for o in self.offsets)

    def matvec(self, x):
        flat = x.reshape(-1)
        dtype = jnp.result_type(self.dtype, flat.dtype)
        m = self.bandwidth
        xp = jnp.concatenate([jnp.zeros(m, dtype), flat.astype(dtype),
                              jnp.zeros(m, dtype)])
        y = jnp.zeros(self.n, dtype)
        for j, d in enumerate(self.offsets):     # static unroll, XLA fuses
            y = y + self.bands[j].astype(dtype) * \
                jax.lax.dynamic_slice_in_dim(xp, m + d, self.n)
        return y.reshape(x.shape)

    def diagonal(self):
        if 0 in self.offsets:
            return self.bands[self.offsets.index(0)]
        return jnp.zeros(self.n, self.dtype)

    def to_dense(self):
        out = np.zeros((self.n, self.n), np.dtype(self.bands.dtype.name))
        bands = np.asarray(self.bands)
        for j, d in enumerate(self.offsets):
            idx = np.arange(self.n)
            cols = idx + d
            ok = (cols >= 0) & (cols < self.n)
            out[idx[ok], cols[ok]] = bands[j][idx[ok]]
        return jnp.asarray(out)

    def tree_flatten(self):
        return (self.bands,), (self.offsets, self.n)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj.bands,) = children
        obj.offsets, obj.n = aux
        return obj
