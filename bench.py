"""Benchmark suite: TPU framework vs the reference-native (NumPy/SciPy CPU)
stack, across the north-star metrics declared in BASELINE.md.

The reference publishes no performance numbers (BASELINE.md), so this suite
*establishes* the framework's numbers with the reference's correctness
tolerances as the gate — every metric asserts the computed answer against an
exact oracle before it is recorded.

Metrics (one JSON line each, STREAMED the moment each is measured so a
driver timeout can never lose already-measured numbers; the headline
interior-Lanczos wall runs FIRST and is re-printed LAST so drivers that
parse a single trailing line keep a round-over-round comparable series):

  * bsr_spmv_gflops       — block-ELL SpMV, single RHS, Pallas kernel
                            (f32, n=16384, B=128, 8 blocks/row); extras
                            carry GB/s and Gnnz/s + the roofline position.
                            Baseline: SciPy CSR matvec (the stack under the
                            reference's H@x, numpyVector.py:152).
  * bsr_spmm_m16_gflops   — same matrix, 16 stacked RHS through the fused
                            matmat (block data fetched once per batch).
                            Baseline: SciPy CSR @ X.
  * sop_ch3cn_gflops      — CH3CN 6-mode N=14 cut (dim 7.5M), tile-fused
                            grouped SoP apply; value is USEFUL GFLOP/s
                            (physical-mode FLOP count, not the kron-lifted
                            executed count).  Baseline: the same grouped
                            apply in NumPy einsum (the reference-native
                            operatornD-style path).
  * feast_window_wall_s   — FEAST window solve to convergence (n=2048,
                            4 eigenvalues in window, nc=8, m0=10) through
                            the J-symmetrized split-complex batched MINRES
                            (f32).  Baseline: the reference-native config —
                            NumpyVector + exact direct solves (the
                            "pardiso" option, numpyVector.py:164-171), f64.
  * sharding_overhead_x8  — the SAME 8-lane batched solve, unsharded vs
                            b-sharded over an (8,1) virtual CPU mesh
                            (honest framing: this host has 2 cores, so
                            ideal is ratio ~1.0 — it measures GSPMD
                            partitioning overhead, not speedup; real
                            multi-chip scaling needs real chips).
  * dense2048_interior_lanczos_wall — the round-1 headline: wall to
                            eigenvalue convergence, fused-step Lanczos f32
                            vs NumpyVector+gcrotmk f64 (reference demo
                            config scaled up, examples/driver_numpyVector.py).

CPU baselines are measured once and cached in .bench_baselines.json keyed by
problem config + host.  All device timings are dependency-chained and
fetched (np.asarray) — on remote-executor platforms un-fetched timings elide
execution and overstate.
"""

import json
import os
import platform
import signal
import subprocess
import sys
import time
import warnings

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(ROOT, ".bench_baselines.json")
RESULTS = os.path.join(ROOT, "bench_results.json")

METRICS = []
_META = {}


def emit(metric, value, unit, vs_baseline, **extras):
    rec = {"metric": metric, "value": round(float(value), 4),
           "unit": unit, "vs_baseline": round(float(vs_baseline), 3),
           **extras}
    METRICS.append(rec)
    # stream immediately: a later bench hanging or the driver's timeout
    # must not lose this measurement (round-2 failure mode: all printing
    # deferred to the end, BENCH_r02.json captured nothing)
    print(json.dumps(rec), flush=True)
    try:
        json.dump({**_META, "metrics": METRICS}, open(RESULTS, "w"), indent=1)
    except Exception:
        pass


# -- baseline cache -----------------------------------------------------------
def _load_cache():
    if os.path.exists(CACHE):
        try:
            return json.load(open(CACHE))
        except Exception:
            pass
    return {}


def baseline(name, key, fn):
    """Measured-once CPU baseline, keyed by config+host."""
    cache = _load_cache()
    ent = cache.get(name)
    full_key = f"{key}-{platform.node()}"
    if ent and ent.get("key") == full_key:
        return float(ent["value"])
    val = float(fn())
    cache[name] = {"key": full_key, "value": val}
    json.dump(cache, open(CACHE, "w"), indent=1)
    return val


# -- problem builders ---------------------------------------------------------
def _bsr_problem():
    import scipy.sparse as sp
    n, B, nbpr = 16384, 128, 8
    nrb = n // B
    rng = np.random.RandomState(0)
    data = rng.rand(nrb, nbpr, B, B).astype(np.float32)
    idx = np.zeros((nrb, nbpr), np.int32)
    for r in range(nrb):
        idx[r] = np.sort(rng.choice(nrb, nbpr, replace=False))
    # scipy CSR equivalent for the baseline + oracle
    rows = np.repeat(np.arange(nrb) * B, nbpr * B * B) \
        + np.tile(np.repeat(np.arange(B), B), nrb * nbpr)
    cols = (np.repeat(idx.reshape(-1), B * B) * B
            + np.tile(np.arange(B), nrb * nbpr * B))
    csr = sp.csr_matrix((data.reshape(-1), (rows, cols)), shape=(n, n))
    return n, B, nbpr, data, idx, csr


def _chain_time(chain_fn, x0, iters, inner):
    """Dependency-chained, fetched wall time per inner step (best-of-iters:
    each chain call is fetched separately and the minimum taken, so one
    tunnel-RPC hiccup cannot poison the measurement)."""
    import jax
    r = chain_fn(x0)
    np.asarray(r)           # compile + first run, not timed
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        r = chain_fn(r)
        np.asarray(r)
        best = min(best, time.perf_counter() - t0)
    return best / inner


# -- metric 1+2: block-ELL SpMV / SpMM ---------------------------------------
def bench_bsr():
    import jax
    import jax.numpy as jnp
    from eigensolvers_tpu.ops.sparse import BSROperator

    n, B, nbpr, data, idx, csr = _bsr_problem()
    nnz = data.size
    flops1 = 2 * nnz
    op = BSROperator(data, idx, n)   # default dispatch (Pallas on TPU)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(n).astype(np.float32))
    X = jnp.asarray(rng.rand(n, 16).astype(np.float32))

    # correctness gates: the BSR default precision is "high" (bf16x3 split
    # kernel) — f32-GRADE error, orders below a raw bf16 MXU pass.  Gate
    # against the f32 CSR product on max-relative error so a silent
    # precision regression (e.g. falling back to a 1-pass bf16 dot,
    # ~3e-4 relative) fails loudly.
    y_csr = csr @ np.asarray(x)
    Y_csr = csr @ np.asarray(X)
    err1 = np.abs(np.asarray(op.matvec(x)) - y_csr).max() / np.abs(y_csr).max()
    errm = np.abs(np.asarray(op.matmat(X)) - Y_csr).max() / np.abs(Y_csr).max()
    assert err1 < 3e-5, f"SpMV precision regression: rel err {err1:.2e}"
    assert errm < 3e-5, f"SpMM precision regression: rel err {errm:.2e}"

    # K=400-deep chains: through the remote-TPU tunnel, per-dispatch RPC is
    # O(10 ms); 50-deep chains under-measured the kernel by up to 2x
    # (round-2's 286 GB/s "roofline gap" was mostly this artifact).
    K = 400

    @jax.jit
    def chain1(v):
        def body(i, v):
            v = op.matvec(v)
            return v / jnp.max(jnp.abs(v))
        return jax.lax.fori_loop(0, K, body, v)

    Km = 100

    @jax.jit
    def chain16(V):
        def body(i, V):
            V = op.matmat(V)
            return V / jnp.max(jnp.abs(V))
        return jax.lax.fori_loop(0, Km, body, V)

    # achievable-bandwidth calibration: a plain dense matvec (the canonical
    # streaming-bound op, XLA-optimized) — the honest roofline denominator.
    # The 819 GB/s v5e nameplate is NOT reachable by any streaming pattern
    # measured on this part (dense matvec, manual N-deep DMA pipeline, and
    # XLA gather+einsum all land at 425-440 GB/s).
    M = jnp.asarray(rng.rand(16384, 1024).astype(np.float32))
    w0 = jnp.asarray(rng.rand(1024).astype(np.float32))

    @jax.jit
    def chain_cal(w):
        def body(i, w):
            y = M @ w
            return w * 0.999 + y[:1024] * 1e-12
        return jax.lax.fori_loop(0, K, body, w)

    dt_cal = _chain_time(chain_cal, w0, 3, K)
    cal_gbps = M.size * 4 / dt_cal / 1e9

    dt1 = _chain_time(chain1, x, 3, K)
    dt16 = _chain_time(chain16, X, 3, Km)

    def cpu1():
        v = np.asarray(x, np.float32)
        t0 = time.perf_counter()
        for _ in range(20):
            v = csr @ v
            v /= np.abs(v).max()
        return (time.perf_counter() - t0) / 20

    def cpu16():
        V = np.asarray(X, np.float32)
        t0 = time.perf_counter()
        for _ in range(10):
            V = csr @ V
            V /= np.abs(V).max()
        return (time.perf_counter() - t0) / 10

    key = f"{n}-{B}-{nbpr}"
    b1 = baseline("bsr_spmv", key, cpu1)
    b16 = baseline("bsr_spmm16", key, cpu16)

    # roofline_frac: vs the MEASURED achievable streaming bandwidth
    # (dense-matvec calibration on the same chip, same run); the nameplate
    # fraction is reported alongside for cross-chip comparability.
    gbps = nnz * 4 / dt1 / 1e9
    emit("bsr_spmv_gflops", flops1 / dt1 / 1e9, "GFLOP/s",
         (flops1 / dt1) / (flops1 / b1),
         gbps=round(gbps, 1),
         gnnz_s=round(nnz / dt1 / 1e9, 2),
         hbm_calibration_gbps=round(cal_gbps, 1),
         roofline_frac=round(gbps / cal_gbps, 2),
         nameplate_frac=round(gbps / 819.0, 2))
    emit("bsr_spmm_m16_gflops", 16 * flops1 / dt16 / 1e9, "GFLOP/s",
         (16 * flops1 / dt16) / (16 * flops1 / b16),
         note="fused matmat: block data fetched once per 16-RHS batch")


# -- metric 3: SoP apply ------------------------------------------------------
def bench_sop():
    import jax
    import jax.numpy as jnp
    from eigensolvers_tpu.models.molecules import ch3cn_operator

    N, CUT = 14, 6
    op, _, _ = ch3cn_operator(N=N, nModesCut=CUT, dtype=np.float32, fuse=256)
    opu, _, _ = ch3cn_operator(N=N, nModesCut=CUT, dtype=np.float64)
    n = op.shape[0]
    # USEFUL flops: the physical-mode grouped apply
    uflops = 2 * n
    for modes, facs in opu.groups:
        S_g = facs[0].shape[0]
        for f in facs:
            uflops += 2 * S_g * f.shape[1] * n

    rng = np.random.RandomState(2)
    x_np = rng.rand(n).astype(np.float32)
    x = jnp.asarray(x_np)

    # host-numpy physical-mode apply: correctness oracle AND the CPU baseline
    groups_np = [(m, [np.asarray(f) for f in facs]) for m, facs in opu.groups]
    idc_np = float(np.asarray(opu.id_coeff))
    dims_np = opu.dims

    def np_apply(xt, fdtype=np.float64):
        y = np.asarray(idc_np, fdtype) * xt
        for modes, facs in groups_np:
            S_g = facs[0].shape[0]
            xb = np.broadcast_to(xt, (S_g,) + dims_np)
            for mode, f in zip(modes, facs):
                xb = np.moveaxis(xb, mode + 1, -1)
                xb = np.einsum("sij,s...j->s...i", f.astype(fdtype), xb)
                xb = np.moveaxis(xb, -1, mode + 1)
            y = y + xb.sum(axis=0)
        return y

    # correctness gate: the CH3CN apply cancels ~1e3-magnitude mode-chain
    # intermediates down to O(1) outputs, so ANY f32 application has a
    # ~1e-3 forward-error floor (measured identically on the unfused f32
    # path).  The gate therefore asserts the tile-FUSION adds no error
    # beyond the intrinsic f32 floor, against the f64 host oracle.
    y32 = np.asarray(op.matvec(x))
    # the two host-side oracle applies are expensive at dim 7.5M — cache
    # them on disk keyed by config (the input is seeded, so they are
    # deterministic across runs)
    ocache = os.path.join(ROOT, f".bench_sop_oracle_{N}_{CUT}.npz")
    if os.path.exists(ocache):
        z = np.load(ocache)
        y64, y32h = z["y64"], z["y32h"]
    else:
        y64 = np_apply(np.asarray(x_np, np.float64).reshape(dims_np)
                       ).reshape(-1)
        y32h = np_apply(np.asarray(x_np, np.float32).reshape(dims_np),
                        fdtype=np.float32).reshape(-1)
        np.savez(ocache, y64=y64, y32h=y32h)
    err_fused = np.max(np.abs(y32 - y64))
    err_f32 = np.max(np.abs(y32h.astype(np.float64) - y64))
    assert err_fused < 3 * err_f32 + 1e-10, \
        f"fusion degrades accuracy: {err_fused:.2e} vs f32 floor {err_f32:.2e}"

    K = 20

    @jax.jit
    def chain(v):
        def body(i, v):
            v = op.matvec(v)
            return v / jnp.max(jnp.abs(v))
        return jax.lax.fori_loop(0, K, body, v)

    dt = _chain_time(chain, x, 3, K)

    def cpu_apply():
        # reference-native path: grouped einsum apply in NumPy (f64, like
        # the reference's operatornD SoP application)
        xt = np.asarray(x_np, np.float64).reshape(dims_np)
        t0 = time.perf_counter()
        for _ in range(2):
            xt = np_apply(xt)
            xt = xt / np.abs(xt).max()
        return (time.perf_counter() - t0) / 2

    b = baseline("sop_ch3cn_apply", f"{N}-{CUT}", cpu_apply)
    emit("sop_ch3cn_gflops", uflops / dt / 1e9, "GFLOP/s",
         (uflops / dt) / (uflops / b),
         apply_ms=round(dt * 1e3, 2),
         note="useful-FLOP basis; tile-fused super-modes (fuse=256)")


# -- metric 4: FEAST window ---------------------------------------------------
def _feast_problem():
    from eigensolvers_tpu.models.synthetic import known_spectrum_matrix
    n = 2048
    H64, ev = known_spectrum_matrix(n, eigenvalues=np.linspace(1, float(n), n),
                                    seed=10)
    return n, np.asarray(H64), ev, 1000.25, 1004.75


def bench_feast():
    import scipy.linalg as la
    from eigensolvers_tpu import (JaxVector, feastDiagonalization,
                                  select_within_range, as_operator)

    n, H64, ev, eMin, eMax = _feast_problem()
    m0, nc = 10, 8
    truth = select_within_range(ev, eMin, eMax)[0]
    rng = np.random.RandomState(3)
    Yg = la.qr(rng.rand(n, m0), mode="economic")[0]

    def run(vec_cls, H, dtype, ls_args, maxit=8, check=True):
        Y = [vec_cls(Yg[:, i].astype(dtype),
                     {"linearSystemArgs": dict(ls_args)}) for i in range(m0)]
        t0 = time.perf_counter()
        evF, _, st = feastDiagonalization(H, Y, nc, "legendre", eMin, eMax,
                                          1e-6, maxit, writeOut=False)
        dt = time.perf_counter() - t0
        if not check:
            return dt
        got = np.sort(select_within_range(np.asarray(evF), eMin, eMax)[0])
        errs = [min(abs(got - t)) for t in truth] if len(got) else [9e9]
        assert len(got) >= len(truth) and max(errs) < 1e-4, \
            f"FEAST incorrect: found {len(got)}, maxerr {max(errs):.2e}"
        return dt

    H32 = as_operator(H64.astype(np.float32))
    ours_args = {"linearSolver": "minres", "linearIter": 2500,
                 "linear_tol": 1e-5, "errorOnNonConvergence": False}
    # warm/compile only: TWO outer iterations — the auto warm-start policy
    # alternates cold and warm program variants (separate compiles), and a
    # 1-iteration warmup would leave the warm variant compiling inside the
    # timed run (~5 s artifact)
    run(JaxVector, H32, np.float32, ours_args, maxit=2, check=False)
    t_ours = run(JaxVector, H32, np.float32, ours_args)

    def cpu_feast():
        from eigensolvers_tpu.vectors.numpy_backend import NumpyVector
        return run(NumpyVector, H64, np.float64,
                   {"linearSolver": "pardiso",
                    "errorOnNonConvergence": False}, maxit=6)

    t_base = baseline("feast_window", f"{n}-{m0}-{nc}", cpu_feast)
    emit("feast_window_wall_s", t_ours, "s", t_base / t_ours,
         note="split-complex batched MINRES f32 vs reference-native "
              "NumpyVector+exact-direct f64")


# -- metric 4b: Chebyshev window (solve-free) ---------------------------------
def bench_chebyshev():
    """Same window task as metric 4, solved by the polynomial filter —
    no linear solves, one jitted batched-matvec chain per outer iteration.
    Shares the feast_window CPU baseline (identical task), so vs_baseline is
    directly comparable with feast_window_wall_s."""
    import scipy.linalg as la
    from eigensolvers_tpu import (JaxVector, select_within_range,
                                  as_operator,
                                  chebyshevFilteredDiagonalization)

    n, H64, ev, eMin, eMax = _feast_problem()
    m0 = 10
    truth = select_within_range(ev, eMin, eMax)[0]
    rng = np.random.RandomState(3)
    Yg = la.qr(rng.rand(n, m0), mode="economic")[0]
    H32 = as_operator(H64.astype(np.float32))
    bounds = (float(ev[0]) - 1.0, float(ev[-1]) + 1.0)

    def run():
        Y = [JaxVector(Yg[:, i].astype(np.float32), {}) for i in range(m0)]
        t0 = time.perf_counter()
        evC, _, st = chebyshevFilteredDiagonalization(
            H32, Y, 1200, eMin, eMax, 1e-6, 30, specBounds=bounds,
            writeOut=False)
        dt = time.perf_counter() - t0
        got = np.sort(select_within_range(np.asarray(evC), eMin, eMax)[0])
        errs = [min(abs(got - t)) for t in truth] if len(got) else [9e9]
        assert len(got) >= len(truth) and max(errs) < 1e-4, \
            f"Chebyshev incorrect: found {len(got)}, maxerr {max(errs):.2e}"
        return dt

    run()                                   # warm/compile
    t_ours = run()
    cache = _load_cache()
    ent = cache.get("feast_window")
    t_base = float(ent["value"]) if ent else float("nan")
    emit("chebyshev_window_wall_s", t_ours, "s", t_base / t_ours,
         note="solve-free Jackson-damped Chebyshev filter (degree 1200) "
              "f32; same task and CPU baseline as feast_window_wall_s")


# -- metric 5: virtual-mesh sharding overhead ---------------------------------
_SHARD_SNIPPET = r"""
import os, time, json
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from eigensolvers_tpu.models.synthetic import known_spectrum_matrix
from eigensolvers_tpu.ops.linear_solvers import minres_batch
from eigensolvers_tpu.ops.operators import DenseOperator
from eigensolvers_tpu.parallel.mesh import make_mesh

n, lanes = 1024, 8
H, ev = known_spectrum_matrix(n, eigenvalues=np.linspace(1, 1200, n), seed=2,
                              dtype=np.float64)
op = DenseOperator(np.asarray(H))
rng = np.random.RandomState(0)
B = jnp.asarray(rng.rand(lanes, n))
sig = jnp.asarray(np.linspace(200.0, 900.0, lanes))

def timed(Bp):
    r = minres_batch(op, Bp, sig, rtol=1e-6, atol=0.0, maxiter=400)
    np.asarray(r.x)  # compile+run
    best = float("inf")
    for _ in range(3):   # best-of-3: scheduler noise on the 2-core host
        t0 = time.perf_counter()
        r = minres_batch(op, Bp, sig, rtol=1e-6, atol=0.0, maxiter=400)
        np.asarray(r.x)
        best = min(best, time.perf_counter() - t0)
    return best

t1 = timed(B)
mesh = make_mesh(batch=8)
Bs = jax.device_put(B, NamedSharding(mesh, P("b", None)))
t8 = timed(Bs)
print(json.dumps({"t1": t1, "t8": t8}))
"""


def bench_sharding_overhead():
    env = dict(os.environ)
    # pure-CPU probe: drop the TPU plugin hook (a sitecustomize on
    # PYTHONPATH registers the remote-TPU PJRT client in every python
    # process; under a degraded tunnel that blocks even CPU backend init)
    env["PYTHONPATH"] = ROOT
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run([sys.executable, "-c", _SHARD_SNIPPET], env=env,
                         capture_output=True, text=True, timeout=150)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    emit("sharding_overhead_x8", d["t8"] / d["t1"], "ratio",
         d["t1"] / d["t8"],
         note="8-lane batched MINRES, (8,1) virtual CPU mesh vs unsharded; "
              "2-core host so ideal ratio ~1.0 (partitioning overhead, "
              "not multi-chip speedup); lanes route through the shard_map "
              "local-while-loop schedule (zero collectives, asserted in "
              "tests/test_spmd.py)")


# -- headline: dense-2048 interior Lanczos ------------------------------------
def bench_lanczos_headline():
    import jax
    from eigensolvers_tpu import JaxVector, as_operator, calculateTarget
    from eigensolvers_tpu.models.synthetic import known_spectrum_matrix
    from eigensolvers_tpu.solvers.fast_lanczos import \
        fastLanczosDiagonalization
    from eigensolvers_tpu import inexactLanczosDiagonalization

    N, TARGET_INDEX, L, MAXIT, ECONV = 2048, 1316, 30, 10, 1e-6
    H64, ev = known_spectrum_matrix(N, eigenvalues=np.linspace(1, 1400, N),
                                    seed=10, dtype=np.float64)
    sigma = float(calculateTarget(ev, TARGET_INDEX))
    rng = np.random.RandomState(3)
    guess = rng.rand(N)
    truth = float(ev[np.argmin(np.abs(np.asarray(ev) - sigma))])

    def nearest(evs, x):
        evs = np.asarray(evs)
        return float(evs[np.argmin(np.abs(evs - x))])

    def cpu_run():
        from eigensolvers_tpu.vectors.numpy_backend import NumpyVector
        Y0 = NumpyVector(np.asarray(guess, np.float64),
                         {"linearSystemArgs": {
                             "linearSolver": "gcrotmk", "linearIter": 8000,
                             "linear_tol": 1e-4, "linear_atol": 1e-4,
                             "errorOnNonConvergence": False}})
        t0 = time.perf_counter()
        evL, _, _ = inexactLanczosDiagonalization(
            np.asarray(H64), Y0, sigma, L, MAXIT, ECONV, writeOut=False)
        dt = time.perf_counter() - t0
        assert abs(nearest(evL, sigma) - truth) < 1e-3
        return dt

    t_base = baseline("dense2048_lanczos",
                      f"{N}-{L}-{MAXIT}-{ECONV}", cpu_run)

    H32 = as_operator(np.asarray(H64).astype(np.float32))
    jax.block_until_ready(H32.mat)
    opts = {"linearSystemArgs": {
        "linearSolver": "minres", "linearIter": 8000, "linear_tol": 1e-4,
        "linear_atol": 1e-4, "errorOnNonConvergence": False}}

    def tpu_run():
        Y0 = JaxVector(np.asarray(guess, np.float32), opts)
        t0 = time.perf_counter()
        evL, _, _ = fastLanczosDiagonalization(H32, Y0, sigma, L, MAXIT,
                                               ECONV)
        dt = time.perf_counter() - t0
        assert abs(nearest(evL, sigma) - truth) < 1e-2
        return dt

    tpu_run()                       # compile (cached across rounds)
    t_ours = tpu_run()
    emit("dense2048_interior_lanczos_wall", t_ours, "s", t_base / t_ours)


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    jax.config.update("jax_enable_x64", True)
    warnings.filterwarnings("ignore")

    t_start = time.perf_counter()
    budget = float(os.environ.get("BENCH_BUDGET_S", "480"))
    _META.update({"platform": jax.devices()[0].platform,
                  "device": str(jax.devices()[0])})

    # (name, fn, worst-case seconds): the headline runs FIRST so it is
    # captured even if a later bench blows the driver budget; each bench is
    # skipped when the remaining budget cannot cover its worst case, and a
    # failure in one bench never loses the others.
    benches = [
        ("dense2048_interior_lanczos_wall", bench_lanczos_headline, 90),
        ("feast_window_wall_s", bench_feast, 150),
        ("chebyshev_window_wall_s", bench_chebyshev, 60),
        ("bsr_spmv_gflops", bench_bsr, 70),
        ("sharding_overhead_x8", bench_sharding_overhead, 150),
        ("sop_ch3cn_gflops", bench_sop, 150),
    ]
    for name, fn, worst in benches:
        left = budget - (time.perf_counter() - t_start)
        if left < worst:
            print(f"# skip {name}: {left:.0f}s left < {worst}s worst case",
                  file=sys.stderr, flush=True)
            continue
        t0 = time.perf_counter()
        # hard per-bench timeout (SIGALRM): a hung device fetch or a
        # CPU-fallback bench running 30x slow must not starve the benches
        # behind it.  Best-effort — a fetch blocked in C returns to the
        # interpreter only when data arrives — but it bounds every
        # Python-visible stall.
        def _alarm(signum, frame):
            raise TimeoutError(f"bench exceeded {int(left)}s budget")
        old = signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(max(int(left), 1))
        try:
            fn()
            print(f"# {name}: {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr, flush=True)
        except Exception as e:
            print(f"# {name} FAILED after {time.perf_counter() - t0:.1f}s: "
                  f"{type(e).__name__}: {e}", file=sys.stderr, flush=True)
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    json.dump({**_META, "metrics": METRICS}, open(RESULTS, "w"), indent=1)
    # the headline is re-printed LAST for drivers that parse one trailing
    # line (every metric was already streamed above when measured)
    headline = [m for m in METRICS
                if m["metric"] == "dense2048_interior_lanczos_wall"]
    if headline:
        print(json.dumps(headline[-1]), flush=True)
    return 0 if METRICS else 1


if __name__ == "__main__":
    sys.exit(main())
