"""Worker process for the 2-process jax.distributed smoke test.

Usage: python multihost_worker.py <port> <process_id> <out_npy>

Each of the 2 processes owns 4 virtual CPU devices; together they form the
8-device (b=2, x=4) mesh that `block_krylov_step` is jitted over — the
multi-host path the reference never had (its only trace is an inert MPI
import, reference: examples/ttns2_ch3cn.py:8-10).
"""

import os
import sys

port, pid, out_npy = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

from eigensolvers_tpu.parallel.mesh import distributed_initialize  # noqa: E402

distributed_initialize(coordinator_address=f"localhost:{port}",
                       num_processes=2, process_id=pid)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from eigensolvers_tpu.ops.operators import DenseOperator  # noqa: E402
from eigensolvers_tpu.parallel import make_mesh  # noqa: E402
from eigensolvers_tpu.solvers.step import block_krylov_step  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

mesh = make_mesh(batch=2, shard=4)


def put(arr, spec):
    """Global array from identical per-process host data."""
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])


n = 64
ev = np.linspace(1.0, 40.0, n)
rng = np.random.RandomState(7)
Q = np.linalg.qr(rng.rand(n, n))[0]
A = (Q.T * ev) @ Q

M, nBlock = 8, 2
V = np.zeros((M, n))
g = rng.rand(nBlock, n)
g /= np.linalg.norm(g, axis=1, keepdims=True)
gq = np.linalg.qr(g.T)[0].T
V[:nBlock] = gq

op = DenseOperator(put(A, P("x", None)))
Vd = put(V, P(None, "x"))
seeds = put(V[:nBlock].copy(), P("b", "x"))

out = block_krylov_step(op, Vd, jnp.asarray(nBlock), seeds,
                        jnp.asarray(20.0), jnp.asarray(1e-6), maxiter=400)
jax.block_until_ready(out)

nv = multihost_utils.process_allgather(out.new_vectors, tiled=True)
hc = multihost_utils.process_allgather(out.h_cols, tiled=True)
sc = multihost_utils.process_allgather(out.s_cols, tiled=True)

if pid == 0:
    np.savez(out_npy, new_vectors=np.asarray(nv), h_cols=np.asarray(hc),
             s_cols=np.asarray(sc))
print(f"worker {pid} done", flush=True)
