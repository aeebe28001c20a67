"""Native async checkpoint writer: build, write, round-trip, backpressure."""

import io
import os

import numpy as np
import pytest

from eigensolvers_tpu.io.fastwriter import AsyncWriter
from eigensolvers_tpu import JaxVector
from eigensolvers_tpu.utils import checkpointing


def test_async_roundtrip(tmp_path):
    w = AsyncWriter(max_queue=4)
    try:
        rng = np.random.RandomState(0)
        arrays = {f"a{i}": rng.rand(100, 50) for i in range(8)}
        for name, arr in arrays.items():
            w.submit_npz(str(tmp_path / f"{name}.npz"), data=arr)
        errs = w.flush()
        assert errs == 0
        for name, arr in arrays.items():
            loaded = np.load(str(tmp_path / f"{name}.npz"))["data"]
            np.testing.assert_array_equal(loaded, arr)
        # no stray .tmp files (atomic rename)
        assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]
    finally:
        w.close()


def test_native_library_builds():
    w = AsyncWriter()
    try:
        # The image ships g++, so the native path must be live here;
        # the sync fallback is for compiler-less deployments.
        assert w.available
    finally:
        w.close()


def test_checkpoint_with_async_writer(tmp_path):
    rng = np.random.RandomState(1)
    vecs = [JaxVector(rng.rand(64)) for _ in range(3)]
    w = AsyncWriter()
    try:
        checkpointing.save_checkpoint(str(tmp_path), 7, vecs,
                                      {"cumIter": 7}, async_writer=w)
        assert w.flush() == 0
    finally:
        w.close()
    loaded, meta = checkpointing.load_checkpoint(str(tmp_path), 7, JaxVector)
    assert meta["status"]["cumIter"] == 7
    for a, b in zip(vecs, loaded):
        np.testing.assert_array_equal(np.asarray(a.array), np.asarray(b.array))


def test_writer_survives_bad_path(tmp_path):
    w = AsyncWriter()
    try:
        w.submit_bytes(str(tmp_path / "nodir" / "x.bin"), b"abc")
        errs = w.flush()
        if w.available:
            assert errs >= 1          # error counted, thread alive
        # writer still usable afterwards
        w.submit_bytes(str(tmp_path / "ok.bin"), b"xyz")
        assert w.flush() == errs      # no new errors
        assert open(tmp_path / "ok.bin", "rb").read() == b"xyz"
    finally:
        w.close()
