"""Driver entry points: single-chip compile check and multi-chip dry run
must keep working (regression guard for the external driver contract)."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = fn(*args)
    jax.block_until_ready(out)
    nv = np.asarray(out.new_vectors)
    assert nv.ndim == 2 and np.all(np.isfinite(nv))
    norms = np.linalg.norm(nv, axis=1)
    assert np.all((np.abs(norms - 1) < 1e-3) | (norms < 1e-6))


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
