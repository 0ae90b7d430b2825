"""The driver's entry points must compile and run (single chip + 8-device
virtual mesh)."""

import numpy as np

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.block_until_ready(fn(*args))
    lo, hi = out
    assert lo.shape == (1, 5)
    # deterministic
    out2 = fn(*args)
    assert np.array_equal(np.asarray(lo), np.asarray(out2[0]))


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
