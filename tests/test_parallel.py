"""Distributed (multi-chip) tests on the 8-device virtual CPU mesh:
four-step all-to-all NTT and sharded Merkle commit, bit-exact vs the
single-chip paths."""

import numpy as np
import pytest

import jax

from twenty_first_tpu.math import ntt
from twenty_first_tpu.math.b_field_element import P
from twenty_first_tpu.parallel import (
    distributed_merkle_root,
    distributed_ntt_values,
    make_mesh,
)
from twenty_first_tpu.util_types.merkle_tree import MerkleTree

RNG = np.random.default_rng(1234)


def require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize("log_n", [8, 12])
def test_distributed_ntt_matches_single_chip(n_dev, log_n):
    require_devices(n_dev)
    mesh = make_mesh(n_dev)
    x = RNG.integers(0, P, size=1 << log_n, dtype=np.uint64)
    want = ntt.ntt_values(x)
    got = distributed_ntt_values(x, mesh)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n_dev", [4])
@pytest.mark.parametrize("log_n", [10])
def test_distributed_intt_roundtrip(n_dev, log_n):
    require_devices(n_dev)
    mesh = make_mesh(n_dev)
    x = RNG.integers(0, P, size=1 << log_n, dtype=np.uint64)
    fwd = distributed_ntt_values(x, mesh)
    back = distributed_ntt_values(fwd, mesh, inverse=True)
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("n_dev", [2, 8])
@pytest.mark.parametrize("log_n", [3, 7])
def test_distributed_merkle_root(n_dev, log_n):
    require_devices(n_dev)
    mesh = make_mesh(n_dev)
    leafs = RNG.integers(0, P, size=(1 << log_n, 5), dtype=np.uint64)
    got = distributed_merkle_root(leafs, mesh)
    want = MerkleTree.new(leafs).root()
    assert got == want


@pytest.mark.parametrize("n_dev,log_n", [(4, 10), (8, 12)])
def test_distributed_xfe_ntt_matches_single_chip(n_dev, log_n):
    """Sharded extension-field NTT (three base-field plane transforms over
    the mesh) is bit-exact vs the single-chip xfe path."""
    from twenty_first_tpu.parallel import (make_mesh,
                                           distributed_ntt_xfe_values)

    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(log_n)
    vals = rng.integers(0, P, size=(1 << log_n, 3), dtype=np.uint64)
    got = distributed_ntt_xfe_values(vals, mesh)
    from twenty_first_tpu.math import ntt as ntt_mod
    want = ntt_mod.ntt_values(vals.T).T
    np.testing.assert_array_equal(got, want)
    back = distributed_ntt_xfe_values(got, mesh, inverse=True)
    np.testing.assert_array_equal(back, vals)


@pytest.mark.parametrize("chunks", [1, 2, 4])
def test_distributed_ntt_a2a_overlap_chunks_bit_exact(chunks):
    """The chunked (overlappable) all-to-all transpose must be bit-exact
    with the monolithic one and with the single-chip transform, for both
    directions (round-5 verdict item #2: the overlap lever in code)."""
    require_devices(8)
    mesh = make_mesh(8)
    x = RNG.integers(0, P, size=1 << 14, dtype=np.uint64)
    want = ntt.ntt_values(x)
    got = distributed_ntt_values(x, mesh, a2a_chunks=chunks)
    np.testing.assert_array_equal(got, want)
    back = distributed_ntt_values(got, mesh, inverse=True, a2a_chunks=chunks)
    np.testing.assert_array_equal(back, x)
