"""Mesh-sharded MMR peaks / batch-append vs the host accumulator oracle.

Runs on the 8-virtual-CPU-device mesh (conftest). The oracle is
MmrAccumulator (itself pinned against ArchivalMmr in
test_archival_mmr_parity.py), so bit-equality here certifies the
sharded reductions AND the carry-merge logic of dist_mmr
(mmr_accumulator.rs:96-115 analogue).
"""

import numpy as np
import pytest

from twenty_first_tpu.parallel import make_mesh
from twenty_first_tpu.parallel.dist_mmr import (
    distributed_batch_append,
    distributed_peaks_from_leafs,
)
from twenty_first_tpu.util_types.mmr.mmr_accumulator import MmrAccumulator

RNG = np.random.default_rng(0xD157)
P = (1 << 64) - (1 << 32) + 1


def _leafs(n):
    return RNG.integers(0, P, size=(n, 5), dtype=np.uint64)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


@pytest.mark.parametrize(
    "n", [0, 1, 2, 3, 8, 37, (1 << 8) + 19, (1 << 10) + (1 << 7) + 1])
def test_distributed_peaks_match_accumulator(mesh, n):
    leafs = _leafs(n)
    want = MmrAccumulator.peaks_from_leafs(leafs)
    got = distributed_peaks_from_leafs(leafs, mesh)
    assert got == want


@pytest.mark.parametrize("c0,m", [
    (0, 1), (0, 100), (1, 1), (5, 3), (37, 91),
    ((1 << 9) + 3, (1 << 8) + 17),          # carries across chunk sizes
    ((1 << 10) - 1, (1 << 10) + 1),          # full carry chain
])
def test_distributed_batch_append_matches_sequential(mesh, c0, m):
    base = _leafs(c0)
    batch = _leafs(m)
    peaks0 = MmrAccumulator.peaks_from_leafs(base)
    got_peaks, got_count = distributed_batch_append(peaks0, c0, batch, mesh)
    # peaks depend only on the full leaf sequence
    want = MmrAccumulator.peaks_from_leafs(np.concatenate([base, batch]))
    assert got_count == c0 + m
    assert got_peaks == want


def test_distributed_batch_append_equals_repeated_append(mesh):
    # direct oracle: m sequential accumulator appends
    from twenty_first_tpu.tip5.digest import Digest

    c0, m = 21, 43
    base, batch = _leafs(c0), _leafs(m)
    acc = MmrAccumulator.new_from_leafs(base)
    for row in batch:
        acc.append(Digest.from_array(row))
    got_peaks, got_count = distributed_batch_append(
        MmrAccumulator.peaks_from_leafs(base), c0, batch, mesh)
    assert got_count == acc.num_leafs()
    assert got_peaks == acc.peaks()
