"""Tip5 parity fill-ins vs the reference inline tests
(twenty-first/src/tip5/mod.rs, cited per test). The heavy snapshots
(chained hash_10, raw-state permutation, hash_varlen digest-sum) live in
test_tip5.py; this file covers the remaining named reference tests."""

import random

import pytest

from twenty_first_tpu.math.b_field_element import P, bfe
from twenty_first_tpu.tip5.constants import (LOOKUP_TABLE, MDS_MATRIX_FIRST_COLUMN)
from twenty_first_tpu.tip5.tip5 import Tip5


def test_tip5_hasher_trait_snapshot():
    # tip5/mod.rs:1526-1531 `tip5_hasher_trait_snapshot_test`
    hasher = Tip5.init()
    hasher.write(b"hello world")
    assert hasher.finish() == 2267905471610932299


def test_tip5_hasher_consumes_small_data():
    # tip5/mod.rs:1533-1539
    rng = random.Random(1)
    for _ in range(10):
        data = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(1, 40)))
        hasher = Tip5.init()
        hasher.write(data)
        assert hasher.finish() != Tip5.init().finish()


def test_appending_small_data_to_big_data_changes_hash():
    # tip5/mod.rs:1541-1555 — finish() does not terminate the hasher
    rng = random.Random(2)
    big = bytes(rng.randrange(256) for _ in range(3000))
    hasher = Tip5.init()
    hasher.write(big)
    first = hasher.finish()
    hasher.write(b"x")
    assert hasher.finish() != first


def test_trace_starts_with_initial_state_and_matches_permutation():
    # tip5/mod.rs:1557+ `tip5_trace_starts_with_initial_state_and_is_
    # equivalent_to_permutation`
    rng = random.Random(3)
    sponge = Tip5.init()
    sponge.state = [bfe(rng.randrange(P)) for _ in range(16)]
    initial = [s.value() for s in sponge.state]
    trace = sponge.trace()
    assert len(trace) == 6
    assert [v.value() for v in trace[0]] == initial
    assert [v.value() for v in trace[-1]] == \
        [s.value() for s in sponge.state]
    # one permutation applied exactly
    check = Tip5.init()
    check.state = [bfe(v) for v in initial]
    check.permutation()
    assert [s.value() for s in check.state] == \
        [v.value() for v in trace[-1]]


def test_fermat_cube_map_is_permutation():
    # tip5/mod.rs `test_fermat_cube_map_is_permutation`
    # offset Fermat cube map stays within 0..255 and is a bijection
    mapped = [((x + 1) ** 3 % 257) - 1 for x in range(256)]
    assert sorted(mapped) == list(range(256))
    assert list(LOOKUP_TABLE) == mapped


def test_linearity_of_mds():
    # tip5/mod.rs:1391-1455 `test_linearity_of_mds`: M(a*x + y) == a*Mx + My
    rng = random.Random(4)

    col = [int(v) for v in MDS_MATRIX_FIRST_COLUMN]

    def mds(vec):
        return [
            sum(col[(i - j) % 16] * vec[j] for j in range(16)) % P
            for i in range(16)
        ]

    x = [rng.randrange(P) for _ in range(16)]
    y = [rng.randrange(P) for _ in range(16)]
    a = rng.randrange(P)
    lhs = mds([(a * xi + yi) % P for xi, yi in zip(x, y)])
    mx, my = mds(x), mds(y)
    rhs = [(a * mi + ni) % P for mi, ni in zip(mx, my)]
    assert lhs == rhs


def test_mds_circulancy():
    # tip5/mod.rs `test_mds_circulancy`: row i is the first column rotated
    first_row = [MDS_MATRIX_FIRST_COLUMN[(0 - j) % 16] for j in range(16)]
    for i in range(16):
        row = [MDS_MATRIX_FIRST_COLUMN[(i - j) % 16] for j in range(16)]
        assert row == first_row[-i:] + first_row[:-i]


def test_round_constants_derivation():
    # tip5/mod.rs:1056-1085 `round_constants_are_correct`: RC[i] is
    # blake3("Tip5" || i), first 16 bytes as a little-endian u128, mod p,
    # interpreted as the RAW MONTGOMERY word (`BFieldElement::from_raw_u64`)
    # — so the canonical value is that residue times R^-1 = 2^-64 mod p.
    # Runs on the vendored pure-Python blake3 (tip5/blake3_mini.py), itself
    # pinned to the official empty-input test vector.
    from twenty_first_tpu.tip5.blake3_mini import blake3
    from twenty_first_tpu.tip5.constants import ROUND_CONSTANTS

    assert len(ROUND_CONSTANTS) == 80
    assert all(0 <= int(c) < P for c in ROUND_CONSTANTS)
    r_inv = pow(1 << 64, P - 2, P)
    for i, want in enumerate(ROUND_CONSTANTS):
        digest = blake3(b"Tip5" + bytes([i]))
        raw = int.from_bytes(digest[:16], "little") % P
        assert raw * r_inv % P == int(want)


def test_sample_indices_upper_bound_and_determinism():
    # tip5/mod.rs:636-656 `sample_indices` contract
    sponge = Tip5.init()
    sponge.pad_and_absorb_all([bfe(42)])
    idx = sponge.sample_indices(1 << 10, 64)
    assert len(idx) == 64
    assert all(0 <= i < (1 << 10) for i in idx)
    sponge2 = Tip5.init()
    sponge2.pad_and_absorb_all([bfe(42)])
    assert sponge2.sample_indices(1 << 10, 64) == idx
