"""Tip5 tests: reference snapshots (tip5/mod.rs:1294-1362), constants
derivations (:1035-1085), scalar-vs-device equivalence oracles, sponge
semantics, and Fiat-Shamir helpers."""

import numpy as np
import pytest

from twenty_first_tpu.math.b_field_element import bfe, P, R, R_INV
from twenty_first_tpu.tip5 import (
    Digest,
    LOOKUP_TABLE,
    MDS_MATRIX_FIRST_COLUMN,
    RATE,
    ROUND_CONSTANTS,
    STATE_SIZE,
    Tip5,
    permutation as device,
)
from twenty_first_tpu.util_types.sponge import Domain

RNG = np.random.default_rng(7)


# --- reference snapshot anchors -------------------------------------------


def test_hash10_chained_snapshot():
    preimage = [bfe(0)] * RATE
    for i in range(6):
        digest = Tip5.hash_10(preimage)
        preimage[i: i + Digest.LEN] = digest
    final_digest = Digest(Tip5.hash_10(preimage)).to_hex()
    assert final_digest == (
        "109cc2fe453bd9962f754b96d8f5b919"
        "b60af030940a275f5540da195fef65ee651c1b6fa19b2c6a"
    )


def test_hash_varlen_digest_sum_snapshot():
    digest_sum = [bfe(0)] * Digest.LEN
    for i in range(20):
        preimage = [bfe(j) for j in range(i)]
        digest = Tip5.hash_varlen(preimage)
        digest_sum = [s + d for s, d in zip(digest_sum, digest.values())]
    assert Digest(digest_sum).to_hex() == (
        "efbafa86622a9c69652f8a1c4ffd734f"
        "021ad23a0a8085412a877de0f9170b18ea4ff69b6fff9a03"
    )


RAW_SNAPSHOT_IN = [
    0x0000_000F_FFFF_FFF0, 0x0000_0000_FFFF_FFFF, 0x0000_0000_FFFF_FFFF,
    0x0000_0028_FFFF_FFD7, 0x0000_0006_FFFF_FFF9, 0x0000_0002_FFFF_FFFD,
    0x0000_0000_FFFF_FFFF, 0x0000_0030_FFFF_FFCF, 0x0000_0397_FFFF_FC68,
    0x0000_000F_FFFF_FFF0, 0x316B_FB72_3638_2123, 0x216F_521B_66EF_83F5,
    0x5689_D7B3_63F5_2DF0, 0xEB2F_59E3_AEAE_25FC, 0xB082_99D2_77CB_B4DC,
    0xCBE3_D9FD_C534_9140,
]
RAW_SNAPSHOT_OUT5 = [
    0x15D3_8EA9_29F6_632A, 0xF988_E509_FF73_8BB4, 0x48BC_DFAE_88A2_E9F3,
    0x8733_9E83_2DAA_C02A, 0x511E_4126_8150_FDAC,
]


def test_raw_state_permutation_snapshot():
    # The reference snapshot is stated on raw Montgomery words
    # (tip5/mod.rs:1327-1362); convert raw -> value, permute, compare raw.
    state = [(raw * R_INV) % P for raw in RAW_SNAPSHOT_IN]
    sponge = Tip5.init()
    sponge.state = [bfe(v) for v in state]
    sponge.permutation()
    got_raw = [(e.value() * R) % P for e in sponge.state[:5]]
    assert got_raw == RAW_SNAPSHOT_OUT5


def test_device_permutation_matches_snapshot_and_scalar():
    values = np.array([[(raw * R_INV) % P for raw in RAW_SNAPSHOT_IN]],
                      dtype=np.uint64)
    out = device.permutation_values(values)
    got_raw = [(int(v) * R) % P for v in out[0, :5]]
    assert got_raw == RAW_SNAPSHOT_OUT5

    # random batch: device == scalar oracle
    batch = RNG.integers(0, P, size=(17, STATE_SIZE), dtype=np.uint64)
    dev = device.permutation_values(batch)
    for row in range(batch.shape[0]):
        sponge = Tip5.init()
        sponge.state = [bfe(int(v)) for v in batch[row]]
        sponge.permutation()
        assert [e.value() for e in sponge.state] == dev[row].tolist()


# --- constants derivations -------------------------------------------------


def test_lookup_table_is_offset_fermat_cube_map():
    want = [((x + 1) ** 3 - 1) % 257 for x in range(256)]
    assert LOOKUP_TABLE.tolist() == want
    # spot-pin against the reference's hardcoded table head/tail
    assert LOOKUP_TABLE[:8].tolist() == [0, 7, 26, 63, 124, 215, 85, 254]
    assert LOOKUP_TABLE[-8:].tolist() == [1, 170, 40, 131, 192, 229, 248, 255]


def test_mds_first_column():
    assert MDS_MATRIX_FIRST_COLUMN.tolist() == [
        61402, 1108, 28750, 33823, 7454, 43244, 53865, 12034,
        56951, 27521, 41351, 40901, 12021, 59689, 26798, 17845,
    ]


def test_round_constants_are_canonical():
    assert all(0 < int(c) < P for c in ROUND_CONSTANTS)
    assert int(ROUND_CONSTANTS[0]) == 13630775303355457758
    assert int(ROUND_CONSTANTS[-1]) == 6024642864597845108


# --- sponge semantics ------------------------------------------------------


def test_fixed_vs_variable_length_domains_differ():
    ten = [bfe(i) for i in range(10)]
    fixed = Digest(Tip5.hash_10(ten))
    variable = Tip5.hash_varlen(ten)
    assert fixed != variable  # capacity init differs


def test_hash_varlen_equals_manual_sponge():
    for n in [0, 1, 9, 10, 11, 25, 30]:
        preimage = [bfe(i * i + 1) for i in range(n)]
        sponge = Tip5.init()
        sponge.pad_and_absorb_all(preimage)
        manual = Digest(sponge.state[: Digest.LEN])
        assert manual == Tip5.hash_varlen(preimage), n


def test_device_hash_varlen_matches_scalar():
    for n in [0, 1, 9, 10, 19, 31]:
        batch = RNG.integers(0, P, size=(4, n), dtype=np.uint64)
        dev = device.hash_varlen(batch)
        for row in range(4):
            want = Tip5.hash_varlen([bfe(int(v)) for v in batch[row]])
            assert Digest.from_array(dev[row]) == want, (n, row)


def test_device_hash_pair_matches_scalar():
    left = RNG.integers(0, P, size=(8, 5), dtype=np.uint64)
    right = RNG.integers(0, P, size=(8, 5), dtype=np.uint64)
    from twenty_first_tpu.math import gf

    out = gf.from_limbs(device.hash_pair(gf.to_limbs(left), gf.to_limbs(right)))
    for i in range(8):
        want = Tip5.hash_pair(Digest.from_array(left[i]), Digest.from_array(right[i]))
        assert Digest.from_array(out[i]) == want


def test_trace():
    sponge = Tip5(Domain.FIXED_LENGTH)
    start = list(sponge.state)
    trace = sponge.trace()
    assert len(trace) == 6 and all(len(row) == STATE_SIZE for row in trace)
    assert trace[0] == start
    # last trace row == permutation of start
    check = Tip5(Domain.FIXED_LENGTH)
    check.permutation()
    assert trace[-1] == check.state
    # device trace agrees
    vals = np.array([[e.value() for e in start]], dtype=np.uint64)
    dev = device.trace_values(vals)
    assert dev.shape == (1, 6, 16)
    for r in range(6):
        assert dev[0, r].tolist() == [e.value() for e in trace[r]]


def test_squeeze_absorb_cycle():
    sponge = Tip5.init()
    sponge.absorb([bfe(i) for i in range(10)])
    first = sponge.squeeze()
    second = sponge.squeeze()
    assert first != second
    assert len(first) == RATE


def test_sample_indices():
    sponge = Tip5.init()
    sponge.pad_and_absorb_all([bfe(42)])
    indices = sponge.sample_indices(1 << 20, 100)
    assert len(indices) == 100
    assert all(0 <= i < (1 << 20) for i in indices)
    from twenty_first_tpu.errors import SpongeError

    with pytest.raises(SpongeError):
        sponge.sample_indices(1000, 1)  # not a power of two


def test_sample_scalars():
    sponge = Tip5.init()
    sponge.pad_and_absorb_all([bfe(7)])
    scalars = sponge.sample_scalars(7)
    assert len(scalars) == 7
    # deterministic: same absorb -> same scalars
    sponge2 = Tip5.init()
    sponge2.pad_and_absorb_all([bfe(7)])
    assert sponge2.sample_scalars(7) == scalars


def test_digest_roundtrips():
    d = Digest([1, 2, 3, 4, 5])
    assert Digest.try_from_hex(d.to_hex()) == d
    assert Digest.from_bytes(d.to_bytes()) == d
    assert Digest.from_biguint(d.to_biguint()) == d
    assert Digest.from_str(str(d)) == d
    # ordering is reversed-limb lexicographic
    a = Digest([2, 0, 0, 0, 0])
    b = Digest([1, 0, 0, 0, 1])
    assert a < b
    d2 = d.hash()
    assert d2 == Tip5.hash_pair(d, Digest.all_zero())
