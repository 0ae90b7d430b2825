"""InverseTip5 parity family (tip5/inverse.rs:114-179).

Mirrors the reference's test module: inverse-table / exponent identities,
per-step roundtrips (sbox, MDS, round), and the full permutation
roundtrip — plus spot-pins of our *derived* inverse constants against the
values the reference hardcodes."""

import random

from twenty_first_tpu.math.b_field_element import P, bfe
from twenty_first_tpu.tip5.constants import (
    LOOKUP_TABLE,
    MDS_MATRIX_FIRST_COLUMN,
    NUM_ROUNDS,
    STATE_SIZE,
)
from twenty_first_tpu.tip5.inverse import (
    INV_LOOKUP_TABLE,
    INV_MDS_MATRIX_FIRST_COLUMN,
    INV_POWER_MAP_EXPONENT,
    InverseTip5,
)
from twenty_first_tpu.tip5.tip5 import Tip5, _round_values, _sbox_values

_rng = random.Random(0x7195)


def _random_state():
    return [_rng.randrange(P) for _ in range(STATE_SIZE)]


def test_inv_lookup_table_is_inv_of_lookup_table():
    # inverse.rs:122-128
    for idx, looked_up in enumerate(LOOKUP_TABLE.tolist()):
        assert INV_LOOKUP_TABLE[looked_up] == idx


def test_inv_power_map_exponent_is_bezout_coefficient_of_7():
    # inverse.rs:131-135; the derived exponent equals the reference pin
    # (inverse.rs:36).
    assert (INV_POWER_MAP_EXPONENT * 7) % (P - 1) == 1
    assert INV_POWER_MAP_EXPONENT == 10_540_996_611_094_048_183


def test_inv_power_map_computes_the_correct_root():
    # inverse.rs:137-141
    for _ in range(32):
        x = _rng.randrange(P)
        assert pow(pow(x, 7, P), INV_POWER_MAP_EXPONENT, P) == x


def test_inv_mds_column_matches_reference_pins():
    # Derived in the cyclic-NTT domain; the reference pins all 16 words
    # (inverse.rs:39-56) — spot-check the first and last.
    assert INV_MDS_MATRIX_FIRST_COLUMN[0] == 0xDCD4BBCC7ABBBDC8
    assert INV_MDS_MATRIX_FIRST_COLUMN[-1] == 0x1C158A0F5C11FE81


def test_inv_mds_is_matrix_inverse():
    # circ(col) @ circ(inv_col) == I over GF(p): their cyclic convolution
    # must be the unit impulse.
    col = [int(c) for c in MDS_MATRIX_FIRST_COLUMN]
    conv = [
        sum(
            col[j] * INV_MDS_MATRIX_FIRST_COLUMN[(k - j) % STATE_SIZE]
            for j in range(STATE_SIZE)
        )
        % P
        for k in range(STATE_SIZE)
    ]
    assert conv == [1] + [0] * (STATE_SIZE - 1)


def test_inv_sbox_layer_roundtrip():
    # inverse.rs:143-151; forward layer is the production _sbox_values
    for _ in range(8):
        orig = _random_state()
        inv = InverseTip5(_sbox_values(orig))
        inv.inv_sbox_layer()
        assert [e.value() for e in inv.state] == orig


def test_inv_mds_matrix_mul_roundtrip():
    # inverse.rs:153-161
    col = [int(c) for c in MDS_MATRIX_FIRST_COLUMN]
    for _ in range(8):
        orig = _random_state()
        mixed = [
            sum(col[(i - j) % STATE_SIZE] * orig[j] for j in range(STATE_SIZE))
            % P
            for i in range(STATE_SIZE)
        ]
        inv = InverseTip5(mixed)
        inv.inv_mds_matrix_mul()
        assert [e.value() for e in inv.state] == orig


def test_inv_round_roundtrip():
    # inverse.rs:163-170
    for round_idx in range(NUM_ROUNDS):
        orig = _random_state()
        inv = InverseTip5(_round_values(orig, round_idx))
        inv.inv_round(round_idx)
        assert [e.value() for e in inv.state] == orig


def test_inv_permutation_roundtrip():
    # inverse.rs:172-179
    for _ in range(4):
        orig = _random_state()
        tip5 = Tip5.init()
        tip5.state = [bfe(v) for v in orig]
        tip5.permutation()
        inv = InverseTip5([e.value() for e in tip5.state])
        inv.inv_permutation()
        assert [e.value() for e in inv.state] == orig
