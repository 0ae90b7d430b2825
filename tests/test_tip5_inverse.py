"""Inverse-Tip5 oracle + NTT-based MDS oracle.

Mirrors two reference test oracles (SURVEY §4.3):
  * InverseTip5 (tip5/inverse.rs:62-179): every permutation layer is
    invertible; applying the inverse layers in reverse roundtrips to the
    identity. This pins down that no layer silently loses information.
  * mds_cyclomul (tip5/mod.rs:753-1027): an MDS implementation via cyclic
    convolution, here realized with the library's own length-16 NTT
    (circulant matvec == intt(ntt(col) * ntt(state))) — an independent
    derivation of both the MDS constants and the NTT.
"""

import numpy as np

from twenty_first_tpu.math import ntt
from twenty_first_tpu.math import gf_numpy as gfn
from twenty_first_tpu.math.b_field_element import P, R, R_INV
from twenty_first_tpu.tip5.constants import (
    LOOKUP_TABLE,
    MDS_MATRIX_FIRST_COLUMN,
    NUM_ROUNDS,
    NUM_SPLIT_AND_LOOKUP,
    ROUND_CONSTANTS,
    STATE_SIZE,
)
from twenty_first_tpu.tip5.tip5 import _round_values

RNG = np.random.default_rng(515)

_LUT = LOOKUP_TABLE.tolist()
_INV_LUT = [0] * 256
for _i, _v in enumerate(_LUT):
    _INV_LUT[_v] = _i
_COL = [int(c) for c in MDS_MATRIX_FIRST_COLUMN]
_RC = [int(c) for c in ROUND_CONSTANTS]
_SEVEN_INV = pow(7, -1, P - 1)  # x^7 is a bijection; its inverse exponent


def _mds_matrix() -> list[list[int]]:
    return [[_COL[(i - j) % STATE_SIZE] for j in range(STATE_SIZE)]
            for i in range(STATE_SIZE)]


def _mds_inverse_matrix() -> list[list[int]]:
    """Invert the 16x16 circulant mod p by Gauss-Jordan over F_p."""
    n = STATE_SIZE
    a = [row[:] + [1 if i == j else 0 for j in range(n)]
         for i, row in enumerate(_mds_matrix())]
    for col in range(n):
        piv = next(r for r in range(col, n) if a[r][col] % P)
        a[col], a[piv] = a[piv], a[col]
        inv = pow(a[col][col], P - 2, P)
        a[col] = [(v * inv) % P for v in a[col]]
        for r in range(n):
            if r != col and a[r][col]:
                f = a[r][col]
                a[r] = [(v - f * w) % P for v, w in zip(a[r], a[col])]
    return [row[n:] for row in a]


_MDS_INV = _mds_inverse_matrix()


def _inverse_round(state: list[int], r: int) -> list[int]:
    base = r * STATE_SIZE
    state = [(state[i] - _RC[base + i]) % P for i in range(STATE_SIZE)]
    state = [
        sum(_MDS_INV[i][j] * state[j] for j in range(STATE_SIZE)) % P
        for i in range(STATE_SIZE)
    ]
    out = list(state)
    for i in range(NUM_SPLIT_AND_LOOKUP):
        m = (state[i] * R) % P
        v = 0
        for byte in range(8):
            v |= _INV_LUT[(m >> (8 * byte)) & 0xFF] << (8 * byte)
        out[i] = (v * R_INV) % P
    for i in range(NUM_SPLIT_AND_LOOKUP, STATE_SIZE):
        out[i] = pow(state[i], _SEVEN_INV, P)
    return out


def test_lookup_table_is_a_permutation():
    assert sorted(_LUT) == list(range(256))


def test_inverse_round_roundtrips_each_round():
    state = [int(v) for v in RNG.integers(0, P, STATE_SIZE, dtype=np.uint64)]
    for r in range(NUM_ROUNDS):
        assert _inverse_round(_round_values(state, r), r) == state


def test_inverse_permutation_roundtrips():
    for _ in range(3):
        state = [int(v)
                 for v in RNG.integers(0, P, STATE_SIZE, dtype=np.uint64)]
        forward = state
        for r in range(NUM_ROUNDS):
            forward = _round_values(forward, r)
        back = forward
        for r in reversed(range(NUM_ROUNDS)):
            back = _inverse_round(back, r)
        assert back == state


def test_sbox_byte_lookup_inverts():
    # the split-and-lookup S-box is a bijection on raw Montgomery bytes
    m = int(RNG.integers(0, P, dtype=np.uint64))
    fwd = 0
    for byte in range(8):
        fwd |= _LUT[(m >> (8 * byte)) & 0xFF] << (8 * byte)
    back = 0
    for byte in range(8):
        back |= _INV_LUT[(fwd >> (8 * byte)) & 0xFF] << (8 * byte)
    assert back == m


def _mds_via_ntt(state: np.ndarray) -> np.ndarray:
    """Circulant matvec by the convolution theorem, via the library NTT."""
    col_hat = ntt.ntt_host(np.array(_COL, dtype=np.uint64))
    state_hat = ntt.ntt_host(state)
    return ntt.ntt_host(gfn.mul(col_hat, state_hat), inverse=True)


def test_mds_cyclomul_oracle_matches_matvec():
    state = RNG.integers(0, P, STATE_SIZE, dtype=np.uint64)
    want = np.array(
        [sum(_COL[(i - j) % STATE_SIZE] * int(state[j])
             for j in range(STATE_SIZE)) % P for i in range(STATE_SIZE)],
        dtype=np.uint64,
    )
    got = _mds_via_ntt(state)
    np.testing.assert_array_equal(got, want)


def test_full_round_with_ntt_mds_matches():
    state = [int(v) for v in RNG.integers(0, P, STATE_SIZE, dtype=np.uint64)]

    def round_with_ntt_mds(st, r):
        st = list(st)
        for i in range(NUM_SPLIT_AND_LOOKUP):
            m = (st[i] * R) % P
            out = 0
            for byte in range(8):
                out |= _LUT[(m >> (8 * byte)) & 0xFF] << (8 * byte)
            st[i] = (out * R_INV) % P
        for i in range(NUM_SPLIT_AND_LOOKUP, STATE_SIZE):
            st[i] = pow(st[i], 7, P)
        st = [int(v) for v in _mds_via_ntt(np.array(st, dtype=np.uint64))]
        base = r * STATE_SIZE
        return [(st[i] + _RC[base + i]) % P for i in range(STATE_SIZE)]

    for r in range(NUM_ROUNDS):
        assert round_with_ntt_mds(state, r) == _round_values(state, r)
        state = _round_values(state, r)
