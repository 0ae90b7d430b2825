"""NTT-based MDS oracle (tip5/mod.rs:753-1027 analogue).

The reference keeps a test-only alternate MDS implementation
(`mds_cyclomul`, a Karatsuba/complex negacyclic tower) and proptests it
against `mds_generated`. Here the same equivalence-oracle role is played
by the library's own length-16 NTT: the circulant matvec must equal
intt(ntt(col) * ntt(state)) by the convolution theorem — an independent
cross-derivation of both the MDS constants and the NTT kernel.
"""

import numpy as np

from twenty_first_tpu.math import gf_numpy as gfn
from twenty_first_tpu.math import ntt
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
_COL = [int(c) for c in MDS_MATRIX_FIRST_COLUMN]
_RC = [int(c) for c in ROUND_CONSTANTS]


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
