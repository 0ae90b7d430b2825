"""CRT-tower cyclic-convolution MDS oracle (tip5/mod.rs:753-1027 analogue).

The reference keeps `mds_cyclomul` — a cyclic convolution computed by
recursively splitting x^n - 1 into (x^{n/2} - 1)(x^{n/2} + 1), i.e. a
cyclic and a negacyclic half, with Karatsuba/complex tricks at the base —
as a test-only second derivation of the MDS layer. This mirrors that
structure over F_p (the decomposition is the mathematics; the integer
substrate tricks are x86-specific and deliberately not reproduced):

    cyclic_n(a, b):   CRT on c+ = cyclic_{n/2},  c- = negacyclic_{n/2}
                      result[i]     = (c+[i] + c-[i]) / 2
                      result[i+n/2] = (c+[i] - c-[i]) / 2
    negacyclic via schoolbook with sign wrap at the (small) base.

Together with the NTT-based oracle (test_mds_ntt_oracle.py) and the exact
integer matvec, the MDS constants are now pinned by three independent
derivations.
"""

import numpy as np

from twenty_first_tpu.math.b_field_element import P
from twenty_first_tpu.tip5.constants import (
    MDS_MATRIX_FIRST_COLUMN,
    NUM_ROUNDS,
    STATE_SIZE,
)
from twenty_first_tpu.tip5.tip5 import _round_values, _sbox_values

RNG = np.random.default_rng(0xC1C)

_COL = [int(c) for c in MDS_MATRIX_FIRST_COLUMN]
_HALF = pow(2, P - 2, P)


def _negacyclic(a, b):
    """Schoolbook negacyclic convolution mod (x^n + 1): wrapped products
    re-enter with a sign flip."""
    n = len(a)
    out = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            if k < n:
                out[k] = (out[k] + a[i] * b[j]) % P
            else:
                out[k - n] = (out[k - n] - a[i] * b[j]) % P
    return out


def _cyclic(a, b):
    """Cyclic convolution mod (x^n - 1) by the CRT half-split tower."""
    n = len(a)
    if n <= 2:
        out = [0] * n
        for i in range(n):
            for j in range(n):
                out[(i + j) % n] = (out[(i + j) % n] + a[i] * b[j]) % P
        return out
    h = n // 2
    a_plus = [(a[i] + a[i + h]) % P for i in range(h)]   # a mod x^h - 1
    b_plus = [(b[i] + b[i + h]) % P for i in range(h)]
    a_minus = [(a[i] - a[i + h]) % P for i in range(h)]  # a mod x^h + 1
    b_minus = [(b[i] - b[i + h]) % P for i in range(h)]
    c_plus = _cyclic(a_plus, b_plus)
    c_minus = _negacyclic(a_minus, b_minus)
    out = [0] * n
    for i in range(h):
        out[i] = ((c_plus[i] + c_minus[i]) * _HALF) % P
        out[i + h] = ((c_plus[i] - c_minus[i]) * _HALF) % P
    return out


def _mds_via_cyclomul(state):
    # circ(col) @ state = cyclic_conv(col, state) with this circulant
    # orientation: out[i] = sum_j col[(i - j) % n] state[j]
    return _cyclic(_COL, [int(v) for v in state])


def _mds_matvec(state):
    return [
        sum(_COL[(i - j) % STATE_SIZE] * int(state[j])
            for j in range(STATE_SIZE)) % P
        for i in range(STATE_SIZE)
    ]


def test_crt_tower_bases():
    # the tower's own invariant at every level: cyclic_n == direct conv
    for n in (2, 4, 8, 16):
        a = [int(v) for v in RNG.integers(0, P, n, dtype=np.uint64)]
        b = [int(v) for v in RNG.integers(0, P, n, dtype=np.uint64)]
        direct = [0] * n
        for i in range(n):
            for j in range(n):
                direct[(i + j) % n] = (direct[(i + j) % n] + a[i] * b[j]) % P
        assert _cyclic(a, b) == direct


def test_mds_cyclomul_matches_matvec():
    for _ in range(8):
        state = RNG.integers(0, P, STATE_SIZE, dtype=np.uint64)
        assert _mds_via_cyclomul(state) == _mds_matvec(state)


def test_full_round_with_cyclomul_mds_matches():
    from twenty_first_tpu.tip5.constants import ROUND_CONSTANTS

    rc = [int(c) for c in ROUND_CONSTANTS]
    state = [int(v) for v in RNG.integers(0, P, STATE_SIZE, dtype=np.uint64)]
    for r in range(NUM_ROUNDS):
        st = _sbox_values(state)
        st = _mds_via_cyclomul(st)
        base = r * STATE_SIZE
        got = [(st[i] + rc[base + i]) % P for i in range(STATE_SIZE)]
        assert got == _round_values(state, r)
        state = got
