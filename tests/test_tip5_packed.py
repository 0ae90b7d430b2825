"""Lane-packed commit path (ops.tip5_packed): layout algebra + reduction
equivalence, validated on CPU by substituting the Pallas dense kernel with
its layout-level oracle (unpack -> XLA permutation -> pack). The kernel
itself is substate-agnostic (ops.tip5_pallas.permute_packed docstring) and
is bit-exactness-checked on real TPU hardware by the opt-in HW test and by
scripts/ab_packed_merkle.py before every promotion measurement."""

import numpy as np
import pytest

from twenty_first_tpu.math import gf
from twenty_first_tpu.math.b_field_element import P
from twenty_first_tpu.ops import tip5_packed
from twenty_first_tpu.parallel import dist_merkle
from twenty_first_tpu.tip5 import permutation as tip5_dev

RNG = np.random.default_rng(77)


def _oracle_permute_packed(ilo, ihi, tile=512, interpret=False):
    lo, hi = tip5_packed.unpack_states(ilo, ihi)
    out = tip5_dev.permutation((lo, hi))
    return tip5_packed.pack_states(out[0], out[1])


@pytest.fixture
def oracle_kernel(monkeypatch):
    monkeypatch.setattr(tip5_packed.tip5_pallas, "permute_packed",
                        _oracle_permute_packed)


def test_pack_unpack_round_trip_and_semantics():
    b = 1 << 7
    states = RNG.integers(0, P, size=(b, 16), dtype=np.uint64)
    lo, hi = gf.to_limbs(states)
    ilo, ihi = tip5_packed.pack_states(lo, hi)
    r = b // 8
    assert ilo.shape == (r, 128)
    # strided semantics: packed[row, word*8 + q] == state[q*r + row][word]
    got = np.asarray(ilo)
    for c in (0, 1, r - 1, r, 2 * r + 3, b - 1):
        row, q = c % r, c // r
        for w in (0, 5, 15):
            assert got[row, w * 8 + q] == np.asarray(lo)[c, w]
    back = tip5_packed.unpack_states(ilo, ihi)
    np.testing.assert_array_equal(np.asarray(back[0]), np.asarray(lo))
    np.testing.assert_array_equal(np.asarray(back[1]), np.asarray(hi))
    # digest unpack agrees with full unpack's first 5 words
    dig = tip5_packed.unpack_digests(ilo, ihi)
    np.testing.assert_array_equal(np.asarray(dig[0]), np.asarray(lo)[:, :5])


def test_pair_packed_matches_natural_pairing():
    """pair_packed on packed digests == pack(_pair_states_natural(digests))."""
    b = 1 << 7
    dig = RNG.integers(0, P, size=(b, 5), dtype=np.uint64)
    lo, hi = gf.to_limbs(dig)
    # packed digest planes: embed (b,5) digests as the first 5 words of
    # packed states (what a packed permutation leaves behind, with junk in
    # the tail lanes — use random junk to prove it is ignored)
    full_lo = np.concatenate(
        [np.asarray(lo), RNG.integers(0, 2**32, size=(b, 11), dtype=np.uint64)
         .astype(np.uint32)], axis=1)
    full_hi = np.concatenate(
        [np.asarray(hi), RNG.integers(0, 2**31, size=(b, 11), dtype=np.uint64)
         .astype(np.uint32)], axis=1)
    ilo, ihi = tip5_packed.pack_states(full_lo, full_hi)
    plo, phi = tip5_packed.pair_packed(ilo, ihi)
    want = tip5_packed.pack_states(
        *tip5_packed._pair_states_natural(lo, hi))
    np.testing.assert_array_equal(np.asarray(plo), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(phi), np.asarray(want[1]))


def test_reduce_layers_packed_matches_xla(oracle_kernel):
    b = 1 << 10
    dig = RNG.integers(0, P, size=(b, 5), dtype=np.uint64)
    state = gf.to_limbs(dig)
    # tile=16: r1 = b/16 = 64 -> 3 packed layers (64, 32 rows) before the
    # XLA tail; exercises entry, chain, unpack, and tail together
    for layers in (1, 4, 10):
        got = tip5_packed.reduce_layers_packed(state, layers, tile=16)
        want = dist_merkle._reduce_layers(state, layers)
        np.testing.assert_array_equal(np.asarray(got[0]),
                                      np.asarray(want[0]))
        np.testing.assert_array_equal(np.asarray(got[1]),
                                      np.asarray(want[1]))


def test_commit_states_packed_matches_xla(oracle_kernel):
    b = 1 << 9
    states = RNG.integers(0, P, size=(b, 16), dtype=np.uint64)
    slo, shi = gf.to_limbs(states)
    got = tip5_packed.commit_states_packed(slo, shi, 9, tile=8)
    out = tip5_dev.permutation((slo, shi))
    want = dist_merkle._reduce_layers((out[0][:, :5], out[1][:, :5]), 9)
    assert np.asarray(got[0]).shape == (1, 5)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_packed_eligibility_gate():
    assert tip5_packed.packed_eligible(8 * tip5_packed.TILE)
    assert not tip5_packed.packed_eligible(8 * tip5_packed.TILE - 8)
    assert not tip5_packed.packed_eligible(4 * tip5_packed.TILE)
    assert not tip5_packed.packed_eligible(12)
    # ineligible sizes must take the pure-XLA path unchanged
    b = 64
    dig = RNG.integers(0, P, size=(b, 5), dtype=np.uint64)
    state = gf.to_limbs(dig)
    got = tip5_packed.reduce_layers_packed(state, 6)
    want = dist_merkle._reduce_layers(state, 6)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
