"""Lane-packed commit path (ops.tip5_packed): layout algebra + reduction
equivalence, validated on CPU through interpret=True, which routes every
kernel call to permute_packed_multi_oracle — the jnp replica sharing the
kernel's exact arithmetic (_dense_rounds) and pairing (_dense_pair_halves)
code. Hardware bit-exactness of the compiled Mosaic kernels is checked by
the opt-in HW test and by scripts/ab_packed_merkle.py's root assert before
every promotion measurement."""

import numpy as np

from twenty_first_tpu.math import gf
from twenty_first_tpu.math.b_field_element import P
from twenty_first_tpu.ops import tip5_packed, tip5_pallas
from twenty_first_tpu.parallel import dist_merkle
from twenty_first_tpu.tip5 import permutation as tip5_dev

RNG = np.random.default_rng(77)


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


def test_reduce_layers_packed_matches_xla():
    b = 1 << 10
    dig = RNG.integers(0, P, size=(b, 5), dtype=np.uint64)
    state = gf.to_limbs(dig)
    # tile=16: r1 = b/16 = 64 -> multi-level fused groups + XLA pairs +
    # tail together (MULTI_LEVELS=4 exercised: 64 -> 8 rows in one call)
    for layers in (1, 4, 10):
        got = tip5_packed.reduce_layers_packed(state, layers, tile=16,
                                               interpret=True)
        want = dist_merkle._reduce_layers(state, layers)
        np.testing.assert_array_equal(np.asarray(got[0]),
                                      np.asarray(want[0]))
        np.testing.assert_array_equal(np.asarray(got[1]),
                                      np.asarray(want[1]))


def test_commit_states_packed_matches_xla():
    b = 1 << 9
    states = RNG.integers(0, P, size=(b, 16), dtype=np.uint64)
    slo, shi = gf.to_limbs(states)
    got = tip5_packed.commit_states_packed(slo, shi, 9, tile=8,
                                           interpret=True)
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


def test_multi_level_oracle_matches_single_level():
    """permute_packed_multi_oracle at levels L == L explicit
    (single-level permute + pair_packed) steps — pins the evens-first
    reorder + in-kernel pairing construction against the composition it
    replaces, for every fusable depth."""
    rows, tile = 64, 32
    states = RNG.integers(0, P, size=(rows * 8, 16), dtype=np.uint64)
    ilo, ihi = tip5_packed.pack_states(*gf.to_limbs(states))
    for levels in (1, 2, 3, 4):
        got = tip5_pallas.permute_packed_multi_oracle(ilo, ihi, levels,
                                                      tile=tile)
        wlo, whi = ilo, ihi
        for step in range(levels):
            if step:
                wlo, whi = tip5_packed.pair_packed(wlo, whi)
            wlo, whi = tip5_pallas.permute_packed_multi_oracle(
                wlo, whi, 1, tile=min(tile, wlo.shape[0]))
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(wlo))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(whi))


def test_single_level_oracle_matches_xla_permutation():
    """The jnp replica's arithmetic (shared with the Mosaic kernel) is
    bit-exact with the production XLA permutation."""
    b = 1 << 8
    states = RNG.integers(0, P, size=(b, 16), dtype=np.uint64)
    lo, hi = gf.to_limbs(states)
    ilo, ihi = tip5_packed.pack_states(lo, hi)
    got = tip5_pallas.permute_packed_multi_oracle(ilo, ihi, 1, tile=16)
    out = tip5_packed.unpack_states(*got)
    want = tip5_dev.permutation_values(states)
    np.testing.assert_array_equal(gf.from_limbs(
        (np.asarray(out[0]), np.asarray(out[1]))), want)
