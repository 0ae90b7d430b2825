"""Ragged (mixed-length) batched hashing vs the scalar sponge oracle."""

import numpy as np

from twenty_first_tpu.math.b_field_element import bfe, P
from twenty_first_tpu.tip5 import permutation as device
from twenty_first_tpu.tip5.tip5 import Tip5

RNG = np.random.default_rng(1234)


def _rand_input(length):
    return RNG.integers(0, P, size=length, dtype=np.uint64)


def test_ragged_matches_scalar_mixed_lengths():
    lengths = [0, 1, 9, 10, 11, 19, 20, 21, 37, 100, 101, 640]
    inputs = [_rand_input(n) for n in lengths]
    got = device.hash_varlen_ragged(inputs)
    for row, inp in zip(got, inputs):
        expect = Tip5.hash_varlen([bfe(int(v)) for v in inp])
        assert [int(v) for v in row] == [v.value() for v in expect.values()]


def test_ragged_bucket_reuse_and_order():
    # two calls with different groupings hit the same cached graphs and
    # results come back in input order
    inputs1 = [_rand_input(n) for n in (5, 50, 5, 50)]
    inputs2 = [_rand_input(n) for n in (50, 5)]
    got1 = device.hash_varlen_ragged(inputs1)
    got2 = device.hash_varlen_ragged(inputs2)
    for got, inputs in ((got1, inputs1), (got2, inputs2)):
        for row, inp in zip(got, inputs):
            expect = Tip5.hash_varlen([bfe(int(v)) for v in inp])
            assert [int(v) for v in row] == \
                [v.value() for v in expect.values()]


def test_empty_batch():
    assert device.hash_varlen_ragged([]).shape == (0, 5)


def test_tip5_hash_varlen_batch():
    inputs = [[bfe(i) for i in range(n)] for n in (0, 3, 12, 25)]
    got = Tip5.hash_varlen_batch(inputs)
    expect = [Tip5.hash_varlen(inp) for inp in inputs]
    assert got == expect


def test_tip5_hash_batch_via_codec():
    from twenty_first_tpu.math.x_field_element import xfe

    values = [bfe(5), xfe((1, 2, 3)), [bfe(1), bfe(2)]]
    got = Tip5.hash_batch(values)
    expect = [Tip5.hash(v) for v in values]
    assert got == expect
