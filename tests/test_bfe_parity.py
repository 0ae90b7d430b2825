"""BFieldElement behavior parity with the reference's inline test module.

Each test mirrors a named test in
twenty-first/src/math/b_field_element.rs (cited per test); golden values
are spec, implementations here are independent.
"""

import random

import pytest

from twenty_first_tpu.errors import ParseBFieldElementError
from twenty_first_tpu.math.b_field_element import (
    BFieldElement, P, bfe, bfe_vec)


def test_parsing_interval_is_open_minus_p_to_p():
    # b_field_element.rs `parsing_interval_is_open_minus_p_to_p`
    assert BFieldElement.from_str(str(P - 1)).value() == P - 1
    assert BFieldElement.from_str(str(-(P - 1))).value() == 1
    for bad in (P, -P, P + 17, -(P + 17)):
        with pytest.raises(ParseBFieldElementError):
            BFieldElement.from_str(str(bad))
    with pytest.raises(ParseBFieldElementError):
        BFieldElement.from_str("not-a-number")


def test_parsing_canonical_negative_and_positive_strings():
    # `parsing_string_representing_canonical_{negative,positive}_integer...`
    assert BFieldElement.from_str("-1") == bfe(-1)
    assert BFieldElement.from_str("-1").value() == P - 1
    assert BFieldElement.from_str("42").value() == 42


def test_display_format_matches_reference():
    # Display (b_field_element.rs:429-441): <=256 plain, >=p-256 negative,
    # otherwise zero-padded to 20 digits.
    assert str(bfe(0)) == "0"
    assert str(bfe(256)) == "256"
    assert str(bfe(-1)) == "-1"
    assert str(bfe(-256)) == "-256"
    assert str(bfe(257)) == f"{257:>020}"
    assert str(bfe(2**40)) == f"{2 ** 40:>020}"


def test_display_and_from_str_are_reciprocal():
    # `display_and_from_str_are_reciprocal_{unit,prop}_test`
    rng = random.Random(0xB0B)
    samples = [0, 1, 256, 257, P - 257, P - 256, P - 1]
    samples += [rng.randrange(P) for _ in range(200)]
    for v in samples:
        e = bfe(v)
        assert BFieldElement.from_str(str(e)) == e


def test_increment_and_decrement_wrap_around():
    # `incrementing_max_value_wraps_around` / `decrementing_min_value...`
    assert bfe(BFieldElement.MAX).increment() == bfe(0)
    assert bfe(0).decrement() == bfe(BFieldElement.MAX)
    assert bfe(5).increment() == bfe(6)
    assert bfe(5).decrement() == bfe(4)


def test_byte_array_conversion_roundtrip():
    # `byte_array_conversion` + zero-at-high-indices for small elements
    e = bfe(0x1234)
    raw = e.to_bytes()
    assert len(raw) == 8
    assert raw[2:] == bytes(6)  # small value: high bytes zero
    assert BFieldElement.from_bytes(raw) == e
    rng = random.Random(7)
    for _ in range(50):
        e = bfe(rng.randrange(P))
        assert BFieldElement.from_bytes(e.to_bytes()) == e


def test_byte_array_outside_range_is_not_accepted():
    # `byte_array_outside_range_is_not_accepted`
    with pytest.raises(ParseBFieldElementError):
        BFieldElement.from_bytes((0xFFFF_FFFF_FFFF_FFFF).to_bytes(8, "little"))
    with pytest.raises(ParseBFieldElementError):
        BFieldElement.from_bytes(P.to_bytes(8, "little"))


def test_value_is_preserved():
    # `value_is_preserved`
    for v in (0, 1, 2**32, P - 1):
        assert BFieldElement(v).value() == v


def test_values_larger_than_modulus_are_handled_correctly():
    # `values_larger_than_modulus_are_handled_correctly`: new() reduces
    assert BFieldElement(P).value() == 0
    assert BFieldElement(P + 1).value() == 1
    assert BFieldElement(2 * P + 17).value() == 17


def test_conversion_from_negative_ints_wraps():
    # `conversion_from_i32_to_bfe_is_correct` / isize variant
    assert bfe(-1).value() == P - 1
    assert bfe(-(2**31)).value() == P - 2**31
    assert bfe(2**31 - 1).value() == 2**31 - 1


def test_naive_and_actual_conversion_from_u128_agree():
    # `naive_and_actual_conversion_from_u128_agree`
    rng = random.Random(11)
    for _ in range(100):
        v = rng.randrange(1 << 128)
        assert BFieldElement(v).value() == v % P


def test_naive_and_actual_conversion_from_i64_agree():
    # `naive_and_actual_conversion_from_i64_agree`
    rng = random.Random(13)
    for _ in range(100):
        v = rng.randrange(-(1 << 63), 1 << 63)
        assert bfe(v).value() == v % P


def test_conversion_works_for_types_min_and_max():
    # `bfield_conversion_works_for_types_min_and_max`
    for v in (0, 255, 2**16 - 1, 2**32 - 1, 2**64 - 1,
              -(2**31), 2**31 - 1, -(2**63), 2**63 - 1, 2**128 - 1):
        assert BFieldElement(v).value() == v % P


def test_mod_pow_powers_of_two_and_three():
    # `mod_pow_test_powers_of_{two,three}`
    two, three = bfe(2), bfe(3)
    for k in range(64):
        assert two.mod_pow(k).value() == pow(2, k, P)
    for k in range(40):
        assert three.mod_pow(k).value() == pow(3, k, P)


def test_mod_pow_zero_exponent_is_one():
    # part of `mod_pow_test`
    assert bfe(0).mod_pow(0) == bfe(1)
    assert bfe(12345).mod_pow(0) == bfe(1)


def test_multiplicative_inverse_of_zero_raises():
    # `multiplicative_inverse_of_zero` (reference panics)
    with pytest.raises(ZeroDivisionError):
        bfe(0).inverse()
    with pytest.raises(ZeroDivisionError):
        bfe(1) / bfe(0)


def test_inverse_or_zero_bfe():
    # `inverse_or_zero_bfe`
    assert bfe(0).inverse_or_zero() == bfe(0)
    rng = random.Random(3)
    for _ in range(20):
        e = bfe(rng.randrange(1, P))
        assert e * e.inverse_or_zero() == bfe(1)


def test_empty_batch_inversion():
    # `empty_batch_inversion`
    assert BFieldElement.batch_inversion([]) == []


def test_batch_inversion_matches_individual():
    # `batch_inversion`
    xs = bfe_vec(range(1, 100))
    inv = BFieldElement.batch_inversion(xs)
    for x, i in zip(xs, inv):
        assert x * i == bfe(1)


def test_batch_inversion_with_zero_raises():
    with pytest.raises(ZeroDivisionError):
        BFieldElement.batch_inversion([bfe(1), bfe(0), bfe(2)])


def test_add_sub_wrap_around():
    # `add_sub_wrap_around_test`
    assert bfe(P - 1) + bfe(2) == bfe(1)
    assert bfe(1) - bfe(2) == bfe(P - 1)
    assert bfe(P - 1) + bfe(1) == bfe(0)


def test_neg():
    # `neg_test`
    assert (-bfe(0)) == bfe(0)
    assert (-bfe(1)).value() == P - 1
    rng = random.Random(5)
    for _ in range(20):
        e = bfe(rng.randrange(P))
        assert e + (-e) == bfe(0)


def test_equality_and_hash():
    # `equality_and_hash_test`
    assert bfe(7) == bfe(7)
    assert bfe(7) != bfe(8)
    assert bfe(P + 7) == bfe(7)
    assert hash(bfe(P + 7)) == hash(bfe(7))
    assert len({bfe(1), bfe(P + 1), bfe(2)}) == 2


def test_random_squares():
    # `test_random_squares`: square() == self * self == value^2 mod p
    rng = random.Random(17)
    for _ in range(100):
        v = rng.randrange(P)
        e = bfe(v)
        assert e.square().value() == (v * v) % P
        assert e.square() == e * e


def test_random_raw_montgomery_views():
    # `test_random_raw`: raw_u64/raw_bytes/raw_u16s roundtrip
    rng = random.Random(19)
    for _ in range(100):
        e = bfe(rng.randrange(P))
        assert BFieldElement.from_raw_u64(e.raw_u64()) == e
        assert BFieldElement.from_raw_bytes(e.raw_bytes()) == e
        assert BFieldElement.from_raw_u16s(e.raw_u16s()) == e


def test_const_minus_two_inverse_is_really_minus_two_inverse():
    # `const_minus_two_inverse_is_really_minus_two_inverse`
    assert BFieldElement.minus_two_inverse() * bfe(-2) == bfe(1)
    assert BFieldElement.MINUS_TWO_INVERSE_VALUE == pow(P - 2, P - 2, P)


def test_supposed_generator_is_generator():
    # `supposed_generator_is_generator`: order of 7 is p-1
    g = BFieldElement.generator()
    order = P - 1
    assert g.mod_pow(order) == bfe(1)
    # order is exactly p-1: no proper prime-divisor quotient gives 1
    for q in (2, 3, 5, 7, 11, 13, 17, 31, 41, 61, 151, 331, 1321):
        if order % q == 0:
            assert g.mod_pow(order // q) != bfe(1)


def test_lift_then_unlift_preserves_element():
    # `lift_then_unlift_preserves_element`
    rng = random.Random(23)
    for _ in range(20):
        e = bfe(rng.randrange(P))
        assert e.lift().unlift() == e


def test_increment_is_prev_plus_one_everywhere():
    # `increment` / `decrement`
    rng = random.Random(29)
    for _ in range(50):
        e = bfe(rng.randrange(P))
        assert e.increment().decrement() == e


def test_mul_div_plus_minus_neg_property_based():
    # `mul_div_plus_minus_neg_property_based_test`
    rng = random.Random(31)
    for _ in range(100):
        a, b = bfe(rng.randrange(P)), bfe(rng.randrange(1, P))
        assert (a + b) - b == a
        assert (a - b) + b == a
        assert (a * b) / b == a
        assert a * b.inverse() == a / b
        assert a + (-a) == bfe(0)


def test_digest_from_str_accepts_negative_canonical_elements():
    # digest.rs FromStr routes through BFieldElement::from_str
    from twenty_first_tpu.tip5.digest import Digest

    d = Digest.from_str("-1,0,1,2,3")
    assert d.values()[0].value() == P - 1
    from twenty_first_tpu.errors import TryFromDigestError
    with pytest.raises(TryFromDigestError):
        Digest.from_str(f"{P},0,1,2,3")
    with pytest.raises(TryFromDigestError):
        Digest.from_str("1,2,3")


def test_digest_str_roundtrip():
    # digest Display/FromStr reciprocity
    from twenty_first_tpu.tip5.digest import Digest

    d = Digest([1, 2, 3, 4, P - 1])
    assert Digest.from_str(str(d)) == d
