"""XFieldElement behavior parity with the reference's inline test module
(twenty-first/src/math/x_field_element.rs, cited per test)."""

import random

import pytest

from twenty_first_tpu.errors import TryFromXFieldElementError
from twenty_first_tpu.math.b_field_element import BFieldElement, P, bfe
from twenty_first_tpu.math.x_field_element import (
    EXTENSION_DEGREE, XFieldElement, as_flat_list, xfe, xfe_vec)


def rand_xfe(rng):
    return xfe((rng.randrange(P), rng.randrange(P), rng.randrange(P)))


def test_display_is_as_expected():
    # `display_is_as_expected` (x_field_element.rs:709-712)
    assert str(xfe(42)) == "42_xfe"
    assert str(xfe((1, 2, 3))) == "(3·x² + 2·x + 1)"


def test_one_zero():
    # `one_zero_test`
    one = XFieldElement.one()
    assert one.is_one()
    assert one.coefficients[0].is_one()
    assert one.coefficients[1].is_zero()
    assert one.coefficients[2].is_zero()
    zero = XFieldElement.zero()
    assert zero.is_zero()
    assert all(c.is_zero() for c in zero.coefficients)
    assert not zero.is_one()
    assert not one.is_zero()


def test_unlifting_random_xfe_doesnt_work():
    # `unlifting_random_xfe_doesnt_work`: anything with x/x^2 parts
    rng = random.Random(1)
    for _ in range(50):
        e = xfe((rng.randrange(P), rng.randrange(1, P), rng.randrange(P)))
        assert e.unlift() is None


def test_summing_gives_expected_result():
    # `summing_gives_expected_result`
    total = XFieldElement.zero()
    for e in (xfe((1, 0, 0)), xfe((0, 2, 0)), xfe((0, 0, 3)),
              xfe((40, 50, 60))):
        total = total + e
    assert total == xfe((41, 52, 63))


def test_bfe_vector_length_rules():
    # `bfe_vector_of_{correct,incorrect}_length_{can,cannot}_become_xfe`
    assert XFieldElement([bfe(1), bfe(2), bfe(3)]) == xfe((1, 2, 3))
    for bad_len in (0, 1, 2, 4, 5):
        with pytest.raises(ValueError):
            XFieldElement([bfe(9)] * bad_len)


def test_incr_decr():
    # `incr_decr_test`
    val = XFieldElement.zero()
    val.increment(0)
    assert val.is_one()
    val.increment(0)
    assert val == xfe((2, 0, 0))
    val.decrement(0)
    assert val.is_one()
    val.decrement(0)
    assert val.is_zero()
    # wrap-around on every coefficient index
    for idx in range(3):
        val = XFieldElement.zero()
        val.decrement(idx)
        assert val.coefficients[idx].value() == BFieldElement.MAX
        val.increment(idx)
        assert val.is_zero()


def test_x_field_add_sub_mul():
    # `x_field_{add,sub,mul}_test`: spot values + x^2*x^2 = x*x^2 reduction
    a, b = xfe((1, 2, 3)), xfe((4, 5, 6))
    assert a + b == xfe((5, 7, 9))
    assert b - a == xfe((3, 3, 3))
    # x * x^2 = x^3 = x - 1 mod (x^3 - x + 1)
    x, x2 = xfe((0, 1, 0)), xfe((0, 0, 1))
    assert x * x2 == xfe((-1, 1, 0))
    # x^2 * x^2 = x^4 = x^2 - x
    assert x2 * x2 == xfe((0, -1, 1))


def test_x_field_overloaded_arithmetic():
    # `x_field_overloaded_arithmetic_test`: mixed bfe<->xfe ops both ways
    e, s = xfe((1, 2, 3)), bfe(5)
    assert e + s == xfe((6, 2, 3))
    assert s + e == xfe((6, 2, 3))
    assert e - s == xfe((-4, 2, 3))
    assert e * s == xfe((5, 10, 15))
    assert s * e == xfe((5, 10, 15))


def test_x_field_into_from_polynomial():
    # `x_field_into_test`: Polynomial -> xfe reduces mod shah
    from twenty_first_tpu.math.polynomial import Polynomial

    assert XFieldElement.from_polynomial(Polynomial([])).is_zero()
    shah = XFieldElement.shah_polynomial()
    assert XFieldElement.from_polynomial(shah).is_zero()
    assert XFieldElement.from_polynomial(shah.scalar_mul(bfe(-1))).is_zero()
    # x^3 reduces to x - 1
    x3 = Polynomial([bfe(0), bfe(0), bfe(0), bfe(1)])
    assert XFieldElement.from_polynomial(x3) == xfe((-1, 1, 0))


def test_x_field_xgcd_properties():
    # `x_field_xgcp_test`: gcd(a, shah) is a unit for all nonzero a; the
    # Bezout identity a*u + m*v = g holds (inverse correctness implies it)
    rng = random.Random(2)
    for _ in range(20):
        e = rand_xfe(rng)
        if e.is_zero():
            continue
        assert e * e.inverse() == XFieldElement.one()


def test_x_field_inv_fixed_and_random():
    # `x_field_inv_test` / `field_element_inversion`
    two = xfe(2)
    assert two * two.inverse() == XFieldElement.one()
    x = xfe((0, 1, 0))
    assert x * x.inverse() == XFieldElement.one()
    rng = random.Random(3)
    for _ in range(50):
        e = rand_xfe(rng)
        if e.is_zero():
            continue
        assert e * e.inverse() == XFieldElement.one()
        assert e.inverse() * e == XFieldElement.one()


def test_field_element_batch_inversion():
    # `field_element_batch_inversion`
    rng = random.Random(4)
    xs = [rand_xfe(rng) for _ in range(37)]
    xs = [e if not e.is_zero() else XFieldElement.one() for e in xs]
    inv = XFieldElement.batch_inversion(xs)
    for e, i in zip(xs, inv):
        assert e * i == XFieldElement.one()
    assert XFieldElement.batch_inversion([]) == []


def test_mul_xfe_with_bfe_pbt():
    # `mul_xfe_with_bfe_pbt`: scales every coefficient
    rng = random.Random(5)
    for _ in range(50):
        e, s = rand_xfe(rng), bfe(rng.randrange(P))
        prod = e * s
        for c_out, c_in in zip(prod.coefficients, e.coefficients):
            assert c_out == c_in * s


def test_x_field_division_mul_pbt():
    # `x_field_division_mul_pbt`
    rng = random.Random(6)
    for _ in range(50):
        a, b = rand_xfe(rng), rand_xfe(rng)
        if b.is_zero():
            continue
        assert (a * b) / b == a
        assert (a / b) * b == a


def test_xfe_mod_pow():
    # `xfe_mod_pow_zero` / `xfe_mod_pow` / `xfe_mod_pow_static`
    rng = random.Random(7)
    assert XFieldElement.zero().mod_pow(0) == XFieldElement.one()
    for _ in range(10):
        e = rand_xfe(rng)
        assert e.mod_pow(0) == XFieldElement.one()
        assert e.mod_pow(1) == e
        acc = XFieldElement.one()
        for k in range(8):
            assert e.mod_pow(k) == acc
            acc = acc * e
    # static vector: x^3 == x - 1
    x = xfe((0, 1, 0))
    assert x.mod_pow(3) == xfe((-1, 1, 0))


def test_inverse_or_zero():
    # `inverse_or_zero_of_zero_is_zero` / `..._of_non_zero_is_inverse`
    assert XFieldElement.zero().inverse_or_zero() == XFieldElement.zero()
    rng = random.Random(8)
    for _ in range(20):
        e = rand_xfe(rng)
        if e.is_zero():
            continue
        assert e * e.inverse_or_zero() == XFieldElement.one()


def test_multiplicative_inverse_of_zero_raises():
    # `multiplicative_inverse_of_zero`
    with pytest.raises(ZeroDivisionError):
        XFieldElement.zero().inverse()


def test_xfe_to_digest_to_xfe_is_invariant():
    # `xfe_to_digest_to_xfe_is_invariant`
    rng = random.Random(9)
    for _ in range(20):
        e = rand_xfe(rng)
        assert XFieldElement.try_from_digest(e.to_digest()) == e


def test_converting_random_digest_to_xfield_element_fails():
    # `converting_random_digest_to_xfield_element_fails`
    from twenty_first_tpu.tip5.digest import Digest

    rng = random.Random(10)
    d = Digest([rng.randrange(P) for _ in range(5)])
    with pytest.raises(TryFromXFieldElementError):
        XFieldElement.try_from_digest(d)


def test_xfe_macro_behaviors():
    # `xfe_macro_*`: the xfe() helper accepts ints, negatives, triples
    assert xfe(42) == XFieldElement.new_const(bfe(42))
    assert xfe(-1).coefficients[0].value() == P - 1
    assert xfe((1, 2, 3)) == XFieldElement([bfe(1), bfe(2), bfe(3)])
    assert xfe_vec([(1, 0, 0), (2, 0, 0)]) == [xfe(1), xfe(2)]


def test_as_flat_slice_produces_expected_slices():
    # `as_flat_slice_produces_expected_slices`
    xs = [xfe((1, 2, 3)), xfe((4, 5, 6))]
    flat = as_flat_list(xs)
    assert flat == [bfe(1), bfe(2), bfe(3), bfe(4), bfe(5), bfe(6)]


def test_x_field_random_element_generation():
    # `x_field_random_element_generation_test`: construction from any u64s
    rng = random.Random(11)
    for _ in range(20):
        c = [rng.randrange(1 << 64) for _ in range(3)]
        e = xfe(tuple(c))
        for got, want in zip(e.coefficients, c):
            assert got.value() == want % P


def test_xfe_ntt_roundtrip_and_evaluation():
    # `xfe_intt_is_inverse_of_xfe_ntt` / `xfe_ntt_corresponds_to_polynomial
    # _evaluation` — scalar-object route through the array NTT
    import numpy as np

    from twenty_first_tpu.math import ntt as ntt_mod
    from twenty_first_tpu.math.polynomial import Polynomial

    rng = random.Random(12)
    n = 8
    coeffs = [rand_xfe(rng) for _ in range(n)]
    arr = np.array([[c.value() for c in e.coefficients] for e in coeffs],
                   dtype=np.uint64)
    transformed = ntt_mod.ntt_values(arr.T).T
    back = ntt_mod.ntt_values(transformed.T, inverse=True).T
    assert np.array_equal(back, arr)
    # NTT = evaluation at successive powers of omega (lifted root)
    omega = BFieldElement.primitive_root_of_unity(n)
    poly = Polynomial(coeffs)
    for k in range(n):
        want = poly.evaluate(omega.mod_pow(k).lift())
        got = XFieldElement([int(v) for v in transformed[k]])
        assert got == want
