"""Polynomial behavior parity fill-ins vs the reference inline tests
(twenty-first/src/math/polynomial.rs, cited per test). The algorithm
equivalence oracles live in test_polynomial.py / test_modular_interpolate.py;
this file covers the remaining named reference behaviors."""

import random

import pytest

from twenty_first_tpu.math.b_field_element import BFieldElement, P, bfe
from twenty_first_tpu.math.polynomial import Polynomial, PolynomialError
from twenty_first_tpu.math.x_field_element import XFieldElement, xfe


def rand_poly(rng, n, x=False):
    if x:
        return Polynomial([xfe((rng.randrange(P), rng.randrange(P),
                                rng.randrange(P))) for _ in range(n)])
    return Polynomial([bfe(rng.randrange(P)) for _ in range(n)])


def test_polynomial_display():
    # polynomial.rs:2779-2810 `polynomial_display_test`
    def poly(cs):
        return Polynomial([bfe(c) for c in cs])

    assert str(poly([])) == "0"
    assert str(poly([0])) == "0"
    assert str(poly([0, 0])) == "0"
    assert str(poly([1])) == "1"
    assert str(poly([2, 0])) == "2"
    assert str(poly([0, 1])) == "x"
    assert str(poly([0, 5])) == "5x"
    assert str(poly([0, 0, 1])) == "x^2"
    assert str(poly([17, 0, 1])) == "x^2 + 17"
    assert str(poly([17, 5, 1])) == "x^2 + 5x + 17"


def test_leading_coefficient():
    # `leading_coefficient_of_{zero,non_zero}_polynomial_is_{none,some}`
    assert Polynomial([]).leading_coefficient() is None
    assert Polynomial([bfe(0), bfe(0)]).leading_coefficient() is None
    assert Polynomial([bfe(3), bfe(7)]).leading_coefficient() == bfe(7)
    assert Polynomial([bfe(3), bfe(7), bfe(0)]).leading_coefficient() == bfe(7)


def test_coefficients_accessor_is_normalized():
    # `accessing_coefficients_of_empty_polynomial_gives_empty_slice`,
    # `...of_polynomial_with_only_zero_coefficients...`,
    # `accessing_the_coefficients_is_equivalent_to_normalizing_then_raw...`
    assert Polynomial([]).coefficients == []
    assert Polynomial([bfe(0)] * 4).coefficients == []
    p = Polynomial([bfe(1), bfe(2), bfe(0), bfe(0)])
    assert p.coefficients == [bfe(1), bfe(2)]
    assert p.coefficients == p.normalize().coefficients


def test_x_to_the():
    # `x_to_the_0_is_constant_1`, `x_to_the_1_is_x`,
    # `x_to_the_n_to_the_m_is_homomorphic`
    assert Polynomial.x_to_the(0) == Polynomial.one()
    assert Polynomial.x_to_the(1).is_x()
    rng = random.Random(1)
    for _ in range(10):
        n, m = rng.randrange(8), rng.randrange(8)
        assert Polynomial.x_to_the(n).pow(m) == Polynomial.x_to_the(n * m)


def test_evaluating_scaled_polynomial_matches_offset_evaluation():
    # `evaluating_scaled_polynomial_is_equivalent_to_evaluating_original_
    # in_offset_point` + xfe-offset variant (`scaling_a_polynomial_works_
    # with_different_fields_as_the_offset`)
    rng = random.Random(2)
    f = rand_poly(rng, 9)
    alpha, point = bfe(rng.randrange(P)), bfe(rng.randrange(P))
    assert f.scale(alpha).evaluate(point) == f.evaluate(alpha * point)
    # extension-field offset on a base-field polynomial
    ax = xfe((3, 5, 7))
    px = xfe((2, 4, 8))
    assert f.scale(ax).evaluate(px) == f.evaluate(ax * px)


def test_colinearity_edge_cases():
    # `colinearity_check_needs_at_least_three_points`,
    # `colinearity_check_with_repeated_points_fails`,
    # `three_non_colinear_points_are_not_colinear`
    assert not Polynomial.are_colinear([])
    assert not Polynomial.are_colinear([(bfe(1), bfe(1)), (bfe(2), bfe(2))])
    assert not Polynomial.are_colinear(
        [(bfe(1), bfe(1)), (bfe(2), bfe(9)), (bfe(3), bfe(3))])
    assert not Polynomial.are_colinear(
        [(bfe(1), bfe(1)), (bfe(1), bfe(1)), (bfe(3), bfe(3))])


def test_colinear_points_are_colinear():
    # `colinear_points_are_colinear` on a random line
    rng = random.Random(3)
    a, b = bfe(rng.randrange(P)), bfe(rng.randrange(P))
    pts = [(x, a * x + b) for x in (bfe(2), bfe(7), bfe(11), bfe(17))]
    assert Polynomial.are_colinear(pts)


def test_point_on_line_matches_colinear_y():
    # `point_on_line_and_colinear_point_are_identical` (+ xfe variant)
    p0, p1 = (bfe(2), bfe(7)), (bfe(5), bfe(19))
    x = bfe(11)
    y = Polynomial.get_colinear_y(p0, p1, x)
    assert Polynomial.are_colinear_3(p0, p1, (x, y))
    q0 = (xfe((1, 2, 3)), xfe((4, 5, 6)))
    q1 = (xfe((7, 8, 9)), xfe((10, 11, 12)))
    qx = xfe((13, 14, 15))
    qy = Polynomial.get_colinear_y(q0, q1, qx)
    assert Polynomial.are_colinear_3(q0, q1, (qx, qy))


def test_get_colinear_y_rejects_vertical_line():
    # `getting_point_on_invalid_line_fails`: equal x coordinates
    with pytest.raises((PolynomialError, ZeroDivisionError)):
        Polynomial.get_colinear_y((bfe(1), bfe(1)), (bfe(1), bfe(2)), bfe(5))


def test_division_by_self_is_one_and_common_factors():
    # `polynomial_division_by_self_is_one`,
    # `polynomial_division_removes_common_factors`
    rng = random.Random(4)
    f = rand_poly(rng, 7)
    assert f / f == Polynomial.one()
    g = rand_poly(rng, 5)
    assert (f * g) / g == f


def test_leading_zeros_dont_affect_polynomial_division():
    # `leading_zeros_dont_affect_polynomial_division`
    rng = random.Random(5)
    f, g = rand_poly(rng, 9), rand_poly(rng, 4)
    fz = Polynomial(f.coefficients + [bfe(0)] * 3)
    gz = Polynomial(g.coefficients + [bfe(0)] * 2)
    assert f / g == fz / gz
    assert f % g == fz % gz


def test_truncate_properties():
    # `leading_coefficient_of_truncated_polynomial...`,
    # `truncated_polynomial_is_of_degree_min...`,
    # `truncating_zero_polynomial_gives_zero_polynomial`
    rng = random.Random(6)
    f = rand_poly(rng, 12)
    for k in (0, 3, 11, 20):
        t = f.truncate(k)
        assert t.degree() == min(k, f.degree())
        # truncation keeps the TOP coefficients (polynomial.rs:1928-1940)
        assert t.leading_coefficient() == f.leading_coefficient()
    assert Polynomial.zero().truncate(5).is_zero()
    # doc example: truncate(2) of 4x^4+3x^3+2x^2+x is 4x^2+3x+2
    doc = Polynomial([bfe(c) for c in (0, 1, 2, 3, 4)])
    assert doc.truncate(2) == Polynomial([bfe(2), bfe(3), bfe(4)])


def test_mod_x_to_the_n_properties():
    # `zero_polynomial_mod_any_power_of_x_is_zero_polynomial`,
    # `polynomial_mod_some_power_of_x_results_in_polynomial_of_degree_one
    # _less_than_power`, `...shares_low_degree_terms...`
    rng = random.Random(7)
    assert Polynomial.zero().mod_x_to_the_n(4).is_zero()
    f = rand_poly(rng, 10)
    for n in (1, 3, 7):
        m = f.mod_x_to_the_n(n)
        assert m.degree() < n
        assert m.coefficients == [
            c for i, c in enumerate(f.coefficients[:n])
            if i <= m.degree()]


def test_dividing_constant_polynomials():
    # `dividing_constant_polynomials_is_equivalent_to_dividing_constants`,
    # `dividing_any_polynomial_by_a_constant_polynomial_results_in_
    # remainder_zero`
    a, b = bfe(91), bfe(7)
    q = Polynomial([a]) / Polynomial([b])
    assert q == Polynomial([a / b])
    rng = random.Random(8)
    f = rand_poly(rng, 9)
    assert (f % Polynomial([b])).is_zero()
    assert (f / Polynomial([b])) * Polynomial([b]) == f


def test_polynomial_division_by_and_with_shah_polynomial():
    # `polynomial_division_by_and_with_shah_polynomial`
    shah = XFieldElement.shah_polynomial()
    x_to_3 = Polynomial.x_to_the(3)
    rem = x_to_3 % shah
    assert rem == Polynomial([bfe(-1), bfe(1)])
    quot = shah / Polynomial.x_to_the(1)
    assert quot == Polynomial([bfe(-1), bfe(0), bfe(1)])


def test_xgcd_does_not_panic_on_input_zero():
    # `xgcd_does_not_panic_on_input_zero`
    z = Polynomial.zero()
    f = Polynomial([bfe(3), bfe(1)])
    for a, b in ((z, f), (f, z), (z, z)):
        g, u, v = Polynomial.xgcd(a, b)
        assert u * a + v * b == g


def test_xgcd_bezout_identity_bfe_and_xfe():
    # `xgcd_b_field_pol_test` / `xgcd_x_field_pol_test`
    rng = random.Random(9)
    a, b = rand_poly(rng, 6), rand_poly(rng, 4)
    g, u, v = Polynomial.xgcd(a, b)
    assert u * a + v * b == g
    assert g.leading_coefficient() == bfe(1)  # monic-normalized
    ax, bx = rand_poly(rng, 5, x=True), rand_poly(rng, 3, x=True)
    g, u, v = Polynomial.xgcd(ax, bx)
    assert u * ax + v * bx == g


def test_hardcoded_polynomial_squaring():
    # `hardcoded_polynomial_squaring` (x+1)^2 = x^2+2x+1
    f = Polynomial([bfe(1), bfe(1)])
    assert f.square() == Polynomial([bfe(1), bfe(2), bfe(1)])
    assert Polynomial.zero().square().is_zero()


def test_squaring_matches_self_multiplication():
    # `polynomial_squaring_is_equivalent_to_multiplication_with_self`,
    # `slow_and_normal_squaring_are_equivalent`,
    # `normal_and_fast_squaring_are_equivalent`
    rng = random.Random(10)
    for n in (1, 3, 9, 70):
        f = rand_poly(rng, n)
        assert f.square() == f * f
        assert f.fast_square() == f * f


def test_is_zero_is_one_families():
    # polynomial.rs is_zero/is_one test family (:107-114 in the test list)
    assert Polynomial.zero().is_zero()
    assert Polynomial([bfe(0)] * 3).is_zero()
    assert not Polynomial([bfe(1)]).is_zero()
    assert Polynomial.one().is_one()
    assert Polynomial([bfe(1), bfe(0), bfe(0)]).is_one()
    assert not Polynomial([bfe(2)]).is_one()
    assert not Polynomial([bfe(1), bfe(1)]).is_one()
    assert Polynomial([]) == Polynomial([bfe(0)])
    assert Polynomial([bfe(1)]) == Polynomial([bfe(1), bfe(0)])


def test_formal_derivative_basics_and_leibniz():
    # `formal_derivative_of_zero_is_zero`, `..._of_constant_...is_zero`,
    # `..._is_of_degree_one_less...`, `..._adheres_to_the_leibniz_rule`
    assert Polynomial.zero().formal_derivative().is_zero()
    assert Polynomial([bfe(42)]).formal_derivative().is_zero()
    rng = random.Random(11)
    f, g = rand_poly(rng, 8), rand_poly(rng, 5)
    assert f.formal_derivative().degree() == f.degree() - 1
    lhs = (f * g).formal_derivative()
    rhs = f.formal_derivative() * g + f * g.formal_derivative()
    assert lhs == rhs


def test_reverse_involution():
    # `reverse_polynomial_with_nonzero_constant_term_twice_gives_original`,
    # `reverse_polynomial_with_zero_constant_term_twice_gives_shift_back`
    rng = random.Random(12)
    f = Polynomial([bfe(rng.randrange(1, P))] +
                   [bfe(rng.randrange(P)) for _ in range(6)])
    assert f.reverse().reverse() == f
    shifted = Polynomial([bfe(0), bfe(0)] + f.coefficients)
    assert shifted.reverse().reverse() == f  # shift is lost, not the body


def test_interpolating_through_one_point_gives_constant_polynomial():
    # `interpolating_through_one_point_gives_constant_polynomial`,
    # `fast_interpolation_through_a_single_point_succeeds`
    p = Polynomial.interpolate([bfe(5)], [bfe(42)])
    assert p == Polynomial([bfe(42)])
    p = Polynomial.lagrange_interpolate([bfe(5)], [bfe(42)])
    assert p == Polynomial([bfe(42)])


def test_zerofier_is_zero_only_on_domain_and_monic():
    # `zerofier_is_zero_only_on_domain`, `zerofier_has_leading_coefficient
    # _one`
    rng = random.Random(13)
    domain = [bfe(rng.randrange(P)) for _ in range(9)]
    domain = list({d.value(): d for d in domain}.values())
    z = Polynomial.zerofier(domain)
    assert z.leading_coefficient() == bfe(1)
    for d in domain:
        assert z.evaluate(d) == bfe(0)
    for _ in range(10):
        off = bfe(rng.randrange(P))
        if any(off == d for d in domain):
            continue
        assert z.evaluate(off) != bfe(0)


def test_unequal_hash_implies_unequal_polynomials():
    # `unequal_hash_implies_unequal_polynomials` (hash normalizes)
    f = Polynomial([bfe(1), bfe(2)])
    g = Polynomial([bfe(1), bfe(2), bfe(0)])
    assert hash(f) == hash(g) and f == g
    h = Polynomial([bfe(1), bfe(3)])
    if hash(f) != hash(h):
        assert f != h


def test_scalar_multiplication_methods_agree():
    # `polynomial_multiplication_with_scalar_is_equivalent_for_the_two_
    # methods` + various types
    rng = random.Random(14)
    f = rand_poly(rng, 7)
    s = bfe(rng.randrange(P))
    a = f.scalar_mul(s)
    b = f * Polynomial([s])
    assert a == b
    fx = rand_poly(rng, 7, x=True)
    sx = xfe((1, 2, 3))
    assert fx.scalar_mul(sx) == fx * Polynomial([sx])


def test_rows_ps_inverse_property():
    # batched Newton inverse: rows * inv == 1 mod x^prec, random shapes
    import numpy as np

    from twenty_first_tpu.math.polynomial import Polynomial

    rng = random.Random(21)
    nprng = np.random.default_rng(21)
    for _ in range(6):
        m = rng.randrange(1, 5)
        L = rng.randrange(2, 40)
        prec = rng.randrange(1, 50)
        rows = nprng.integers(0, P, (m, L), dtype=np.uint64)
        rows[:, 0] = nprng.integers(1, P, m, dtype=np.uint64)
        inv = Polynomial._rows_ps_inverse(rows, prec)
        for i in range(m):
            a = Polynomial.from_array(rows[i].copy(), False)
            b = Polynomial.from_array(inv[i].copy(), False)
            prod = (a * b).mod_x_to_the_n(prec)
            assert prod == Polynomial.one()


def test_rows_mod_matches_divmod():
    # batched reversal-trick modulo == long division, monic divisors
    import numpy as np

    from twenty_first_tpu.math.polynomial import Polynomial

    rng = random.Random(22)
    nprng = np.random.default_rng(22)
    for _ in range(6):
        m = rng.randrange(1, 4)
        D = rng.randrange(1, 20)
        L = D + rng.randrange(1, 30)
        a = nprng.integers(0, P, (m, L), dtype=np.uint64)
        b = nprng.integers(0, P, (m, D + 1), dtype=np.uint64)
        b[:, D] = 1  # monic
        binv = Polynomial._rows_ps_inverse(
            np.ascontiguousarray(b[:, ::-1]), L - D)
        rem = Polynomial._rows_mod(a, b, binv)
        for i in range(m):
            fa = Polynomial.from_array(a[i].copy(), False)
            fb = Polynomial.from_array(b[i].copy(), False)
            want = fa % fb
            got = Polynomial.from_array(rem[i].copy(), False)
            assert got == want


def test_remainder_tree_eval_random_sizes():
    # _remainder_tree_eval == Horner on random non-pow2 point counts
    import numpy as np

    from twenty_first_tpu.math.polynomial import (Polynomial, _eval_many)

    nprng = np.random.default_rng(23)
    for n_pts, deg in ((17, 300), (100, 150), (257, 64), (513, 700)):
        fa = nprng.integers(0, P, deg, dtype=np.uint64)
        f = Polynomial.from_array(fa.copy(), False)
        pts = nprng.integers(0, P, n_pts, dtype=np.uint64)
        got = f._remainder_tree_eval(pts)
        want = _eval_many(f.to_array(), False, pts, False)
        assert np.array_equal(got, want), (n_pts, deg)


def test_formal_power_series_inverse_newton_concrete():
    # polynomial.rs:4052-4070 (hardcoded reference case)
    f = Polynomial([bfe(c) for c in (
        3618372803227210457, 14620511201754172786, 2577803283145951105,
        1723541458268087404, 4119508755381840018, 8592072587377832596,
        236223201225)])
    precision = 8
    g = f.formal_power_series_inverse_newton(precision)
    xn = Polynomial.x_to_the(precision)
    _, remainder = (g * f).divide(xn)
    assert remainder.is_one()


def test_structured_multiple_generates_structure_concrete():
    # polynomial.rs:4139-4159 (hardcoded reference case)
    f = Polynomial([bfe(c) for c in
                    (884763262770, 0, 51539607540, 14563891882495327437)])
    n = f.degree()
    m = f.structured_multiple()
    assert m.degree() == 3 * n + 1
    x3np1 = Polynomial.x_to_the(3 * n + 1)
    _, remainder = m.divide(x3np1)
    assert remainder.degree() <= 2 * n
    structured = m - remainder
    assert structured.reverse().degree() == 0
    assert structured.leading_coefficient() == bfe(1)


def test_structured_multiple_is_multiple():
    # polynomial.rs `structured_multiple_is_multiple` (+ of_degree variant)
    rng = random.Random(33)
    for _ in range(10):
        f = rand_poly(rng, rng.randrange(1, 12))
        if f.degree() < 0:
            continue
        m = f.structured_multiple()
        _, r = m.divide(f)
        assert r.is_zero()


def test_fast_evaluate_on_hardcoded_domain_and_polynomial():
    # polynomial.rs:3498-3505
    f = Polynomial([bfe(c) for c in (0, 0, 0, 1, 0, 1)])  # x^5 + x^3
    domain = [bfe(6), bfe(12)]
    want = [x.mod_pow(5) + x.mod_pow(3) for x in domain]
    assert f.batch_evaluate(domain) == want


def test_reduce_by_ntt_friendly_modulus_concrete():
    # polynomial.rs:4311-4333
    import numpy as np

    from twenty_first_tpu.math import ntt as ntt_mod

    a = Polynomial([bfe(0), bfe(0), bfe(75944580)])
    b_coeffs = [bfe(944892804900)]
    n = 2  # next_power_of_two(len(b) + 1)
    full_modulus = Polynomial(b_coeffs + [bfe(0)] * (n - 1) + [bfe(1)])
    _, long_remainder = a.divide(full_modulus)
    shift = np.zeros(n, dtype=np.uint64)
    shift[0] = b_coeffs[0].value()
    shift_ntt = ntt_mod.ntt_values(shift)
    structured = a.reduce_by_ntt_friendly_modulus(shift_ntt, 1)
    assert structured == long_remainder


def test_reduce_long_division_and_fast_reduce_agree_simple_fixed():
    # polynomial.rs:4378-4397
    roots = [bfe(i) for i in range(10)]
    numerator = Polynomial.zerofier(roots).formal_derivative()
    denominator = Polynomial.zerofier(roots[: len(roots) // 5])
    quotient, remainder = numerator.divide(denominator)
    assert numerator == denominator * quotient + remainder
    assert numerator.fast_reduce(denominator) == remainder
    assert numerator.reduce(denominator) == remainder
