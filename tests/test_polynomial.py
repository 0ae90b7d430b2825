"""Polynomial engine tests: naive-vs-fast equivalence oracles (the
reference's own test strategy, SURVEY §4.3), ring axioms, interpolation/
evaluation roundtrips, coset ops, and power-series machinery."""

import numpy as np
import pytest

from twenty_first_tpu.math.b_field_element import BFieldElement, bfe, P
from twenty_first_tpu.errors import PolynomialError
from twenty_first_tpu.math.polynomial import Polynomial, barycentric_evaluate
from twenty_first_tpu.math.x_field_element import XFieldElement, xfe
from twenty_first_tpu.math.zerofier_tree import ZerofierTree

RNG = np.random.default_rng(31337)


def rand_poly(deg, field="b"):
    if deg < 0:
        return Polynomial.zero()
    vals = RNG.integers(0, P, size=(deg + 1, 3), dtype=np.uint64)
    if field == "b":
        coeffs = [bfe(int(v[0])) for v in vals]
    else:
        coeffs = [xfe((int(v[0]), int(v[1]), int(v[2]))) for v in vals]
    coeffs[-1] = coeffs[-1] if not coeffs[-1].is_zero() else (
        bfe(1) if field == "b" else xfe(1))
    return Polynomial(coeffs)


def rand_points(n, distinct=True):
    seen = set()
    out = []
    while len(out) < n:
        v = int(RNG.integers(0, P, dtype=np.uint64))
        if distinct and v in seen:
            continue
        seen.add(v)
        out.append(bfe(v))
    return out


def test_degree_and_equality_ignore_trailing_zeros():
    p1 = Polynomial([1, 2, 3, 0, 0])
    p2 = Polynomial([1, 2, 3])
    assert p1.degree() == 2
    assert p1 == p2
    assert hash(p1) == hash(p2)
    assert Polynomial.zero().degree() == -1
    assert Polynomial([0, 0]).is_zero()


def test_naive_vs_fast_multiply():
    for da, db in [(0, 0), (3, 7), (200, 80), (300, 300)]:
        a, b = rand_poly(da), rand_poly(db)
        assert a.naive_multiply(b) == a.fast_multiply(b)
        assert a.multiply(b) == a.naive_multiply(b)
    # zero cases
    assert (rand_poly(5) * Polynomial.zero()).is_zero()


def test_xfe_multiply():
    a, b = rand_poly(40, "x"), rand_poly(300, "x")
    assert a.naive_multiply(b) == a.fast_multiply(b)


def test_ring_axioms():
    a, b, c = rand_poly(5), rand_poly(9), rand_poly(3)
    assert a * b == b * a
    assert (a + b) * c == a * c + b * c
    assert a + (-a) == Polynomial.zero()
    assert a * Polynomial.one() == a


def test_square_and_pow():
    a = rand_poly(70)
    assert a.square() == a * a
    assert a.fast_square() == a * a
    assert a.pow(3) == a * a * a
    assert a.pow(0) == Polynomial.one()


def test_divide_quotient_remainder_invariant():
    for dn, dd in [(10, 3), (8, 8), (2, 5), (300, 7)]:
        n, d = rand_poly(dn), rand_poly(dd)
        q, r = n.divide(d)
        assert q * d + r == n
        assert r.degree() < d.degree()


def test_division_by_zero_raises():
    with pytest.raises(ZeroDivisionError):
        rand_poly(4).divide(Polynomial.zero())


def test_clean_divide_matches_divide():
    for da, db in [(8, 3), (600, 9), (1100, 37)]:
        a, b = rand_poly(da), rand_poly(db)
        prod = a * b
        assert prod.clean_divide(b) == a
        assert prod.clean_divide(a) == b


def test_xgcd():
    a, b = rand_poly(12), rand_poly(8)
    g, u, v = a.xgcd(b)
    assert u * a + v * b == g
    assert g.leading_coefficient().is_one()
    # gcd of p and p*q is monic normalization of p
    q = rand_poly(4)
    g2, _, _ = a.xgcd(a * q)
    assert g2 == a.scalar_mul(a.leading_coefficient().inverse())
    # zero inputs do not panic (polynomial.rs:3848-3854)
    g3, _, _ = Polynomial.zero().xgcd(Polynomial.zero())
    assert g3.is_zero()


def test_zerofier_variants_agree():
    for n in [0, 1, 5, 99, 130, 260]:
        domain = rand_points(n)
        z = Polynomial.zerofier(domain)
        assert z == Polynomial.smart_zerofier(domain)
        assert z == Polynomial.fast_zerofier(domain)
        assert z.degree() == n
        if n:
            assert z.leading_coefficient().is_one()
            for pt in domain[:5]:
                assert z.evaluate(pt).is_zero()
            nonroot = bfe(int(RNG.integers(0, P, dtype=np.uint64)))
            if nonroot not in domain:
                assert not z.evaluate(nonroot).is_zero()


def test_evaluate_cross_field():
    p = rand_poly(6)
    x = xfe((3, 5, 7))
    got = p.evaluate(x)
    assert isinstance(got, XFieldElement)
    # equals evaluation of lifted polynomial
    lifted = Polynomial([c.lift() for c in p.coefficients])
    assert got == lifted.evaluate(x)


def test_batch_evaluate_matches_pointwise():
    for deg, npoints in [(5, 3), (50, 40), (300, 33), (40, 200)]:
        p = rand_poly(deg)
        domain = rand_points(npoints)
        want = [p.evaluate(x) for x in domain]
        assert p.batch_evaluate(domain) == want


def test_interpolate_roundtrip():
    for n in [1, 2, 17, 100, 300]:
        domain = rand_points(n)
        values = [bfe(int(v)) for v in RNG.integers(0, P, size=n, dtype=np.uint64)]
        p = Polynomial.interpolate(domain, values)
        assert p.degree() < n
        assert p.batch_evaluate(domain) == values


def test_lagrange_vs_fast_interpolate():
    n = 280
    domain = rand_points(n)
    values = [bfe(int(v)) for v in RNG.integers(0, P, size=n, dtype=np.uint64)]
    assert Polynomial.lagrange_interpolate(domain, values) == \
        Polynomial.fast_interpolate(domain, values)


def test_coset_evaluate_interpolate():
    p = rand_poly(30)
    offset = BFieldElement.generator()
    order = 64
    evals = p.fast_coset_evaluate(offset, order)
    root = BFieldElement.primitive_root_of_unity(order)
    # spot-check a few points
    for i in [0, 1, 5, 63]:
        assert evals[i] == p.evaluate(offset * root.mod_pow(i))
    back = Polynomial.fast_coset_interpolate(offset, evals)
    assert back == p


def test_coset_extrapolate():
    p = rand_poly(20)
    offset = BFieldElement.generator()
    codeword = p.fast_coset_evaluate(offset, 32)
    points = rand_points(5)
    got = Polynomial.coset_extrapolate(offset, codeword, points)
    assert got == [p.evaluate(x) for x in points]


def test_formal_power_series_inverse():
    p = rand_poly(9)
    if p.coefficient(0).is_zero():
        p = p + Polynomial.one()
    for precision in [1, 2, 7, 30]:
        for g in [p.formal_power_series_inverse_minimal(precision),
                  p.formal_power_series_inverse_newton(precision)]:
            prod = (p * g).mod_x_to_the_n(precision)
            assert prod == Polynomial.one(), precision


def test_structured_multiple():
    f = rand_poly(7)
    for n in [7, 10, 20]:
        m = f.structured_multiple_of_degree(n)
        assert m.degree() == n
        _, r = m.divide(f)
        assert r.is_zero()
        # structured shape: zero coefficients between deg(f) and n
        for i in range(f.degree(), n):
            assert m.coefficient(i).is_zero(), (i, n)
        assert m.leading_coefficient().is_one()


def test_scale():
    p = rand_poly(12)
    alpha = bfe(12345)
    x = bfe(678)
    assert p.scale(alpha).evaluate(x) == p.evaluate(alpha * x)


def test_truncate_and_mod_x_to_the_n():
    f = Polynomial([0, 1, 2, 3, 4])
    assert f.truncate(2) == Polynomial([2, 3, 4])
    assert f.mod_x_to_the_n(2) == Polynomial([0, 1])


def test_formal_derivative():
    f = Polynomial([5, 3, 2])  # 2x^2+3x+5
    assert f.formal_derivative() == Polynomial([3, 4])


def test_colinearity():
    pts = [(bfe(1), bfe(3)), (bfe(2), bfe(5)), (bfe(3), bfe(7))]
    assert Polynomial.are_colinear(pts)
    assert Polynomial.get_colinear_y(pts[0], pts[1], bfe(3)) == bfe(7)
    bad = [(bfe(1), bfe(3)), (bfe(2), bfe(5)), (bfe(3), bfe(8))]
    assert not Polynomial.are_colinear(bad)


def test_barycentric_evaluate():
    for n in [4, 32]:
        codeword = [bfe(int(v)) for v in RNG.integers(0, P, size=n, dtype=np.uint64)]
        from twenty_first_tpu.math import ntt as ntt_mod

        poly = Polynomial(ntt_mod.intt(codeword))
        z = bfe(987654321)
        assert barycentric_evaluate(codeword, z) == poly.evaluate(z)


def test_zerofier_tree():
    domain = rand_points(50)
    tree = ZerofierTree.new_from_domain(domain)
    z = tree.zerofier()
    assert z == Polynomial.zerofier(domain)


def test_shift_coefficients():
    f = Polynomial([1, 2])
    assert f.shift_coefficients(2) == Polynomial([0, 0, 1, 2])


def test_fast_reduce_matches_divide():
    for dn, dd in [(600, 20), (2000, 37), (520, 256)]:
        n, d = rand_poly(dn), rand_poly(dd)
        fast = n.fast_reduce(d)
        _, want = n.divide(d)
        assert fast == want, (dn, dd)
        assert n.reduce(d) == want


def test_minor_variant_oracles():
    """naive_zerofier / slow_square / iterative_batch_evaluate /
    lagrange_interpolate_zipped / into_coefficients match their fast
    counterparts (polynomial.rs:401-423, :1549-1562, :1876-1878, :2482-2488)."""
    rng = np.random.default_rng(11)
    domain = [bfe(int(v)) for v in rng.integers(1, P, size=9, dtype=np.uint64)]
    assert Polynomial.naive_zerofier(domain) == Polynomial.zerofier(domain)
    p = Polynomial([bfe(int(v)) for v in rng.integers(0, P, size=17, dtype=np.uint64)])
    assert p.slow_square() == p.square()
    pts = [bfe(int(v)) for v in rng.integers(0, P, size=5, dtype=np.uint64)]
    assert p.iterative_batch_evaluate(pts) == p.batch_evaluate(pts)
    values = [bfe(int(v)) for v in rng.integers(0, P, size=9, dtype=np.uint64)]
    zipped = Polynomial.lagrange_interpolate_zipped(list(zip(domain, values)))
    assert zipped == Polynomial.lagrange_interpolate(domain, values)
    with pytest.raises(PolynomialError):
        Polynomial.lagrange_interpolate_zipped([])
    with pytest.raises(PolynomialError):
        Polynomial.lagrange_interpolate_zipped(
            [(domain[0], values[0]), (domain[0], values[1])])
    assert Polynomial([bfe(1), bfe(2), bfe(0)]).into_coefficients() == [bfe(1), bfe(2)]


def test_fast_reduce_large_by_small_matches_division():
    """Regression: deg-2^14 mod deg-2^9 through the chunked three-phase
    fast_reduce (one pass per chunk) must equal the long-division remainder.
    The earlier repeated-top-split form was O(n^2/d) and took minutes at
    2^17 (fixed; see fast_reduce docstring)."""
    rng = np.random.default_rng(23)
    a = Polynomial.from_array(
        rng.integers(0, P, size=1 << 14, dtype=np.uint64))
    m = Polynomial.from_array(
        rng.integers(0, P, size=(1 << 9) + 1, dtype=np.uint64))
    got = a.fast_reduce(m)
    _, want = a.naive_divide(m)
    assert got == want
    # extension-field numerator over base-field modulus
    ax = Polynomial.from_array(
        rng.integers(0, P, size=((1 << 12), 3), dtype=np.uint64), True)
    gotx = ax.fast_reduce(m)
    _, wantx = ax.naive_divide(m)
    assert gotx == wantx
