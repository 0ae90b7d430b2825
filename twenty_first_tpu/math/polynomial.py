"""Univariate polynomials over the Goldilocks field and its cubic extension.

Mirrors the capability surface of twenty-first/src/math/polynomial.rs
(multiply/divide/xgcd/reduce/zerofier/evaluate/interpolate/coset ops/
extrapolation/barycentric evaluation) with the reference's algorithm
families and benchmark-derived cutoffs. Scalar control flow lives on the
host; every superlinear inner loop (NTT multiply, coset transforms, batch
work) dispatches to the batched device kernels in math/ntt.py, which is the
TPU-native replacement for the reference's rayon `par_*` variants — those
are provided as aliases.

Coefficients are host lists of BFieldElement/XFieldElement, index == degree.
Trailing zeros are ignored for degree/equality, as in the reference
(polynomial.rs:181-188, :151-164).
"""

from __future__ import annotations

from typing import Iterable, Sequence


from .b_field_element import BFieldElement, bfe
from .x_field_element import XFieldElement
from . import ntt as ntt_mod
from .zerofier_tree import RECURSION_CUTOFF_THRESHOLD, ZerofierTree

# Benchmark-derived crossover constants (reference polynomial.rs:704-753).
FAST_MULTIPLY_CUTOFF_THRESHOLD = 1 << 8
FAST_SQUARE_CUTOFF_THRESHOLD = 64
FAST_INTERPOLATE_CUTOFF_THRESHOLD_SEQUENTIAL = 1 << 12
FAST_INTERPOLATE_CUTOFF_THRESHOLD_PARALLEL = 1 << 8
FAST_ZEROFIER_CUTOFF_THRESHOLD = 100
FAST_COSET_INTERPOLATE_LAGRANGE_CUTOFF = 1 << 8
FAST_COSET_INTERPOLATE_INTT_CUTOFF = 1 << 17
CLEAN_DIVIDE_CUTOFF = 1 << 9
FAST_REDUCE_CUTOFF_THRESHOLD = 1 << 8


def _is_xfe(e) -> bool:
    return isinstance(e, XFieldElement)


def _zero_like(e):
    return XFieldElement.zero() if _is_xfe(e) else BFieldElement(0)


def _one_like(e):
    return XFieldElement.one() if _is_xfe(e) else BFieldElement(1)


class Polynomial:
    __slots__ = ("coefficients",)

    def __init__(self, coefficients: Iterable):
        coeffs = []
        for c in coefficients:
            if isinstance(c, (BFieldElement, XFieldElement)):
                coeffs.append(c)
            else:
                coeffs.append(bfe(c))
        self.coefficients = coeffs

    # -- constructors -------------------------------------------------------

    @classmethod
    def new(cls, coefficients) -> "Polynomial":
        return cls(coefficients)

    # The reference distinguishes owned/borrowed coefficient storage
    # (polynomial.rs:2460-2499); python lists make that moot.
    new_borrowed = new

    @classmethod
    def zero(cls) -> "Polynomial":
        return cls([])

    @classmethod
    def one(cls) -> "Polynomial":
        return cls([bfe(1)])

    @classmethod
    def from_constant(cls, c) -> "Polynomial":
        return cls([c])

    @classmethod
    def x_to_the(cls, n: int) -> "Polynomial":
        return cls([bfe(0)] * n + [bfe(1)])

    # -- basic structure ----------------------------------------------------

    def degree(self) -> int:
        deg = len(self.coefficients) - 1
        while deg >= 0 and self.coefficients[deg].is_zero():
            deg -= 1
        return deg

    def normalize(self) -> "Polynomial":
        return Polynomial(self.coefficients[: self.degree() + 1])

    def leading_coefficient(self):
        deg = self.degree()
        return None if deg < 0 else self.coefficients[deg]

    def is_zero(self) -> bool:
        return self.degree() < 0

    def is_one(self) -> bool:
        return self.degree() == 0 and self.coefficients[0].is_one()

    def is_x(self) -> bool:
        return self.degree() == 1 and self.coefficients[1].is_one() \
            and self.coefficients[0].is_zero()

    def _field_zero(self):
        for c in self.coefficients:
            return _zero_like(c)
        return BFieldElement(0)

    def coefficient(self, i: int):
        if i < len(self.coefficients):
            return self.coefficients[i]
        return self._field_zero()

    def __eq__(self, other):
        if not isinstance(other, Polynomial):
            return NotImplemented
        a, b = self.coefficients, other.coefficients
        la, lb = self.degree() + 1, other.degree() + 1
        if la != lb:
            return False
        return all(a[i] == b[i] for i in range(la))

    def __hash__(self):
        return hash(tuple(self.coefficients[: self.degree() + 1]))

    def __repr__(self):
        return f"Polynomial({[c for c in self.coefficients[:self.degree() + 1]]})"

    def __str__(self):
        deg = self.degree()
        if deg < 0:
            return "0"
        terms = []
        for i in range(deg, -1, -1):
            c = self.coefficients[i]
            if c.is_zero():
                continue
            if i == 0:
                terms.append(f"{c}")
            elif i == 1:
                terms.append(f"{c}x" if not c.is_one() else "x")
            else:
                terms.append(f"{c}x^{i}" if not c.is_one() else f"x^{i}")
        return " + ".join(terms)

    # -- ring operations ----------------------------------------------------

    def __add__(self, other) -> "Polynomial":
        other = _coerce_poly(other)
        n = max(len(self.coefficients), len(other.coefficients))
        out = []
        for i in range(n):
            out.append(self.coefficient(i) + other.coefficient(i))
        return Polynomial(out)

    __radd__ = __add__

    def __sub__(self, other) -> "Polynomial":
        other = _coerce_poly(other)
        n = max(len(self.coefficients), len(other.coefficients))
        return Polynomial(
            [self.coefficient(i) - other.coefficient(i) for i in range(n)]
        )

    def __neg__(self) -> "Polynomial":
        return Polynomial([-c for c in self.coefficients])

    def __mul__(self, other) -> "Polynomial":
        if isinstance(other, (BFieldElement, XFieldElement, int)):
            return self.scalar_mul(other)
        return self.multiply(other)

    def __rmul__(self, other) -> "Polynomial":
        if isinstance(other, (BFieldElement, XFieldElement, int)):
            return self.scalar_mul(other)
        return NotImplemented

    def scalar_mul(self, scalar) -> "Polynomial":
        if isinstance(scalar, int):
            scalar = bfe(scalar)
        return Polynomial([c * scalar for c in self.coefficients])

    def multiply(self, other: "Polynomial") -> "Polynomial":
        """Dispatch: schoolbook below the NTT cutoff (polynomial.rs:873-887)."""
        if self.degree() + other.degree() < FAST_MULTIPLY_CUTOFF_THRESHOLD:
            return self.naive_multiply(other)
        return self.fast_multiply(other)

    def naive_multiply(self, other: "Polynomial") -> "Polynomial":
        da, db = self.degree(), other.degree()
        if da < 0 or db < 0:
            return Polynomial.zero()
        a = self.coefficients
        b = other.coefficients
        zero = (a[0] * b[0]) - (a[0] * b[0])  # zero in the result field
        out = [zero] * (da + db + 1)
        for i in range(da + 1):
            ai = a[i]
            if ai.is_zero():
                continue
            for j in range(db + 1):
                out[i + j] = out[i + j] + ai * b[j]
        return Polynomial(out)

    def fast_multiply(self, other: "Polynomial") -> "Polynomial":
        """NTT multiply (polynomial.rs:900-932), on device."""
        da, db = self.degree(), other.degree()
        if da < 0 or db < 0:
            return Polynomial.zero()
        result_len = da + db + 1
        n = 1 << (result_len - 1).bit_length()
        a = self.coefficients[: da + 1] + [self._field_zero()] * (n - da - 1)
        b = other.coefficients[: db + 1] + [other._field_zero()] * (n - db - 1)
        fa = ntt_mod.ntt(a)
        fb = ntt_mod.ntt(b)
        prod = [x * y for x, y in zip(fa, fb)]
        return Polynomial(ntt_mod.intt(prod)[:result_len])

    @staticmethod
    def batch_multiply(factors: Sequence["Polynomial"]) -> "Polynomial":
        """Product tree (polynomial.rs:935-984)."""
        if not factors:
            return Polynomial.one()
        layer = list(factors)
        while len(layer) > 1:
            nxt = [
                layer[i] * layer[i + 1] for i in range(0, len(layer) - 1, 2)
            ]
            if len(layer) % 2:
                nxt.append(layer[-1])
            layer = nxt
        return layer[0]

    par_batch_multiply = batch_multiply

    def square(self) -> "Polynomial":
        if self.degree() < FAST_SQUARE_CUTOFF_THRESHOLD:
            return self.naive_multiply(self)
        return self.fast_square()

    def fast_square(self) -> "Polynomial":
        return self.fast_multiply(self)

    def pow(self, exponent: int) -> "Polynomial":
        if exponent == 0:
            return Polynomial.one()
        result = Polynomial.one()
        base = self
        e = int(exponent)
        while e:
            if e & 1:
                result = result * base
            base = base.square()
            e >>= 1
        return result

    fast_pow = pow
    __pow__ = pow

    def shift_coefficients(self, power: int) -> "Polynomial":
        """Multiply by x^power (polynomial.rs:480-484)."""
        return Polynomial([self._field_zero()] * power + list(self.coefficients))

    def scale(self, alpha) -> "Polynomial":
        """p(x) -> p(alpha * x) (polynomial.rs:760-773)."""
        out = []
        acc = _one_like(alpha) if not isinstance(alpha, int) else bfe(1)
        if isinstance(alpha, int):
            alpha = bfe(alpha)
        for c in self.coefficients:
            out.append(c * acc)
            acc = acc * alpha
        return Polynomial(out)

    def truncate(self, k: int) -> "Polynomial":
        """The leading k+1 coefficients (lowest-degree terms dropped),
        matching polynomial.rs truncate semantics: keep degree <= k part of
        the polynomial *from the top*."""
        deg = self.degree()
        take = min(k + 1, deg + 1)
        return Polynomial(self.coefficients[deg + 1 - take: deg + 1])

    def mod_x_to_the_n(self, n: int) -> "Polynomial":
        """Remainder modulo x^n: the n lowest coefficients."""
        coeffs = list(self.coefficients[:n])
        coeffs += [self._field_zero()] * (n - len(coeffs))
        return Polynomial(coeffs)

    def formal_derivative(self) -> "Polynomial":
        return Polynomial(
            [c * bfe(i) for i, c in enumerate(self.coefficients)][1:]
        )

    # -- division -----------------------------------------------------------

    def naive_divide(self, divisor: "Polynomial") -> tuple:
        """Long division -> (quotient, remainder) (polynomial.rs:552-600)."""
        dd = divisor.degree()
        if dd < 0:
            raise ZeroDivisionError("division by zero polynomial")
        dn = self.degree()
        if dn < dd:
            return Polynomial.zero(), self.normalize()
        lc_inv = divisor.leading_coefficient().inverse()
        rem = list(self.coefficients[: dn + 1])
        zero = self._field_zero()
        quot = [zero] * (dn - dd + 1)
        for i in range(dn - dd, -1, -1):
            q = rem[i + dd] * lc_inv
            quot[i] = q
            if q.is_zero():
                continue
            for j in range(dd + 1):
                rem[i + j] = rem[i + j] - q * divisor.coefficients[j]
        return Polynomial(quot), Polynomial(rem[:dd])

    def divide(self, divisor: "Polynomial") -> tuple:
        return self.naive_divide(divisor)

    def __truediv__(self, other) -> "Polynomial":
        q, _ = self.divide(_coerce_poly(other))
        return q

    def __floordiv__(self, other) -> "Polynomial":
        q, _ = self.divide(_coerce_poly(other))
        return q

    def __mod__(self, other) -> "Polynomial":
        _, r = self.divide(_coerce_poly(other))
        return r

    def __divmod__(self, other) -> tuple:
        return self.divide(_coerce_poly(other))

    def clean_divide(self, divisor: "Polynomial") -> "Polynomial":
        """Exact division, where the caller guarantees divisibility
        (polynomial.rs:2334-2413). Small sizes use long division; large
        sizes evaluate both operands on a coset lifted into the extension
        field (where spurious root collisions cannot happen for base-field
        operands) and divide pointwise."""
        if divisor.degree() < 0:
            raise ZeroDivisionError("division by zero polynomial")
        if self.degree() < CLEAN_DIVIDE_CUTOFF or divisor.degree() < 1:
            q, r = self.naive_divide(divisor)
            assert r.is_zero(), "clean_divide: division was not clean"
            return q
        result_len = self.degree() - divisor.degree() + 1
        n = 1 << max((self.degree()).bit_length(), 1)
        offset = BFieldElement.generator()
        num = self.scale(offset)
        den = divisor.scale(offset)
        num_c = num.coefficients[: num.degree() + 1]
        den_c = den.coefficients[: den.degree() + 1]
        zero = self._field_zero()
        num_c += [zero] * (n - len(num_c))
        den_c += [den._field_zero()] * (n - len(den_c))
        fn_ = ntt_mod.ntt(num_c)
        fd_ = ntt_mod.ntt(den_c)
        # pointwise division; fall back to long division on root collision
        try:
            quot_evals = [a / b for a, b in zip(fn_, fd_)]
        except ZeroDivisionError:
            q, r = self.naive_divide(divisor)
            assert r.is_zero(), "clean_divide: division was not clean"
            return q
        q = Polynomial(ntt_mod.intt(quot_evals)[:result_len])
        return q.scale(offset.inverse())

    def xgcd(self, other: "Polynomial") -> tuple:
        """Extended Euclid; gcd is normalized monic (polynomial.rs:616-649).
        Returns (gcd, a, b) with a*self + b*other == gcd."""
        x = self.normalize()
        y = _coerce_poly(other).normalize()
        a0, a1 = Polynomial.one(), Polynomial.zero()
        b0, b1 = Polynomial.zero(), Polynomial.one()
        while not y.is_zero():
            q, r = x.divide(y)
            x, y = y, r
            a0, a1 = a1, a0 - q * a1
            b0, b1 = b1, b0 - q * b1
        lc = x.leading_coefficient()
        if lc is not None and not lc.is_zero() and not lc.is_one():
            lc_inv = lc.inverse()
            x = x.scalar_mul(lc_inv)
            a0 = a0.scalar_mul(lc_inv)
            b0 = b0.scalar_mul(lc_inv)
        return x, a0, b0

    # -- modular reduction & power series ------------------------------------

    def reduce(self, modulus: "Polynomial") -> "Polynomial":
        """self mod modulus (dispatcher, polynomial.rs:989-1002)."""
        if modulus.degree() < 0:
            raise ZeroDivisionError("reduction modulo zero polynomial")
        if (
            self.degree() < FAST_REDUCE_CUTOFF_THRESHOLD
            or modulus.degree() < 1
            or self.degree() < 2 * modulus.degree()
        ):
            _, r = self.divide(modulus)
            return r
        return self.fast_reduce(modulus)

    def fast_reduce(self, modulus: "Polynomial") -> "Polynomial":
        """Chunked reduction via a structured multiple (polynomial.rs:1010-1046).

        Phase 1: reduce modulo a structured multiple M = x^k + tail of the
        modulus (so x^k ≡ -tail), folding the high part down with NTT
        multiplies until the degree drops below k. Phase 2: one long
        division by the modulus finishes the job. The remainder is unique,
        so this matches `divide` exactly.
        """
        d = modulus.degree()
        multiple = modulus.structured_multiple()  # x^(2d+1) + tail, deg tail < d
        k = multiple.degree()
        neg_tail = Polynomial(
            [self._field_zero() - c
             for c in multiple.coefficients[:d]]
        )
        current = self.normalize()
        while current.degree() >= k:
            low = Polynomial(current.coefficients[:k])
            high = Polynomial(current.coefficients[k:])
            current = low + high * neg_tail
        _, r = current.divide(modulus)
        return r

    def formal_power_series_inverse_minimal(self, precision: int) -> "Polynomial":
        """Minimal-degree g with self*g == 1 mod x^precision
        (polynomial.rs:657-675), by explicit coefficient recurrence."""
        f0 = self.coefficient(0)
        assert not f0.is_zero(), "constant term must be invertible"
        f0_inv = f0.inverse()
        out = [f0_inv]
        for i in range(1, precision):
            acc = _zero_like(f0)
            for j in range(1, min(i, len(self.coefficients) - 1) + 1):
                acc = acc + self.coefficient(j) * out[i - j]
            out.append(-acc * f0_inv)
        return Polynomial(out)

    def formal_power_series_inverse_newton(self, precision: int) -> "Polynomial":
        """Newton iteration g <- g*(2 - f*g), doubling precision
        (polynomial.rs:1281-1361)."""
        f0 = self.coefficient(0)
        assert not f0.is_zero(), "constant term must be invertible"
        g = Polynomial([f0.inverse()])
        current = 1
        two = Polynomial([bfe(2)])
        while current < precision:
            current *= 2
            fg = (self.mod_x_to_the_n(current) * g).mod_x_to_the_n(current)
            g = (g * (two - fg)).mod_x_to_the_n(current)
        return g.mod_x_to_the_n(precision)

    def structured_multiple(self) -> "Polynomial":
        return self.structured_multiple_of_degree(2 * self.degree() + 1)

    def structured_multiple_of_degree(self, n: int) -> "Polynomial":
        """A multiple of self of the form x^n + (tail of degree < deg(self)),
        via reversal + formal power series inverse (polynomial.rs:1161-1186)."""
        deg = self.degree()
        assert deg >= 0 and n >= deg
        if deg == 0:
            return Polynomial.x_to_the(n)
        rev = Polynomial(list(reversed(self.coefficients[: deg + 1])))
        inv = rev.formal_power_series_inverse_newton(n - deg + 1)
        q = Polynomial(list(reversed(inv.mod_x_to_the_n(n - deg + 1)
                                     .coefficients)))
        return (q * self).normalize()

    # -- zerofiers ----------------------------------------------------------

    @staticmethod
    def zerofier(domain: Sequence) -> "Polynomial":
        """Unique monic polynomial vanishing exactly on `domain`
        (polynomial.rs:1418-1441)."""
        if len(domain) < FAST_ZEROFIER_CUTOFF_THRESHOLD:
            return Polynomial.smart_zerofier(domain)
        return Polynomial.fast_zerofier(domain)

    @staticmethod
    def smart_zerofier(domain: Sequence) -> "Polynomial":
        """Incremental O(n^2) construction (polynomial.rs:1462-1474)."""
        if len(domain) == 0:
            return Polynomial.one()
        zero = _zero_like(domain[0])
        one = _one_like(domain[0])
        coeffs = [zero] * (len(domain) + 1)
        coeffs[0] = one
        for k, root in enumerate(domain):
            neg_root = zero - root
            for i in range(k + 1, 0, -1):
                coeffs[i] = coeffs[i - 1] + neg_root * coeffs[i]
            coeffs[0] = coeffs[0] * neg_root
        return Polynomial(coeffs)

    @staticmethod
    def fast_zerofier(domain: Sequence) -> "Polynomial":
        """Divide and conquer with NTT multiplies (polynomial.rs:1478-1484)."""
        if len(domain) <= RECURSION_CUTOFF_THRESHOLD:
            return Polynomial.smart_zerofier(domain)
        mid = len(domain) // 2
        left = Polynomial.fast_zerofier(domain[:mid])
        right = Polynomial.fast_zerofier(domain[mid:])
        return left * right

    par_zerofier = zerofier

    # -- evaluation ----------------------------------------------------------

    def evaluate(self, point):
        """Horner evaluation; the point may live in the extension of the
        coefficient field (polynomial.rs:309-329)."""
        if isinstance(point, int):
            point = bfe(point)
        acc = None
        for c in reversed(self.coefficients):
            acc = c if acc is None else acc * point + c
        if acc is None:
            return _zero_like(point)
        return acc if not isinstance(acc, int) else bfe(acc)

    evaluate_in_same_field = evaluate

    def batch_evaluate(self, domain: Sequence) -> list:
        """Evaluate on many points (polynomial.rs:1840-1894): reduce-then-
        evaluate when the degree dwarfs the domain, else zerofier-tree
        divide-and-conquer."""
        if len(domain) == 0:
            return []
        if self.degree() >= 4 * len(domain):
            tree = ZerofierTree.new_from_domain(domain)
            reduced = self.reduce(tree.zerofier())
            return reduced.divide_and_conquer_batch_evaluate(tree)
        tree = ZerofierTree.new_from_domain(domain)
        return self.divide_and_conquer_batch_evaluate(tree)

    par_batch_evaluate = batch_evaluate

    def divide_and_conquer_batch_evaluate(self, tree: ZerofierTree) -> list:
        if tree.root is None:
            return []
        return self._dc_eval(tree.root)

    def _dc_eval(self, node) -> list:
        if node.is_leaf:
            return [self.evaluate(p) for p in node.points]
        out = []
        for child in (node.left, node.right):
            if child is not None:
                reduced = self.reduce(child.zerofier)
                out.extend(reduced._dc_eval(child))
        return out

    # -- interpolation -------------------------------------------------------

    @staticmethod
    def interpolate(domain: Sequence, values: Sequence) -> "Polynomial":
        """Unique interpolant of degree < n (polynomial.rs:1502-1543)."""
        assert len(domain) == len(values) and len(domain) > 0
        if len(domain) < FAST_INTERPOLATE_CUTOFF_THRESHOLD_PARALLEL:
            return Polynomial.lagrange_interpolate(domain, values)
        return Polynomial.fast_interpolate(domain, values)

    par_interpolate = interpolate

    @staticmethod
    def lagrange_interpolate(domain: Sequence, values: Sequence) -> "Polynomial":
        """Zerofier-based O(n^2) Lagrange (polynomial.rs:1565-1607)."""
        n = len(domain)
        assert n == len(values) and n > 0
        if n == 1:
            return Polynomial([values[0]])
        zerofier = Polynomial.zerofier(domain)
        # For each i: zerofier / (x - domain[i]) evaluated formulation
        # via synthetic division + batch-inverted denominators.
        denominators = []
        numerator_polys = []
        for i in range(n):
            quotient, _ = _synthetic_divide(zerofier, domain[i])
            numerator_polys.append(quotient)
            denominators.append(quotient.evaluate(domain[i]))
        if isinstance(denominators[0], XFieldElement):
            inverses = XFieldElement.batch_inversion(denominators)
        else:
            inverses = BFieldElement.batch_inversion(denominators)
        zero = _zero_like(values[0] * domain[0])
        acc = [zero] * n
        for i in range(n):
            scalar = values[i] * inverses[i]
            if scalar.is_zero():
                continue
            for j, c in enumerate(numerator_polys[i].coefficients):
                acc[j] = acc[j] + c * scalar
        return Polynomial(acc)

    @staticmethod
    def fast_interpolate(domain: Sequence, values: Sequence) -> "Polynomial":
        """Recursive half-domain interpolation with batch-inverted offsets
        (polynomial.rs:1611-1701)."""
        n = len(domain)
        assert n == len(values) and n > 0
        if n <= FAST_INTERPOLATE_CUTOFF_THRESHOLD_PARALLEL:
            return Polynomial.lagrange_interpolate(domain, values)
        mid = n // 2
        ld, rd = list(domain[:mid]), list(domain[mid:])
        lv, rv = list(values[:mid]), list(values[mid:])
        left_zerofier = Polynomial.zerofier(ld)
        right_zerofier = Polynomial.zerofier(rd)
        left_offset = right_zerofier.batch_evaluate(ld)
        right_offset = left_zerofier.batch_evaluate(rd)
        if isinstance(left_offset[0], XFieldElement):
            inv = XFieldElement.batch_inversion(left_offset + right_offset)
        else:
            inv = BFieldElement.batch_inversion(left_offset + right_offset)
        left_targets = [v * i for v, i in zip(lv, inv[:mid])]
        right_targets = [v * i for v, i in zip(rv, inv[mid:])]
        left_interp = Polynomial.fast_interpolate(ld, left_targets)
        right_interp = Polynomial.fast_interpolate(rd, right_targets)
        return left_interp * right_zerofier + right_interp * left_zerofier

    par_fast_interpolate = fast_interpolate

    @staticmethod
    def batch_fast_interpolate(domain: Sequence, value_batches: Sequence
                               ) -> list:
        """Interpolate many value sets on one shared domain
        (polynomial.rs:1703-1837)."""
        return [Polynomial.interpolate(domain, v) for v in value_batches]

    # -- coset (Reed-Solomon) transforms -------------------------------------

    def fast_coset_evaluate(self, offset, order: int) -> list:
        """Evaluate on the coset offset * <omega> of size `order`:
        scale then NTT (polynomial.rs:1374-1399)."""
        assert order & (order - 1) == 0
        assert self.degree() < order
        scaled = self.scale(offset)
        coeffs = scaled.coefficients[: scaled.degree() + 1]
        coeffs += [self._field_zero()] * (order - len(coeffs))
        return ntt_mod.ntt(coeffs)

    @staticmethod
    def fast_coset_interpolate(offset, values: Sequence) -> "Polynomial":
        """iNTT then scale by offset^-1 (polynomial.rs:1907-1918)."""
        coeffs = ntt_mod.intt(list(values))
        if isinstance(offset, int):
            offset = bfe(offset)
        return Polynomial(coeffs).scale(offset.inverse())

    @staticmethod
    def coset_extrapolate(domain_offset, codeword: Sequence, points: Sequence
                          ) -> list:
        """Extrapolate a codeword over coset `domain_offset * <omega>` to
        arbitrary points (polynomial.rs:2117-2331)."""
        poly = Polynomial.fast_coset_interpolate(domain_offset, codeword)
        return poly.batch_evaluate(points)

    @staticmethod
    def batch_coset_extrapolate(domain_offset, codeword_length: int,
                                codewords: Sequence, points: Sequence) -> list:
        """Many codewords, one domain, shared points (flattened results)."""
        out = []
        for i in range(0, len(codewords), codeword_length):
            codeword = codewords[i: i + codeword_length]
            out.extend(
                Polynomial.coset_extrapolate(domain_offset, codeword, points)
            )
        return out

    par_batch_coset_extrapolate = batch_coset_extrapolate

    # -- colinearity ---------------------------------------------------------

    @staticmethod
    def are_colinear_3(p0, p1, p2) -> bool:
        (ax, ay), (bx, by), (cx, cy) = p0, p1, p2
        dy = by - ay
        dx = bx - ax
        return (cy - ay) * dx == dy * (cx - ax)

    @staticmethod
    def are_colinear(points: Sequence) -> bool:
        if len(points) < 3:
            return False
        if len({p[0] for p in points}) != len(points):
            return False
        return all(
            Polynomial.are_colinear_3(points[0], points[1], p)
            for p in points[2:]
        )

    @staticmethod
    def get_colinear_y(p0, p1, x):
        (ax, ay), (bx, by) = p0, p1
        assert ax != bx, "unique line requires distinct x-coordinates"
        return (by - ay) * (x - ax) / (bx - ax) + ay


def _coerce_poly(x) -> Polynomial:
    if isinstance(x, Polynomial):
        return x
    if isinstance(x, (BFieldElement, XFieldElement)):
        return Polynomial([x])
    if isinstance(x, int):
        return Polynomial([bfe(x)])
    raise TypeError(f"cannot coerce {type(x)} to Polynomial")


def _synthetic_divide(poly: Polynomial, root):
    """Divide poly by (x - root) via synthetic division -> (quotient, rem)."""
    deg = poly.degree()
    if deg < 0:
        return Polynomial.zero(), _zero_like(root)
    out = [None] * deg
    acc = poly.coefficients[deg]
    for i in range(deg - 1, -1, -1):
        out[i] = acc
        acc = acc * root + poly.coefficients[i]
    return Polynomial(out), acc


# ---------------------------------------------------------------------------
# Barycentric evaluation of codewords (polynomial.rs:2587-2638)
# ---------------------------------------------------------------------------


def barycentric_evaluate(codeword: Sequence, indeterminate):
    """Evaluate the interpolant of a codeword over <omega> at a point using
    the barycentric formula (no interpolation):

        p(z) = [sum_i c_i * w_i / (z - d_i)] / [sum_i w_i / (z - d_i)]

    with d_i = omega^i. Requires z outside the domain."""
    n = len(codeword)
    assert n & (n - 1) == 0 and n > 0
    root = BFieldElement.primitive_root_of_unity(n)
    domain = []
    acc = bfe(1)
    for _ in range(n):
        domain.append(acc)
        acc = acc * root
    diffs = [indeterminate - d for d in domain]
    if isinstance(diffs[0], XFieldElement):
        inv = XFieldElement.batch_inversion(diffs)
    else:
        inv = BFieldElement.batch_inversion(diffs)
    numerator = None
    denominator = None
    for c, d, iv in zip(codeword, domain, inv):
        term = d * iv
        numerator = c * term if numerator is None else numerator + c * term
        denominator = term if denominator is None else denominator + term
    return numerator / denominator
