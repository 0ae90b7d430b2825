"""Device + host-numpy extension-field arithmetic vs the scalar oracle."""

import numpy as np
import pytest

from twenty_first_tpu.math import gf_ext, xgf_numpy
from twenty_first_tpu.math.x_field_element import XFieldElement

P = (1 << 64) - (1 << 32) + 1
rng = np.random.default_rng(7)


def _rand_xfe_array(shape):
    return rng.integers(0, P, size=shape + (3,), dtype=np.uint64)


def _scalar(arr):
    return XFieldElement(tuple(int(c) for c in arr))


def _expect_mul(a, b):
    out = np.empty_like(a)
    flat_a = a.reshape(-1, 3)
    flat_b = b.reshape(-1, 3)
    flat_o = out.reshape(-1, 3)
    for i in range(flat_a.shape[0]):
        r = _scalar(flat_a[i]) * _scalar(flat_b[i])
        flat_o[i] = [c.value() for c in r.coefficients]
    return out


class TestHostNumpy:
    def test_mul_matches_scalar(self):
        a = _rand_xfe_array((17,))
        b = _rand_xfe_array((17,))
        np.testing.assert_array_equal(xgf_numpy.mul(a, b), _expect_mul(a, b))

    def test_mul_2d(self):
        a = _rand_xfe_array((4, 5))
        b = _rand_xfe_array((4, 5))
        np.testing.assert_array_equal(xgf_numpy.mul(a, b), _expect_mul(a, b))

    def test_inverse_matches_scalar(self):
        a = _rand_xfe_array((9,))
        inv = xgf_numpy.inverse(a)
        for i in range(9):
            expect = _scalar(a[i]).inverse()
            assert [int(c) for c in inv[i]] == \
                [c.value() for c in expect.coefficients]

    def test_inverse_of_zero_is_zero(self):
        z = np.zeros((1, 3), dtype=np.uint64)
        np.testing.assert_array_equal(xgf_numpy.inverse(z), z)

    def test_mul_base_and_lift(self):
        a = _rand_xfe_array((8,))
        s = rng.integers(0, P, size=(8,), dtype=np.uint64)
        got = xgf_numpy.mul_base(a, s)
        expect = xgf_numpy.mul(a, xgf_numpy.lift(s))
        np.testing.assert_array_equal(got, expect)


class TestDevice:
    def test_roundtrip(self):
        a = _rand_xfe_array((6,))
        np.testing.assert_array_equal(gf_ext.from_limbs(gf_ext.to_limbs(a)), a)

    def test_mul_matches_scalar(self):
        a = _rand_xfe_array((33,))
        b = _rand_xfe_array((33,))
        got = gf_ext.from_limbs(gf_ext.mul(gf_ext.to_limbs(a),
                                           gf_ext.to_limbs(b)))
        np.testing.assert_array_equal(got, _expect_mul(a, b))

    def test_inverse_or_zero(self):
        a = _rand_xfe_array((5,))
        a[2] = 0
        got = gf_ext.from_limbs(gf_ext.inverse_or_zero(gf_ext.to_limbs(a)))
        np.testing.assert_array_equal(got, xgf_numpy.inverse(a))

    def test_batch_inversion(self):
        a = _rand_xfe_array((16,))
        got = gf_ext.from_limbs(gf_ext.batch_inversion(gf_ext.to_limbs(a)))
        np.testing.assert_array_equal(got, xgf_numpy.inverse(a))

    def test_mul_base(self):
        a = _rand_xfe_array((8,))
        s = rng.integers(0, P, size=(8,), dtype=np.uint64)
        from twenty_first_tpu.math import gf

        got = gf_ext.from_limbs(
            gf_ext.mul_base(gf_ext.to_limbs(a), gf.to_limbs(s)))
        np.testing.assert_array_equal(got, xgf_numpy.mul_base(a, s))

    def test_xfe_ntt_pointwise_product_path(self):
        """xfe NTT-domain pointwise products: (B, 3, n) all on device."""
        from twenty_first_tpu.math import ntt as ntt_mod

        n = 16
        a = _rand_xfe_array((n,))
        b = _rand_xfe_array((n,))
        # host oracle through scalar ntt objects
        from twenty_first_tpu.math.ntt import ntt as ntt_obj

        fa = ntt_obj([_scalar(r) for r in a])
        fb = ntt_obj([_scalar(r) for r in b])
        expect = np.array(
            [[c.value() for c in (x * y).coefficients] for x, y in zip(fa, fb)],
            dtype=np.uint64,
        )
        la = ntt_mod.ntt_limbs(gf_ext.to_limbs(a))
        lb = ntt_mod.ntt_limbs(gf_ext.to_limbs(b))
        got = gf_ext.from_limbs(gf_ext.mul(la, lb))
        np.testing.assert_array_equal(got, expect)


class TestVectorizedBaseInverse:
    def test_gfn_inverse_chain(self):
        from twenty_first_tpu.math import gf_numpy as gfn

        vals = rng.integers(0, P, size=64, dtype=np.uint64)
        vals[0] = 0
        vals[1] = 1
        inv = gfn.inverse(vals)
        assert int(inv[0]) == 0
        for v, i in zip(vals[1:], inv[1:]):
            assert (int(v) * int(i)) % P == 1
