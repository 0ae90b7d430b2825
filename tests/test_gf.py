"""Field-arithmetic tests: device limb kernels vs python-int oracle, plus the
reference's fixed vectors (b_field_element.rs:1478-1514) and field axioms."""

import numpy as np
import pytest

from twenty_first_tpu.math import gf
from twenty_first_tpu.math import gf_numpy as gfn
from twenty_first_tpu.math.b_field_element import BFieldElement, bfe, P

RNG = np.random.default_rng(0x715)


def rand_u64(n, below_p=True):
    vals = RNG.integers(0, P if below_p else 1 << 64, size=n, dtype=np.uint64)
    return vals


def rand_edge(n):
    """Random values biased toward the reduction edge cases."""
    specials = np.array(
        [0, 1, 2, 0xFFFFFFFF, 0x100000000, P - 1, P - 2, (1 << 63), P >> 1],
        dtype=np.uint64,
    )
    idx = RNG.integers(0, len(specials), size=n)
    mix = RNG.integers(0, 2, size=n).astype(bool)
    return np.where(mix, specials[idx], rand_u64(n))


@pytest.mark.parametrize("op", ["add", "sub", "mul"])
def test_device_ops_match_python_ints(op):
    n = 4096
    a = rand_edge(n)
    b = rand_edge(n)
    al = gf.to_limbs(a)
    bl = gf.to_limbs(b)
    got = gf.from_limbs(getattr(gf, op)(al, bl))
    pyop = {
        "add": lambda x, y: (int(x) + int(y)) % P,
        "sub": lambda x, y: (int(x) - int(y)) % P,
        "mul": lambda x, y: (int(x) * int(y)) % P,
    }[op]
    want = np.array([pyop(x, y) for x, y in zip(a, b)], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_mul_accepts_noncanonical_inputs():
    # mul is specified for any u64 inputs (used on raw S-box outputs).
    n = 2048
    a = rand_u64(n, below_p=False)
    b = rand_u64(n, below_p=False)
    got = gf.from_limbs(gf.mul(gf.to_limbs(a), gf.to_limbs(b)))
    want = np.array([(int(x) * int(y)) % P for x, y in zip(a, b)], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_numpy_backend_matches_python_ints():
    n = 4096
    a = rand_edge(n)
    b = rand_edge(n)
    np.testing.assert_array_equal(
        gfn.mul(a, b),
        np.array([(int(x) * int(y)) % P for x, y in zip(a, b)], dtype=np.uint64),
    )
    np.testing.assert_array_equal(
        gfn.add(a, b),
        np.array([(int(x) + int(y)) % P for x, y in zip(a, b)], dtype=np.uint64),
    )
    np.testing.assert_array_equal(
        gfn.sub(a, b),
        np.array([(int(x) - int(y)) % P for x, y in zip(a, b)], dtype=np.uint64),
    )


def test_inverse_device():
    n = 1024
    a = rand_u64(n)
    a[a == 0] = 1
    inv = gf.from_limbs(gf.inverse_or_zero(gf.to_limbs(a)))
    prod = gfn.mul(a, inv)
    np.testing.assert_array_equal(prod, np.ones(n, dtype=np.uint64))
    # zero maps to zero
    z = gf.from_limbs(gf.inverse_or_zero(gf.to_limbs(np.zeros(4, dtype=np.uint64))))
    np.testing.assert_array_equal(z, np.zeros(4, dtype=np.uint64))


def test_batch_inversion_device():
    n = 513
    a = rand_u64(n)
    a[a == 0] = 7
    inv = gf.from_limbs(gf.batch_inversion(gf.to_limbs(a)))
    np.testing.assert_array_equal(gfn.mul(a, inv), np.ones(n, dtype=np.uint64))


def test_pow_const():
    a = rand_u64(64)
    for e in [0, 1, 2, 3, 7, 65537]:
        got = gf.from_limbs(gf.pow_const(gf.to_limbs(a), e))
        want = np.array([pow(int(x), e, P) for x in a], dtype=np.uint64)
        np.testing.assert_array_equal(got, want)


def test_powers_host():
    base = 7
    n = 1000
    pw = gfn.powers(base, n)
    want = np.array([pow(base, i, P) for i in range(n)], dtype=np.uint64)
    np.testing.assert_array_equal(pw, want)


# --- reference fixed vectors (b_field_element.rs:1478-1514) ---------------


def test_fixed_mul():
    assert (bfe(2779336007265862836) * bfe(8146517303801474933)).value() \
        == 1857758653037316764
    a = bfe(9223372036854775808)
    assert (a * a).value() == 18446744068340842497


def test_fixed_inverse():
    a = bfe(8561862112314395584)
    assert a.inverse().value() == 17307602810081694772
    # device path agrees
    dev = gf.from_limbs(
        gf.inverse_or_zero(gf.to_limbs(np.array([8561862112314395584], np.uint64)))
    )
    assert int(dev[0]) == 17307602810081694772


def test_fixed_modpow():
    base = bfe(7808276826625786800)
    assert base.mod_pow(16608971246357572739).value() == 2288673415394035783


def test_scalar_field_axioms():
    vals = [bfe(int(v)) for v in rand_u64(32)]
    for a in vals[:8]:
        for b in vals[8:16]:
            assert a + b == b + a
            assert a * b == b * a
            assert (a - b) + b == a
            for c in vals[16:20]:
                assert (a + b) * c == a * c + b * c
        if not a.is_zero():
            assert (a * a.inverse()).value() == 1
        assert (a + (-a)).value() == 0


def test_montgomery_raw_roundtrip():
    # raw view matches the reference's Montgomery representation semantics:
    # raw(1) == R == 2^32 - 1, from_raw inverts raw.
    assert bfe(1).raw_u64() == 0xFFFFFFFF
    for v in rand_u64(16):
        e = bfe(int(v))
        assert BFieldElement.from_raw_u64(e.raw_u64()) == e
        assert BFieldElement.from_raw_bytes(e.raw_bytes()) == e
    # device helpers agree
    a = rand_u64(256)
    m = gf.from_limbs(gf.to_montgomery(gf.to_limbs(a)))
    want = np.array([(int(x) << 64) % P for x in a], dtype=np.uint64)
    np.testing.assert_array_equal(m, want)
    back = gf.from_limbs(gf.from_montgomery(gf.to_limbs(m)))
    np.testing.assert_array_equal(back, a)


def test_generator():
    g = BFieldElement.generator()
    assert g.value() == 7
    # order of 7 is p-1: 7^((p-1)/2) != 1 and 7^((p-1)/q) != 1 for q | p-1
    # p - 1 = 2^32 * 3 * 5 * 17 * 257 * 65537
    for q in [2, 3, 5, 17, 257, 65537]:
        assert g.mod_pow((P - 1) // q).value() != 1
