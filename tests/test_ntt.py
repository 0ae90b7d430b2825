"""NTT tests: the reference's golden vectors (ntt.rs:424-445, :512-560),
NTT == evaluation at root powers (ntt.rs:563-579), roundtrips, batching, and
extension-field transforms."""

import numpy as np
import pytest

from twenty_first_tpu.math import gf, ntt
from twenty_first_tpu.math import gf_numpy as gfn
from twenty_first_tpu.math.b_field_element import BFieldElement, bfe, P, PRIMITIVE_ROOTS
from twenty_first_tpu.math.x_field_element import XFieldElement

RNG = np.random.default_rng(42)


def test_size_4_golden_vector():
    out = ntt.ntt_values(np.array([1, 4, 0, 0], dtype=np.uint64))
    np.testing.assert_array_equal(
        out,
        np.array(
            [5, 1125899906842625, 18446744069414584318, 18445618169507741698],
            dtype=np.uint64,
        ),
    )
    back = ntt.intt_values(out)
    np.testing.assert_array_equal(back, np.array([1, 4, 0, 0], dtype=np.uint64))


def test_size_4_max_value():
    x = np.array([P - 1, 0, 0, 0], dtype=np.uint64)
    out = ntt.ntt_values(x)
    np.testing.assert_array_equal(out, np.full(4, P - 1, dtype=np.uint64))


def test_size_32_golden_vector():
    x = np.zeros(32, dtype=np.uint64)
    x[0::8] = 1
    x[1::8] = 4
    out = ntt.ntt_values(x)
    expected = np.zeros(32, dtype=np.uint64)
    expected[0::4] = np.array(
        [
            20,
            18446744069146148869,
            4503599627370500,
            18446726477228544005,
            18446744069414584309,
            268435460,
            18442240469787213829,
            17592186040324,
        ],
        dtype=np.uint64,
    )
    np.testing.assert_array_equal(out, expected)
    np.testing.assert_array_equal(ntt.intt_values(out), x)


@pytest.mark.parametrize("log_n", [0, 1, 2, 5, 8, 12])
def test_roundtrip(log_n):
    n = 1 << log_n
    x = RNG.integers(0, P, size=n, dtype=np.uint64)
    np.testing.assert_array_equal(ntt.intt_values(ntt.ntt_values(x)), x)


def test_ntt_equals_evaluation():
    for log_n in [1, 2, 3, 6]:
        n = 1 << log_n
        coeffs = RNG.integers(0, P, size=n, dtype=np.uint64)
        out = ntt.ntt_values(coeffs)
        omega = PRIMITIVE_ROOTS[n]
        for i in range(n):
            point = pow(omega, i, P)
            horner = 0
            for c in reversed(coeffs.tolist()):
                horner = (horner * point + int(c)) % P
            assert int(out[i]) == horner, (log_n, i)


def test_batched_matches_loop():
    n, b = 64, 7
    x = RNG.integers(0, P, size=(b, n), dtype=np.uint64)
    batched = ntt.ntt_values(x)
    for i in range(b):
        np.testing.assert_array_equal(batched[i], ntt.ntt_values(x[i]))


def test_xfield_ntt_via_planes():
    # extension-field NTT == base-field NTT applied per coefficient plane
    n = 16
    coeffs = [
        XFieldElement((int(a), int(b), int(c)))
        for a, b, c in RNG.integers(0, P, size=(n, 3), dtype=np.uint64)
    ]
    out = ntt.ntt(coeffs)
    back = ntt.intt(out)
    assert back == coeffs
    # cross-check plane i against scalar evaluation with lifted omega
    omega = XFieldElement.new_const(bfe(PRIMITIVE_ROOTS[n]))
    for i in [0, 3, n - 1]:
        point = omega.mod_pow(i)
        acc = XFieldElement.zero()
        for c in reversed(coeffs):
            acc = acc * point + c
        assert out[i] == acc


def test_scalar_object_api():
    elements = [bfe(v) for v in [1, 4, 0, 0]]
    out = ntt.ntt(elements)
    assert [e.value() for e in out] == [
        5,
        1125899906842625,
        18446744069414584318,
        18445618169507741698,
    ]
    assert ntt.intt(out) == elements
    assert ntt.ntt([]) == []
    single = [bfe(99)]
    assert ntt.ntt(single) == single


def test_bad_lengths_rejected():
    with pytest.raises(ntt.NttDomainError):
        ntt.ntt_values(np.zeros(3, dtype=np.uint64))


@pytest.mark.parametrize("log_n", [12, 15])
@pytest.mark.parametrize("inverse", [False, True])
def test_three_step_matches_oracle(log_n, inverse):
    """Three-factor (Bailey) decomposition == radix-2 host oracle, fwd+inv,
    including a leading batch dim (the xfe plane layout)."""
    rng = np.random.default_rng(7)
    vals = rng.integers(0, P, size=(3, 1 << log_n), dtype=np.uint64)
    want = ntt.ntt_host(vals, inverse=inverse)
    t1, diag, _ = ntt._three_step_tables_device(log_n, inverse)
    got = gf.from_limbs(ntt._jitted_three_step(log_n, inverse)(
        *gf.to_limbs(vals), t1[0], t1[1], diag[0], diag[1]))
    assert np.array_equal(want, got)


@pytest.mark.parametrize("log_n", [4, 10, 14])
def test_native_cpp_ntt_is_third_oracle(log_n):
    """The C++ scalar NTT (native/twenty_first_native.cpp gl_ntt) agrees
    with the vectorized-numpy host oracle — an independent third
    implementation cross-check (device / numpy / C++)."""
    from twenty_first_tpu import native
    from twenty_first_tpu.math.b_field_element import PRIMITIVE_ROOTS

    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(11)
    n = 1 << log_n
    vals = rng.integers(0, P, size=n, dtype=np.uint64)
    root = PRIMITIVE_ROOTS[n]
    want = ntt.ntt_host(vals)
    got = native.ntt_inplace(vals, root)
    assert np.array_equal(want, got)
    root_inv = pow(root, P - 2, P)
    want_i = ntt.ntt_host(vals, inverse=True)
    got_i = native.intt_inplace(vals, root_inv)
    assert np.array_equal(want_i, got_i)
