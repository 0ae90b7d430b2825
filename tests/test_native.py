"""Native C++ host core vs the Python/device oracles."""

import numpy as np
import pytest

from twenty_first_tpu import native
from twenty_first_tpu.math import gf_numpy as gfn
from twenty_first_tpu.math import ntt as ntt_mod
from twenty_first_tpu.math.b_field_element import P, PRIMITIVE_ROOTS, bfe
from twenty_first_tpu.tip5.tip5 import Tip5

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

RNG = np.random.default_rng(11)


def test_native_field_ops():
    lib = native._load()
    a = int(RNG.integers(0, P, dtype=np.uint64))
    b = int(RNG.integers(0, P, dtype=np.uint64))
    assert lib.gl_mul_scalar(a, b) == (a * b) % P
    assert lib.gl_inv_scalar(a) == pow(a, P - 2, P)
    assert lib.gl_pow_scalar(a, 12345) == pow(a, 12345, P)


def test_native_batch_inverse():
    x = RNG.integers(1, P, 1000, dtype=np.uint64)
    inv = native.batch_inverse(x)
    np.testing.assert_array_equal(gfn.mul(x, inv),
                                  np.ones_like(x))


def test_native_tip5_matches_python():
    states = RNG.integers(0, P, size=(9, 16), dtype=np.uint64)
    got = native.tip5_permute_batch(states)
    for row in range(9):
        sponge = Tip5.init()
        sponge.state = [bfe(int(v)) for v in states[row]]
        sponge.permutation()
        assert [e.value() for e in sponge.state] == got[row].tolist()


def test_native_ntt_matches_device():
    for log_n in [2, 5, 10]:
        n = 1 << log_n
        x = RNG.integers(0, P, n, dtype=np.uint64)
        root = PRIMITIVE_ROOTS[n]
        got = native.ntt_inplace(x, root)
        want = ntt_mod.ntt_values(x)
        np.testing.assert_array_equal(got, want)
        back = native.intt_inplace(got, pow(root, P - 2, P))
        np.testing.assert_array_equal(back, x)


def test_native_poly_divmod():
    from twenty_first_tpu.math.polynomial import Polynomial

    num = RNG.integers(0, P, 50, dtype=np.uint64)
    den = RNG.integers(0, P, 8, dtype=np.uint64)
    den[-1] |= np.uint64(1)
    q, r = native.poly_divmod(num, den)
    pn = Polynomial([bfe(int(v)) for v in num])
    pd = Polynomial([bfe(int(v)) for v in den])
    pq, pr = pn.divide(pd)
    assert [c.value() for c in pq.coefficients] == q.tolist()
    want_r = [c.value() for c in pr.coefficients] + [0] * (
        len(r) - pr.degree() - 1
    )
    assert r.tolist() == want_r
