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


def _python_permute(row) -> list[int]:
    """Independent pure-Python oracle (Tip5.permutation itself dispatches
    to the native core, which must not be its own oracle)."""
    from twenty_first_tpu.tip5.tip5 import _round_values

    vals = [int(v) for v in row]
    for r in range(5):
        vals = _round_values(vals, r)
    return vals


def test_native_tip5_matches_python():
    # 9 states: one full 8-lane SoA block + one scalar-tail state
    states = RNG.integers(0, P, size=(9, 16), dtype=np.uint64)
    got = native.tip5_permute_batch(states)
    for row in range(9):
        assert _python_permute(states[row]) == got[row].tolist()


def test_native_hash_pairs_and_merkle_root():
    n = 20  # 10 pairs: blocks + tail
    nodes = RNG.integers(0, P, size=(2 * n, 5), dtype=np.uint64)
    got = native.tip5_hash_pairs(nodes)
    for i in range(n):
        state = list(nodes[2 * i]) + list(nodes[2 * i + 1]) + [1] * 6
        want = _python_permute(state)[:5]
        assert got[i].tolist() == want
    leafs = RNG.integers(0, P, size=(16, 5), dtype=np.uint64)
    root = native.tip5_merkle_root(leafs)
    layer = leafs
    while layer.shape[0] > 1:
        nxt = np.empty((layer.shape[0] // 2, 5), dtype=np.uint64)
        for i in range(nxt.shape[0]):
            st = list(layer[2 * i]) + list(layer[2 * i + 1]) + [1] * 6
            nxt[i] = _python_permute(st)[:5]
        layer = nxt
    np.testing.assert_array_equal(root, layer[0])


def test_native_hash_varlen_matches_sponge():
    for n in (0, 1, 9, 10, 11, 25, 163):
        vals = RNG.integers(0, P, size=n, dtype=np.uint64)
        got = native.tip5_hash_varlen(vals)
        # independent oracle: explicit overwrite-mode sponge on python ints
        state = [0] * 16
        padded = [int(v) for v in vals] + [1]
        padded += [0] * ((-len(padded)) % 10)
        for c in range(0, len(padded), 10):
            state[:10] = padded[c: c + 10]
            state = _python_permute(state)
        assert got.tolist() == state[:5]


def test_native_horner_points():
    for k, m in ((1, 3), (17, 40), (300, 70)):
        coeffs = RNG.integers(0, P, size=k, dtype=np.uint64)
        pts = RNG.integers(0, P, size=m, dtype=np.uint64)
        got = native.horner_points(coeffs, pts)
        for i in range(m):
            acc = 0
            for c in reversed(coeffs.tolist()):
                acc = (acc * int(pts[i]) + int(c)) % P
            assert int(got[i]) == acc


def test_native_reduce_by_ntt_modulus_matches_python_loop():
    from twenty_first_tpu.math.polynomial import Polynomial

    rng = np.random.default_rng(5)
    poly = Polynomial.from_array(rng.integers(0, P, size=3000,
                                              dtype=np.uint64))
    modulus = Polynomial.from_array(rng.integers(0, P, size=65,
                                                 dtype=np.uint64))
    shift_ntt, tail = modulus.shift_factor_ntt_with_tail_length()
    native_out = poly.reduce_by_ntt_friendly_modulus(shift_ntt, tail)
    # long-division oracle: reconstruct the monic structured multiple
    # (the shift table stores its low n coefficients; leading X^n == 1)
    n = shift_ntt.shape[0]
    full = np.zeros(n + 1, dtype=np.uint64)
    full[:n] = ntt_mod.ntt_host(shift_ntt, inverse=True)
    full[n] = 1
    _, want = poly.naive_divide(Polynomial.from_array(full))
    got = native_out.to_array()
    want_arr = want.to_array()
    assert np.array_equal(got[: want_arr.shape[0]], want_arr)
    assert not got[want_arr.shape[0]:].any()


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


def test_native_array_ops_match_numpy_forms_on_full_u64_range():
    """gl_{mul,add,sub}_arrays == the numpy limb forms on ALL u64 inputs
    (incl. non-canonical >= p), so the size-gated dispatch in gf_numpy
    can never change values."""
    import numpy as np

    from twenty_first_tpu import native
    from twenty_first_tpu.math import gf_numpy as gfn

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    lib = native._load()
    rng = np.random.default_rng(0xF00D)
    n = 1 << 13
    # full-range u64 including values in [p, 2^64)
    a = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    edge = np.array([0, 1, gfn.P - 1, gfn.P, np.uint64(2**64 - 1)],
                    dtype=np.uint64)
    a[:5], b[:5] = edge, edge[::-1].copy()
    import os
    os.environ["TWENTY_FIRST_TPU_NATIVE_HOST"] = "0"
    gfn._NATIVE = None  # reset dispatch cache
    try:
        want_mul = gfn.mul(a, b)
        want_add = gfn.add(a, b)
        want_sub = gfn.sub(a, b)
    finally:
        del os.environ["TWENTY_FIRST_TPU_NATIVE_HOST"]
        gfn._NATIVE = None
    for name, want in (("gl_mul_arrays", want_mul),
                       ("gl_add_arrays", want_add),
                       ("gl_sub_arrays", want_sub)):
        out = np.empty_like(a)
        getattr(lib, name)(native._u64p(a), native._u64p(b),
                           native._u64p(out), n)
        assert np.array_equal(out, want), name
