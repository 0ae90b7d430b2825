"""Edge-size and full-u64-range checks for the AVX-512 native core.

The vectorized kernels process 8 lanes per block with a scalar tail loop;
these tests pin the TAIL paths (sizes not divisible by 8, with the
boundary values p-1 / p / 2^64-1 placed IN the tail) and the entry points
no other test drives directly (gl_xfe_mul_arrays, batch_inverse_or_zero,
native lagrange_interpolate).
"""

import os

import numpy as np
import pytest

from twenty_first_tpu import native
from twenty_first_tpu.math import gf_numpy as gfn
from twenty_first_tpu.math import xgf_numpy as xgf
from twenty_first_tpu.math.b_field_element import P

RNG = np.random.default_rng(0xED6E)

if not native.available():
    pytest.skip("native library unavailable", allow_module_level=True)


def _numpy_forms():
    """Run a callable with the native dispatch disabled (pure numpy)."""
    class _Ctx:
        def __enter__(self):
            os.environ["TWENTY_FIRST_TPU_NATIVE_HOST"] = "0"
            gfn._NATIVE = None
            return self

        def __exit__(self, *exc):
            del os.environ["TWENTY_FIRST_TPU_NATIVE_HOST"]
            gfn._NATIVE = None

    return _Ctx()


def _full_range_with_tail_edges(n):
    """Arbitrary u64 values with the boundary cases in the LAST positions
    (the scalar tail of an 8-lane kernel)."""
    x = RNG.integers(0, 1 << 64, n, dtype=np.uint64)
    edges = np.array([0, 1, P - 1, P, (1 << 64) - 1], dtype=np.uint64)
    k = min(n, edges.size)
    x[n - k:] = edges[:k]
    return x


@pytest.mark.parametrize("n", [1, 2, 5, 7, 8, 9, 13, 16, 17, 31])
def test_bfe_array_ops_tail_full_range(n):
    lib = native._load()
    a = _full_range_with_tail_edges(n)
    b = _full_range_with_tail_edges(n)[::-1].copy()
    with _numpy_forms():
        wants = (gfn.mul(a, b), gfn.add(a, b), gfn.sub(a, b))
    for name, want in zip(("gl_mul_arrays", "gl_add_arrays",
                           "gl_sub_arrays"), wants):
        out = np.empty_like(a)
        getattr(lib, name)(native._u64p(a), native._u64p(b),
                           native._u64p(out), n)
        np.testing.assert_array_equal(out, want, err_msg=f"{name} n={n}")


@pytest.mark.parametrize("n", [1, 7, 8, 9, 16, 17])
def test_xfe_mul_arrays_tail_full_range(n):
    lib = native._load()
    a = _full_range_with_tail_edges(3 * n).reshape(n, 3)
    b = _full_range_with_tail_edges(3 * n)[::-1].copy().reshape(n, 3)
    with _numpy_forms():
        want = xgf.mul(a, b)
    out = np.empty_like(a)
    lib.gl_xfe_mul_arrays(native._u64p(a), native._u64p(b),
                          native._u64p(out), n)
    np.testing.assert_array_equal(out, want)


@pytest.mark.parametrize("n", [1, 2, 7, 9, 17, 100])
def test_batch_inverse_or_zero_with_zero_tail(n):
    x = RNG.integers(1, P, n, dtype=np.uint64)
    # zeros sprinkled inside AND at the tail positions
    x[:: max(n // 3, 1)] = 0
    x[-1] = 0
    got = native.batch_inverse_or_zero(x)
    want = np.array([pow(int(v), P - 2, P) if v else 0 for v in x],
                    dtype=np.uint64)
    np.testing.assert_array_equal(got, want)
    nz = RNG.integers(1, P, n, dtype=np.uint64)
    np.testing.assert_array_equal(
        gfn.mul(nz, native.batch_inverse(nz)), np.ones_like(nz))


@pytest.mark.parametrize("n", [1, 2, 3, 7, 9, 13])
def test_lagrange_interpolate_odd_sizes(n):
    # distinct domain points
    dom = RNG.permutation(np.arange(1, 4 * n + 1, dtype=np.uint64))[:n]
    vals = RNG.integers(0, P, n, dtype=np.uint64)
    coeffs = native.lagrange_interpolate(dom, vals)
    assert coeffs.shape == (n,)
    # unique degree-<n interpolant: evaluating back over the domain
    # must reproduce the values exactly
    back = native.horner_points(coeffs, dom)
    np.testing.assert_array_equal(back, vals)


@pytest.mark.parametrize("rows", [1, 3, 5])
def test_ntt_rows_odd_row_counts(rows):
    from twenty_first_tpu.math import ntt as ntt_mod

    n = 32
    x = RNG.integers(0, P, size=(rows, n), dtype=np.uint64)
    want = np.stack([ntt_mod.ntt_host(r) for r in x])
    got = x.copy()
    tw = ntt_mod._host_stage_tw_flat(5, False)
    native.ntt_rows_inplace(got, tw)
    np.testing.assert_array_equal(got, want)
