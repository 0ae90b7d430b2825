"""ctypes bridge to the native host core (native/twenty_first_native.cpp).

The shared library is built on demand with `make -C native` (g++); if the
toolchain or library is unavailable everything falls back to the pure-Python
implementations transparently. `available()` reports the active state.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtwenty_first_native.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("TWENTY_FIRST_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    u64p = ctypes.POINTER(ctypes.c_uint64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.gl_mul_arrays.argtypes = [u64p, u64p, u64p, ctypes.c_size_t]
    lib.gl_add_arrays.argtypes = [u64p, u64p, u64p, ctypes.c_size_t]
    lib.gl_sub_arrays.argtypes = [u64p, u64p, u64p, ctypes.c_size_t]
    lib.gl_batch_inverse.argtypes = [u64p, u64p, ctypes.c_size_t]
    lib.gl_mul_scalar.argtypes = [ctypes.c_uint64, ctypes.c_uint64]
    lib.gl_mul_scalar.restype = ctypes.c_uint64
    lib.gl_inv_scalar.argtypes = [ctypes.c_uint64]
    lib.gl_inv_scalar.restype = ctypes.c_uint64
    lib.gl_pow_scalar.argtypes = [ctypes.c_uint64, ctypes.c_uint64]
    lib.gl_pow_scalar.restype = ctypes.c_uint64
    lib.tip5_init.argtypes = [u8p, u64p, u64p]
    lib.tip5_permute_batch.argtypes = [u64p, ctypes.c_size_t]
    lib.gl_ntt.argtypes = [u64p, ctypes.c_size_t, ctypes.c_uint64]
    lib.gl_intt.argtypes = [u64p, ctypes.c_size_t, ctypes.c_uint64]
    lib.gl_ntt_rows.argtypes = [u64p, ctypes.c_size_t, ctypes.c_size_t,
                                u64p, ctypes.c_uint64]
    lib.gl_poly_divmod.argtypes = [u64p, ctypes.c_size_t, u64p,
                                   ctypes.c_size_t, u64p, u64p]

    # one-time Tip5 constant upload
    from .tip5.constants import (
        LOOKUP_TABLE,
        MDS_MATRIX_FIRST_COLUMN,
        ROUND_CONSTANTS,
    )

    lut = np.ascontiguousarray(LOOKUP_TABLE.astype(np.uint8))
    rc = np.ascontiguousarray(ROUND_CONSTANTS)
    col = np.ascontiguousarray(MDS_MATRIX_FIRST_COLUMN.astype(np.uint64))
    lib.tip5_init(
        lut.ctypes.data_as(u8p),
        rc.ctypes.data_as(u64p),
        col.ctypes.data_as(u64p),
    )
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _u64p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def tip5_permute_batch(states: np.ndarray) -> np.ndarray:
    """(..., 16) uint64 canonical states -> permuted, via native code."""
    lib = _load()
    assert lib is not None
    out = np.ascontiguousarray(states, dtype=np.uint64).copy()
    batch = out.size // 16
    lib.tip5_permute_batch(_u64p(out), batch)
    return out


def ntt_inplace(x: np.ndarray, root: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    out = np.ascontiguousarray(x, dtype=np.uint64).copy()
    lib.gl_ntt(_u64p(out), out.size, ctypes.c_uint64(root))
    return out


def intt_inplace(x: np.ndarray, root_inv: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    out = np.ascontiguousarray(x, dtype=np.uint64).copy()
    lib.gl_intt(_u64p(out), out.size, ctypes.c_uint64(root_inv))
    return out


def ntt_rows_inplace(x: np.ndarray, stage_tw: np.ndarray,
                     n_inv: int = 0) -> None:
    """Row-batched in-place NTT of a C-contiguous (rows, n) uint64 array,
    with caller-precomputed concatenated stage twiddles (length n-1)."""
    lib = _load()
    assert lib is not None
    rows, n = x.shape
    lib.gl_ntt_rows(_u64p(x), rows, n, _u64p(stage_tw),
                    ctypes.c_uint64(n_inv))


def batch_inverse(x: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    xc = np.ascontiguousarray(x, dtype=np.uint64)
    out = np.empty_like(xc)
    lib.gl_batch_inverse(_u64p(xc), _u64p(out), xc.size)
    return out


def poly_divmod(num: np.ndarray, den: np.ndarray):
    """Long division on coefficient arrays (degree = len-1, no trailing
    zeros in den). Returns (quotient, remainder) arrays."""
    lib = _load()
    assert lib is not None
    num = np.ascontiguousarray(num, dtype=np.uint64)
    den = np.ascontiguousarray(den, dtype=np.uint64)
    dn, dd = num.size - 1, den.size - 1
    assert dd >= 0 and den[dd] != 0
    if dn < dd:
        return np.zeros(1, dtype=np.uint64), num.copy()
    quot = np.empty(dn - dd + 1, dtype=np.uint64)
    rem = np.empty(max(dd, 1), dtype=np.uint64)
    lib.gl_poly_divmod(_u64p(num), dn, _u64p(den), dd, _u64p(quot),
                       _u64p(rem))
    return quot, rem[:dd]
