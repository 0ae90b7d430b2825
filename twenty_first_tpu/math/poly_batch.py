"""Batch-first polynomial ops on device (limb planes).

The scalar `Polynomial` class (math/polynomial.py) mirrors the reference's
object API; this module is the TPU-native throughput path operating on
whole batches of polynomials as uint64/limb arrays — the layer a STARK
prover actually drives (SURVEY §7: "batch-first APIs"):

  * batch_ntt / batch_intt            (rows, n) transforms
  * batch_coset_evaluate / interpolate  low-degree extension on a coset
  * batch_multiply                    pointwise-NTT products
  * batch_evaluate_barycentric        codeword-form evaluation at a point
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import gf
from . import gf_numpy as gfn
from . import ntt as ntt_mod
from .b_field_element import GENERATOR, P, PRIMITIVE_ROOTS


def _pow_row(base: int, n: int):
    return gfn.powers(base, n)


def batch_ntt(values: np.ndarray, inverse: bool = False) -> np.ndarray:
    """(rows, n) uint64 -> row-wise (i)NTT."""
    return ntt_mod.ntt_values(values, inverse=inverse)


def batch_intt(values: np.ndarray) -> np.ndarray:
    return ntt_mod.ntt_values(values, inverse=True)


def batch_coset_evaluate(coefficients: np.ndarray, order: int,
                         offset: int = GENERATOR) -> np.ndarray:
    """Row-wise low-degree extension: evaluate each row's polynomial on the
    coset offset * <omega_order>. coefficients: (rows, k) with k <= order."""
    coefficients = np.asarray(coefficients, dtype=np.uint64)
    rows, k = coefficients.shape
    assert k <= order and order & (order - 1) == 0
    scaled = gfn.mul(coefficients, _pow_row(offset, k)[None, :])
    padded = np.zeros((rows, order), dtype=np.uint64)
    padded[:, :k] = scaled
    return ntt_mod.ntt_values(padded)


def batch_coset_interpolate(codewords: np.ndarray,
                            offset: int = GENERATOR) -> np.ndarray:
    """Inverse of batch_coset_evaluate: (rows, order) -> coefficients."""
    codewords = np.asarray(codewords, dtype=np.uint64)
    order = codewords.shape[-1]
    coeffs = ntt_mod.ntt_values(codewords, inverse=True)
    offset_inv = pow(int(offset), P - 2, P)
    return gfn.mul(coeffs, _pow_row(offset_inv, order)[None, :])


def batch_multiply(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise polynomial products via NTT.

    a: (rows, da+1), b: (rows, db+1) -> (rows, da+db+1)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    rows = a.shape[0]
    assert b.shape[0] == rows
    out_len = a.shape[1] + b.shape[1] - 1
    n = 1 << (out_len - 1).bit_length()
    pa = np.zeros((rows, n), dtype=np.uint64)
    pb = np.zeros((rows, n), dtype=np.uint64)
    pa[:, : a.shape[1]] = a
    pb[:, : b.shape[1]] = b
    fa = gf.to_limbs(ntt_mod.ntt_values(pa))
    fb = gf.to_limbs(ntt_mod.ntt_values(pb))
    prod = gf.from_limbs(gf.mul(fa, fb))
    return ntt_mod.ntt_values(prod, inverse=True)[:, :out_len]


def batch_evaluate_barycentric(codewords: np.ndarray, point: int) -> np.ndarray:
    """Evaluate each row's interpolant (over <omega_n>) at `point` using the
    barycentric formula (polynomial.rs:2587-2638), fully on device.

    Requires `point` outside the domain. codewords: (rows, n) -> (rows,)."""
    codewords = np.asarray(codewords, dtype=np.uint64)
    rows, n = codewords.shape
    domain = _pow_row(PRIMITIVE_ROOTS[n], n)
    z = np.full(n, point % P, dtype=np.uint64)
    diffs = gf.to_limbs(gfn.sub(z, domain))
    inv = gf.batch_inversion(diffs)
    weights = gf.mul(gf.to_limbs(domain), inv)  # d_i / (z - d_i)
    cw = gf.to_limbs(codewords)
    wl = jnp.broadcast_to(weights[0], cw[0].shape)
    wh = jnp.broadcast_to(weights[1], cw[1].shape)
    terms = gf.mul(cw, (wl, wh))
    # sum rows in the field: fold via prefix (log-depth) addition
    num = _row_field_sum(terms)
    den_all = _row_field_sum((weights[0][None, :], weights[1][None, :]))
    den_inv = gf.inverse_or_zero(den_all)
    out = gf.mul(num, (jnp.broadcast_to(den_inv[0], num[0].shape),
                       jnp.broadcast_to(den_inv[1], num[1].shape)))
    return gf.from_limbs(out)


def _row_field_sum(x):
    """Field sum along the last (power-of-two) axis via log-depth halving."""
    lo, hi = x
    n = lo.shape[-1]
    assert n & (n - 1) == 0 and n > 0
    while n > 1:
        half = n // 2
        lo, hi = gf.add(
            (lo[..., :half], hi[..., :half]),
            (lo[..., half:], hi[..., half:]),
        )
        n = half
    return lo[..., 0], hi[..., 0]
