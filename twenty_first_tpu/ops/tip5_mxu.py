"""Tip5 permutation with the MDS layer on the MXU (systolic array).

The VPU-only permutation is op-bound: the circulant MDS is ~45% of its
integer ops. Here the state batch lives lane-dense ((rows, 128) planes,
8 states interleaved per row, lane = word*8 + substate) and the MDS becomes
16 exact bf16 matmuls against 128x128 constant matrices:

  * each state word splits into 8 byte planes (values < 256, exact in bf16);
  * the MDS column splits into 2 byte matrices, expanded to 128x128 as
    C[w', w] * delta_{s s'} (blockwise interleave of the circulant);
  * byte x byte products accumulate over 16 taps in f32 — max 16 * 255^2
    < 2^20, exactly representable, so the integer matmul is EXACT;
  * the 16 partial-sum planes regroup by byte shift and feed the standard
    128-bit Goldilocks reduction.

S-box and round constants stay on the VPU (full-width, masked select).
This runs as plain jnp (XLA fuses the VPU parts and schedules the matmuls
on the MXU); bit-exactness is pinned against the scalar oracle.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from ..math import gf
from ..tip5.constants import (
    MDS_MATRIX_FIRST_COLUMN,
    NUM_ROUNDS,
    ROUND_CONSTANTS,
    STATE_SIZE,
)

_U32 = jnp.uint32
_MASK8 = np.uint32(0xFF)

_RC = ROUND_CONSTANTS.reshape(NUM_ROUNDS, STATE_SIZE)
_RC_LO128 = np.ascontiguousarray(
    (_RC & np.uint64(0xFFFF_FFFF)).astype(np.uint32)[:, :, None]
    .repeat(8, axis=2).reshape(NUM_ROUNDS, 128)
)
_RC_HI128 = np.ascontiguousarray(
    (_RC >> np.uint64(32)).astype(np.uint32)[:, :, None]
    .repeat(8, axis=2).reshape(NUM_ROUNDS, 128)
)


def _mds_byte_matrices() -> tuple[np.ndarray, np.ndarray]:
    """128x128 bf16 matrices for the low/high bytes of the MDS circulant.

    M[w*8 + s, w'*8 + s'] = byte(C[w', w]) * (s == s')."""
    col = MDS_MATRIX_FIRST_COLUMN.astype(np.uint32)
    c = np.zeros((16, 16), dtype=np.uint32)
    for i in range(16):
        for j in range(16):
            c[j, i] = col[(i - j) % 16]  # input word j -> output word i
    out = []
    for byte_mat in (c & 0xFF, c >> 8):
        m = np.zeros((128, 128), dtype=np.float32)
        for j in range(16):
            for i in range(16):
                for s in range(8):
                    m[j * 8 + s, i * 8 + s] = byte_mat[j, i]
        out.append(m.astype(jnp.bfloat16))
    return out[0], out[1]


_M_LO, _M_HI = _mds_byte_matrices()


def _fermat(b):
    t = b + np.uint32(1)
    t2 = (t * t) % np.uint32(257)
    t3 = (t2 * t) % np.uint32(257)
    return t3 - np.uint32(1)


def _sbox_dense(lo, hi, word_lt4):
    mlo, mhi = gf.to_montgomery((lo, hi))
    olo = jnp.zeros_like(mlo)
    ohi = jnp.zeros_like(mhi)
    for i in range(4):
        sh = np.uint32(8 * i)
        olo = olo | (_fermat((mlo >> sh) & _MASK8) << sh)
        ohi = ohi | (_fermat((mhi >> sh) & _MASK8) << sh)
    llo, lhi = gf.from_montgomery((olo, ohi))
    sq = gf.square((lo, hi))
    qu = gf.square(sq)
    p7 = gf.mul(gf.mul(qu, sq), (lo, hi))
    return (jnp.where(word_lt4, llo, p7[0]),
            jnp.where(word_lt4, lhi, p7[1]))


def _mds_mxu(lo, hi):
    # 8 byte planes per element (4 from each limb), as bf16
    planes = []
    for limb in (lo, hi):
        for i in range(4):
            planes.append(((limb >> np.uint32(8 * i)) & _MASK8)
                          .astype(jnp.bfloat16))
    # 16 exact matmuls; group results by byte shift s = k + e
    groups = [None] * 10  # s in 0..8 (k in 0..7, e in 0..1)
    for k in range(8):
        for e, mat in enumerate((_M_LO, _M_HI)):
            prod = jnp.dot(planes[k], mat,
                           preferred_element_type=jnp.float32)
            s = k + e
            g = prod.astype(_U32)
            groups[s] = g if groups[s] is None else groups[s] + g
    # value = sum_s groups[s] * 2^(8s); fold byte pairs into 16-bit groups
    h = []
    for t in range(4):
        a = groups[2 * t]
        b = groups[2 * t + 1]
        h.append(a + (b << 8))  # < 2^20 + 2^28 < 2^29
    h.append(groups[8])  # s == 8
    h0, h1, h2, h3, h4 = h
    x0 = h0 + (h1 << 16)
    c0 = (x0 < h0).astype(_U32)
    t1 = h2 + (h1 >> 16) + c0
    x1 = t1 + (h3 << 16)
    c1 = (x1 < t1).astype(_U32)
    x2 = h4 + (h3 >> 16) + c1
    return gf.reduce128(x0, x1, x2, jnp.zeros_like(x2))


def _interleave(x):
    b = x.shape[0]
    return jnp.transpose(x.reshape(b // 8, 8, 16), (0, 2, 1)).reshape(
        b // 8, 128
    )


def _deinterleave(x):
    rows = x.shape[0]
    return jnp.transpose(x.reshape(rows, 16, 8), (0, 2, 1)).reshape(
        rows * 8, 16
    )


def permutation_dense(state):
    """Fused permutation on lane-dense (rows, 128) limb planes."""
    lo, hi = state
    lane = jax.lax.broadcasted_iota(_U32, lo.shape, dimension=1)
    word_lt4 = (lane >> 3) < 4
    for r in range(NUM_ROUNDS):
        lo, hi = _sbox_dense(lo, hi, word_lt4)
        lo, hi = _mds_mxu(lo, hi)
        lo, hi = gf.add((lo, hi), (_RC_LO128[r], _RC_HI128[r]))
    return lo, hi


@jax.jit
def permutation(lo, hi):
    """MXU-MDS permutation of (B, 16) limb planes (B % 8 == 0)."""
    out = permutation_dense((_interleave(lo), _interleave(hi)))
    return _deinterleave(out[0]), _deinterleave(out[1])


def permutation_values(states: np.ndarray) -> np.ndarray:
    states = np.asarray(states, dtype=np.uint64)
    lo, hi = gf.to_limbs(states)
    return gf.from_limbs(permutation(lo, hi))
