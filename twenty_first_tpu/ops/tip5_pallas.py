"""Pallas TPU kernel: fused 5-round Tip5 permutation over a batch of states.

One kernel invocation processes a VMEM-resident tile of states through all
five rounds — no HBM round trips between layers, no intermediate
materialization. The arithmetic is the same canonical-residue limb-plane
math as the jnp path (twenty_first_tpu/tip5/permutation.py), restructured
tap-by-tap so every temporary stays at tile shape.

Falls back to interpret mode off-TPU (tests run it on CPU bit-exactly).

STATUS: correct on TPU (validated against the jnp path) but currently
slower than the XLA-fused jnp version: the (tile, 16) block shape leaves
the 16-wide minor dimension on 16 of 128 lanes, and inside Pallas there is
no XLA-style flattening of elementwise chains to recover the width. The
planned fix is a lane-dense layout (8 states interleaved per 128-lane row,
masked S-box select, MDS as an exact bf16 block-diagonal matmul on the MXU)
— tracked for the next optimization round.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..math import gf
from ..tip5.constants import (
    MDS_MATRIX_FIRST_COLUMN,
    NUM_ROUNDS,
    NUM_SPLIT_AND_LOOKUP,
    ROUND_CONSTANTS,
    STATE_SIZE,
)

_MASK16 = np.uint32(0xFFFF)
_MASK8 = np.uint32(0xFF)
_U32 = jnp.uint32

_RC = ROUND_CONSTANTS.reshape(NUM_ROUNDS, STATE_SIZE)
_RC_LO = (_RC & np.uint64(0xFFFF_FFFF)).astype(np.uint32)
_RC_HI = (_RC >> np.uint64(32)).astype(np.uint32)
# Rolled MDS columns: _TAP[j][i] = col[(i - j) mod 16]
_TAPS = [np.roll(MDS_MATRIX_FIRST_COLUMN, j).astype(np.uint32)
         for j in range(16)]


def _fermat(b):
    t = b + np.uint32(1)
    t2 = (t * t) % np.uint32(257)
    t3 = (t2 * t) % np.uint32(257)
    return t3 - np.uint32(1)


def _sbox(lo, hi):
    flo, fhi = lo[:, :NUM_SPLIT_AND_LOOKUP], hi[:, :NUM_SPLIT_AND_LOOKUP]
    mlo, mhi = gf.to_montgomery((flo, fhi))
    olo = jnp.zeros_like(mlo)
    ohi = jnp.zeros_like(mhi)
    for i in range(4):
        sh = np.uint32(8 * i)
        olo = olo | (_fermat((mlo >> sh) & _MASK8) << sh)
        ohi = ohi | (_fermat((mhi >> sh) & _MASK8) << sh)
    flo, fhi = gf.from_montgomery((olo, ohi))
    rlo, rhi = lo[:, NUM_SPLIT_AND_LOOKUP:], hi[:, NUM_SPLIT_AND_LOOKUP:]
    sq = gf.square((rlo, rhi))
    qu = gf.square(sq)
    r7 = gf.mul(gf.mul(qu, sq), (rlo, rhi))
    return (
        jnp.concatenate([flo, r7[0]], axis=1),
        jnp.concatenate([fhi, r7[1]], axis=1),
    )


def _mds(lo, hi, taps):
    digits = (lo & _MASK16, lo >> 16, hi & _MASK16, hi >> 16)
    sums = []
    for d in digits:
        s_lo = jnp.zeros_like(d)
        s_hi = jnp.zeros_like(d)
        for j in range(16):
            prod = taps[j] * d[:, j: j + 1]
            s_lo = s_lo + (prod & _MASK16)
            s_hi = s_hi + (prod >> 16)
        sums.append((s_lo, s_hi))
    g0 = sums[0][0]
    g1 = sums[0][1] + sums[1][0]
    g2 = sums[1][1] + sums[2][0]
    g3 = sums[2][1] + sums[3][0]
    g4 = sums[3][1]
    x0 = g0 + (g1 << 16)
    c0 = (x0 < g0).astype(_U32)
    t = g2 + (g1 >> 16) + c0
    x1 = t + (g3 << 16)
    c1 = (x1 < t).astype(_U32)
    x2 = g4 + (g3 >> 16) + c1
    return gf.reduce128(x0, x1, x2, jnp.zeros_like(x2))


def _permutation_kernel(lo_ref, hi_ref, taps_ref, rc_lo_ref, rc_hi_ref,
                        out_lo_ref, out_hi_ref):
    # Mosaic has no 64-bit ints: force the pure-u32 limb multiply path
    with gf.u32_ops():
        lo = lo_ref[...]
        hi = hi_ref[...]
        taps = taps_ref[...]
        for r in range(NUM_ROUNDS):
            lo, hi = _sbox(lo, hi)
            lo, hi = _mds(lo, hi, taps)
            lo, hi = gf.add((lo, hi), (rc_lo_ref[r], rc_hi_ref[r]))
    out_lo_ref[...] = lo
    out_hi_ref[...] = hi


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def permutation(lo, hi, tile: int = 2048, interpret: bool = False):
    """Fused Tip5 permutation of (B, 16) limb planes; B % tile == 0."""
    b = lo.shape[0]
    assert b % tile == 0, f"batch {b} must be divisible by tile {tile}"
    grid = (b // tile,)
    spec = pl.BlockSpec((tile, STATE_SIZE), lambda i: (i, 0))
    const_spec = pl.BlockSpec((16, 16), lambda i: (0, 0))
    rc_spec = pl.BlockSpec((NUM_ROUNDS, STATE_SIZE), lambda i: (0, 0))
    taps = jnp.asarray(np.stack(_TAPS))
    return pl.pallas_call(
        _permutation_kernel,
        grid=grid,
        in_specs=[spec, spec, const_spec, rc_spec, rc_spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, STATE_SIZE), jnp.uint32),
            jax.ShapeDtypeStruct((b, STATE_SIZE), jnp.uint32),
        ],
        interpret=interpret,
    )(lo, hi, taps, jnp.asarray(_RC_LO), jnp.asarray(_RC_HI))


def permutation_values(states: np.ndarray, tile: int = 2048,
                       interpret: bool = False) -> np.ndarray:
    """Host-convenience: uint64 (B, 16) -> permuted, via the Pallas kernel."""
    states = np.asarray(states, dtype=np.uint64)
    lo, hi = gf.to_limbs(states)
    out = permutation(lo, hi, tile=tile, interpret=interpret)
    return gf.from_limbs(out)


# ---------------------------------------------------------------------------
# Lane-dense variant: 8 states interleaved per 128-lane row.
#
# Layout: lane = word * 8 + substate. With that stride-8 interleave, the
# MDS rotation "word w -> word (w + j) mod 16 within each state" is a
# GLOBAL lane rotation by 8*j — one cheap full-width roll per tap instead
# of any within-group shuffling. The S-box computes both the LUT path and
# the x^7 path at full width and selects by word index (lane // 8 < 4).
# Every op runs on all 128 lanes; the narrow-kernel variant above idles
# 7/8 of them.
# ---------------------------------------------------------------------------


def _roll_lanes(x, shift):
    try:
        from jax.experimental.pallas import tpu as pltpu

        # Mosaic's tpu.dynamic_rotate requires an i32 shift operand; a
        # bare python int traces as i64 on current JAX and fails verify
        return pltpu.roll(x, shift=jnp.int32(shift), axis=1)
    except Exception:
        return jnp.roll(x, shift, axis=1)


def _dense_sbox(lo, hi, word_lt4):
    # LUT path (all lanes)
    mlo, mhi = gf.to_montgomery((lo, hi))
    olo = jnp.zeros_like(mlo)
    ohi = jnp.zeros_like(mhi)
    for i in range(4):
        sh = np.uint32(8 * i)
        olo = olo | (_fermat((mlo >> sh) & _MASK8) << sh)
        ohi = ohi | (_fermat((mhi >> sh) & _MASK8) << sh)
    llo, lhi = gf.from_montgomery((olo, ohi))
    # x^7 path (all lanes)
    sq = gf.square((lo, hi))
    qu = gf.square(sq)
    p7 = gf.mul(gf.mul(qu, sq), (lo, hi))
    return (
        jnp.where(word_lt4, llo, p7[0]),
        jnp.where(word_lt4, lhi, p7[1]),
    )


def _dense_mds(lo, hi, col):
    digits = (lo & _MASK16, lo >> 16, hi & _MASK16, hi >> 16)
    sums = []
    for d in digits:
        s_lo = jnp.zeros_like(d)
        s_hi = jnp.zeros_like(d)
        for j in range(16):
            rolled = _roll_lanes(d, 8 * j)
            prod = col[j] * rolled
            s_lo = s_lo + (prod & _MASK16)
            s_hi = s_hi + (prod >> 16)
        sums.append((s_lo, s_hi))
    g0 = sums[0][0]
    g1 = sums[0][1] + sums[1][0]
    g2 = sums[1][1] + sums[2][0]
    g3 = sums[2][1] + sums[3][0]
    g4 = sums[3][1]
    x0 = g0 + (g1 << 16)
    c0 = (x0 < g0).astype(_U32)
    t = g2 + (g1 >> 16) + c0
    x1 = t + (g3 << 16)
    c1 = (x1 < t).astype(_U32)
    x2 = g4 + (g3 >> 16) + c1
    return gf.reduce128(x0, x1, x2, jnp.zeros_like(x2))


_COL_SCALARS = [np.uint32(c) for c in MDS_MATRIX_FIRST_COLUMN]


def _dense_rounds(lo, hi, rc_lo, rc_hi):
    """All 5 Tip5 rounds on lane-packed (rows, 128) planes (plain jnp —
    callable both inside a Pallas kernel and as a CPU oracle)."""
    lane = jax.lax.broadcasted_iota(jnp.uint32, lo.shape, dimension=1)
    word_lt4 = (lane >> 3) < 4
    for r in range(NUM_ROUNDS):
        lo, hi = _dense_sbox(lo, hi, word_lt4)
        lo, hi = _dense_mds(lo, hi, _COL_SCALARS)
        lo, hi = gf.add((lo, hi), (rc_lo[r], rc_hi[r]))
    return lo, hi


def _dense_pair_halves(lo, hi, roll=None):
    """In-kernel Merkle pairing of lane-packed digest planes whose rows
    are ordered evens-first: rows [0, h) are left children (global even
    rows), rows [h, 2h) the matching right children. Parent hash-pair
    state r = left[r] words 0..4 (lanes 0:40) | right[r] words 0..4
    shifted to words 5..9 (lane roll by +40) | FixedLength capacity."""
    h = lo.shape[0] // 2
    lane = jax.lax.broadcasted_iota(jnp.uint32, (h, lo.shape[1]), 1)
    roll = roll or _roll_lanes
    rlo = roll(lo[h:], 40)
    rhi = roll(hi[h:], 40)
    plo = jnp.where(lane < 40, lo[:h],
                    jnp.where(lane < 80, rlo, jnp.uint32(1)))
    phi = jnp.where(lane < 80,
                    jnp.where(lane < 40, hi[:h], rhi), jnp.uint32(0))
    return plo, phi


def _dense_kernel(lo_ref, hi_ref, rc_lo_ref, rc_hi_ref, out_lo_ref,
                  out_hi_ref):
    # Mosaic has no 64-bit ints: force the pure-u32 limb multiply path
    with gf.u32_ops():
        lo, hi = _dense_rounds(lo_ref[...], hi_ref[...],
                               rc_lo_ref[...], rc_hi_ref[...])
    out_lo_ref[...] = lo
    out_hi_ref[...] = hi


def _make_dense_multi_kernel(levels: int):
    """Kernel running `levels` Merkle hash levels per invocation: permute,
    then (pair-in-kernel + permute) x (levels-1). Input rows must be
    pre-ordered by bit-reversed low (levels-1) bits (see
    permute_packed_multi) so every level's pairing is contiguous-halves.
    Eliminates the per-level lax.map boundary (XLA's dynamic-slice in /
    stack out around each custom call) and the XLA regroup passes — the
    7.2 ms structural cost prof_packed_overhead measured at 2^20."""

    def kernel(lo_ref, hi_ref, rc_lo_ref, rc_hi_ref, out_lo_ref,
               out_hi_ref):
        with gf.u32_ops():
            lo, hi = lo_ref[...], hi_ref[...]
            rc_lo, rc_hi = rc_lo_ref[...], rc_hi_ref[...]
            lo, hi = _dense_rounds(lo, hi, rc_lo, rc_hi)
            for _ in range(levels - 1):
                lo, hi = _dense_pair_halves(lo, hi)
                lo, hi = _dense_rounds(lo, hi, rc_lo, rc_hi)
        out_lo_ref[...] = lo
        out_hi_ref[...] = hi

    return kernel


def _multi_reorder_perm(tile: int, levels: int):
    """Source-row permutation placing tile rows in the order the
    multi-level kernel's recursive halving expects: destination index
    d = bitrev_{lb}(r & (2^lb - 1)) * (tile >> lb) + (r >> lb) with
    lb = levels - 1 (evens-first, recursively)."""
    lb = levels - 1
    idx = np.arange(tile)
    low = idx & ((1 << lb) - 1)
    rest = idx >> lb
    rev = np.zeros_like(idx)
    for i in range(lb):
        rev |= ((low >> i) & 1) << (lb - 1 - i)
    key = rev * (tile >> lb) + rest
    return np.argsort(key)  # perm_src[d] = source row


def permute_packed_multi(ilo, ihi, levels: int, tile: int = 512,
                         interpret: bool = False):
    """`levels` Merkle hash levels on packed (rows, 128) STATE planes ->
    (rows >> (levels-1), 128) packed DIGEST planes. rows % tile == 0.

    levels=1 degenerates to permute_packed. The per-tile evens-first row
    pre-ordering is a host-constant major-axis gather (cheap); correctness
    of the full construction is pinned on CPU by the jnp replica
    (permute_packed_multi_oracle) and on hardware by the A/B root checks.
    interpret=True routes to the oracle outright (the dense kernel's
    per-primitive interpret emulation is impractically slow on CPU)."""
    if interpret:
        return permute_packed_multi_oracle(ilo, ihi, levels, tile=tile)
    if levels == 1:
        return permute_packed(ilo, ihi, tile=tile, interpret=interpret)
    rows = ilo.shape[0]
    assert rows % tile == 0 and tile % (1 << (levels - 1)) == 0
    n_tiles = rows // tile
    perm = jnp.asarray(_multi_reorder_perm(tile, levels))
    rc_lo, rc_hi = _dense_rc_lanes()
    kernel = _make_dense_multi_kernel(levels)
    out_t = tile >> (levels - 1)

    def one(args):
        tlo, thi = args
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((out_t, 128), jnp.uint32)] * 2,
            interpret=interpret,
        )(tlo, thi, rc_lo, rc_hi)

    tlo = jnp.take(ilo.reshape(n_tiles, tile, 128), perm, axis=1)
    thi = jnp.take(ihi.reshape(n_tiles, tile, 128), perm, axis=1)
    if n_tiles == 1:
        olo, ohi = one((tlo[0], thi[0]))
        return olo, ohi
    olo, ohi = jax.lax.map(one, (tlo, thi))
    return (olo.reshape(rows >> (levels - 1), 128),
            ohi.reshape(rows >> (levels - 1), 128))


def permute_packed_multi_oracle(ilo, ihi, levels: int, tile: int = 512):
    """jnp replica of the multi-level kernel (same code path minus
    pallas_call) — the CPU correctness oracle for the layout algebra AND
    arithmetic of permute_packed_multi."""
    rows = ilo.shape[0]
    n_tiles = rows // tile
    perm = jnp.asarray(_multi_reorder_perm(tile, levels))
    rc_lo, rc_hi = _dense_rc_lanes()

    def one(tlo, thi):
        lo, hi = _dense_rounds(tlo, thi, rc_lo, rc_hi)
        for _ in range(levels - 1):
            lo, hi = _dense_pair_halves(
                lo, hi, roll=lambda x, s: jnp.roll(x, s, axis=1))
            lo, hi = _dense_rounds(lo, hi, rc_lo, rc_hi)
        return lo, hi

    tlo = jnp.take(ilo.reshape(n_tiles, tile, 128), perm, axis=1)
    thi = jnp.take(ihi.reshape(n_tiles, tile, 128), perm, axis=1)
    outs = [one(tlo[i], thi[i]) for i in range(n_tiles)]
    return (jnp.concatenate([o[0] for o in outs], 0),
            jnp.concatenate([o[1] for o in outs], 0))


def _interleave(x):
    """(B, 16) -> (B // 8, 128) with lane = word * 8 + substate."""
    b = x.shape[0]
    return jnp.transpose(x.reshape(b // 8, 8, 16), (0, 2, 1)).reshape(
        b // 8, 128
    )


def _deinterleave(x):
    rows = x.shape[0]
    return jnp.transpose(x.reshape(rows, 16, 8), (0, 2, 1)).reshape(
        rows * 8, 16
    )


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def permutation_dense(lo, hi, tile: int = 512, interpret: bool = False):
    """Lane-dense fused permutation of (B, 16) limb planes; B % (8*tile) == 0."""
    b = lo.shape[0]
    assert b % (8 * tile) == 0, f"batch {b} must be divisible by {8 * tile}"
    ilo = _interleave(lo)
    ihi = _interleave(hi)
    rows = ilo.shape[0]
    # Round constants in interleaved lane order: rc_lane[lane] = RC[lane >> 3]
    rc_lo = np.ascontiguousarray(
        _RC_LO[:, :, None].repeat(8, axis=2).reshape(NUM_ROUNDS, 128)
    )
    rc_hi = np.ascontiguousarray(
        _RC_HI[:, :, None].repeat(8, axis=2).reshape(NUM_ROUNDS, 128)
    )
    spec = pl.BlockSpec((tile, 128), lambda i: (i, 0))
    rc_spec = pl.BlockSpec((NUM_ROUNDS, 128), lambda i: (0, 0))
    olo, ohi = pl.pallas_call(
        _dense_kernel,
        grid=(rows // tile,),
        in_specs=[spec, spec, rc_spec, rc_spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, 128), jnp.uint32),
            jax.ShapeDtypeStruct((rows, 128), jnp.uint32),
        ],
        interpret=interpret,
    )(ilo, ihi, jnp.asarray(rc_lo), jnp.asarray(rc_hi))
    return _deinterleave(olo), _deinterleave(ohi)


def _dense_rc_lanes():
    rc_lo = np.ascontiguousarray(
        _RC_LO[:, :, None].repeat(8, axis=2).reshape(NUM_ROUNDS, 128))
    rc_hi = np.ascontiguousarray(
        _RC_HI[:, :, None].repeat(8, axis=2).reshape(NUM_ROUNDS, 128))
    return jnp.asarray(rc_lo), jnp.asarray(rc_hi)


def permute_packed(ilo, ihi, tile: int = 512, interpret: bool = False):
    """Dense-kernel permutation on ALREADY lane-packed (rows, 128) planes.

    The kernel is substate-agnostic — its MDS lane-roll by 8*j moves word
    group w to (w+j) mod 16 while preserving each lane's substate slot, and
    the S-box/round-constant lanes depend only on lane >> 3 — so any
    assignment of 8 states to the substate slots of a row is valid (both
    the interleaved packing of `permutation_dense*` and the strided packing
    of ops.tip5_packed). Tiled by an outer lax.map over grid-free
    single-(tile, 128)-block calls: one compiled block executable reused
    for every tile count (this environment's remote-compile helper rejects
    Pallas `grid=`, and one Mosaic executable keeps compile cost flat
    across the many layer sizes of a Merkle commit). rows % tile == 0."""
    rows = ilo.shape[0]
    assert rows % tile == 0, f"rows {rows} must be divisible by tile {tile}"
    rc_lo, rc_hi = _dense_rc_lanes()
    kwargs = {}
    if tile > 512 and not interpret:
        # the kernel's scoped-VMEM stack is ~23 KB/row (measured: 23.57 MB
        # at tile=1024) — beyond the 16 MB default for tiles > 512; v5e has
        # 128 MB of VMEM, so raise the cap for the larger blocks
        from jax.experimental.pallas import tpu as pltpu

        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)

    def one(args):
        tlo, thi = args
        return pl.pallas_call(
            _dense_kernel,
            out_shape=[jax.ShapeDtypeStruct((tile, 128), jnp.uint32)] * 2,
            interpret=interpret,
            **kwargs,
        )(tlo, thi, rc_lo, rc_hi)

    n_tiles = rows // tile
    if n_tiles == 1:
        return one((ilo, ihi))
    olo, ohi = jax.lax.map(
        one, (ilo.reshape(n_tiles, tile, 128),
              ihi.reshape(n_tiles, tile, 128)))
    return olo.reshape(rows, 128), ohi.reshape(rows, 128)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def permutation_dense_nogrid(lo, hi, tile: int = 512,
                             interpret: bool = False):
    """Lane-dense fused permutation without a Pallas grid.

    This environment's remote-compile helper 500s on ANY pallas_call
    carrying a `grid=` (bisected 2026-08-20: trivial/grid-free kernels —
    including gf.mul chains and pltpu.roll — compile and run bit-exact;
    adding grid=(4,) to the same trivial kernel fails), so the original
    `permutation_dense` above cannot build here. Same kernel, tiled by an
    outer lax.map over grid-free single-block calls instead: one compiled
    block executable, sequential-grid semantics. (B, 16) planes,
    B % (8*tile) == 0."""
    b = lo.shape[0]
    assert b % (8 * tile) == 0, f"batch {b} must be divisible by {8 * tile}"
    olo, ohi = permute_packed(_interleave(lo), _interleave(hi),
                              tile=tile, interpret=interpret)
    return _deinterleave(olo), _deinterleave(ohi)


def permutation_dense_values(states: np.ndarray, tile: int = 512,
                             interpret: bool = False) -> np.ndarray:
    """Host-convenience over the grid-free tiling (the variant this
    environment's tunnel can compile; the grid version is
    `permutation_dense`)."""
    states = np.asarray(states, dtype=np.uint64)
    lo, hi = gf.to_limbs(states)
    out = permutation_dense_nogrid(lo, hi, tile=tile, interpret=interpret)
    return gf.from_limbs(out)
