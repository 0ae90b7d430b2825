"""Lane-packed fused Tip5 commit path: Merkle/LDE layers in (8,16) packing.

DESIGN §17 measured the lane-dense Pallas Tip5 kernel 47% faster than the
XLA-fused path on standalone batches (34.0 vs 23.1 M perms/s), but LOSING
inside a 2^20 Merkle commit (51.2 vs 45.2 ms) because every layer paid
digest-plane <-> lane-packed transposes at the kernel boundary. This module
removes those per-layer transposes by keeping the ENTIRE commit in packed
layout — the round-4 verdict's named top lever.

Packing (STRIDED, not interleaved): with R = B/8 rows of 128 lanes, state c
lives at row (c mod R), substate q = c // R, lane = word*8 + q. The dense
kernel runs unchanged on this packing (its MDS lane-roll moves word groups
while preserving substate slots; see ops.tip5_pallas.permute_packed). The
payoff is the Merkle parent/child regroup: parent j = q'*(R/2) + r' has
children 2j, 2j+1 at child rows 2r' and 2r'+1 with the SAME substate q', so
pairing layer k's digests into layer k+1's hash states is

    out[r, lane 0:40]   = child_rows[2r,   0:40]   (left digest, words 0..4)
    out[r, lane 40:80]  = child_rows[2r+1, 0:40]   (right digest -> words 5..9)
    out[r, lane 80:128] = sponge capacity (lo=1, hi=0)

two 40-lane slices + one concat per plane — no transposes — and the strided
invariant re-establishes itself at every layer, all the way down the tree.
Pack/unpack transposes are paid ONCE at the pipeline boundary.

Replaces the hash schedule of the reference's AVX-512 parallel digest path
(tip5/avx512.rs:12-18) composed with its rayon Merkle layer reduction
(merkle_tree.rs:165-212).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..tip5 import permutation as tip5_dev
from ..tip5.constants import RATE, STATE_SIZE
from . import tip5_pallas

_U32 = jnp.uint32

#: block height for the packed kernels. Per-lax.map-step cost measured
#: ~zero (prof_packed_overhead: 16/32/64 steps at constant data are a
#: wash), so the tile is bounded only by scoped VMEM: the compile helper
#: pins a hard 16 MB cap (CompilerParams.vmem_limit_bytes is not honored
#: through its AOT path) and kernel scratch is ~23 KB/row, capping the
#: single-level kernel at 512 rows — the measured-best production config.
TILE = 512

#: Merkle levels fused per kernel invocation (in-kernel pairing via
#: permute_packed_multi). MEASURED REGRESSION above 1 (DESIGN §19): the
#: fused levels run at 1/2..1/8 vector width inside a block (rows 64..16
#: per op at tile 128), losing more to narrow-op inefficiency than the
#: saved XLA boundary passes — lv4/t128 = 45.3 ms vs lv1/t512 = 41.4 ms
#: at 2^20 (A/B harness); lv2/t256 = 37.55 vs lv1/t512 = 37.11 (probe
#: harness). The single-level scheme keeps EVERY level at full width by
#: batching the whole layer across blocks. Machinery kept in-tree
#: (oracle-tested at depths 1-4) for hardware where the VMEM cap allows
#: wide multi-level blocks.
MULTI_LEVELS = 1


def pack_states(lo, hi):
    """Natural (B, 16) limb planes -> strided-packed (B/8, 128) planes."""
    b = lo.shape[0]
    r = b // 8

    def f(x):
        return x.reshape(8, r, 16).transpose(1, 2, 0).reshape(r, 128)

    return f(lo), f(hi)


def unpack_states(ilo, ihi):
    """Inverse of pack_states: (R, 128) -> (8R, 16)."""
    r = ilo.shape[0]

    def f(x):
        return x.reshape(r, 16, 8).transpose(2, 0, 1).reshape(8 * r, 16)

    return f(ilo), f(ihi)


def unpack_digests(ilo, ihi):
    """Packed post-permutation planes (R, 128) -> natural (8R, 5) digests.

    Digest word w of state c = q*R + r sits at [r, w*8 + q] (w < 5); lanes
    >= 40 hold the discarded sponge tail.
    """
    r = ilo.shape[0]

    def f(x):
        return x.reshape(r, 16, 8)[:, :5, :].transpose(2, 0, 1).reshape(
            8 * r, 5)

    return f(ilo), f(ihi)


def pair_packed(ilo, ihi):
    """Merkle pairing in packed layout: (R, 128) child digest planes ->
    (R/2, 128) parent hash-pair states (capacity = FixedLength domain)."""
    even_lo, odd_lo = ilo[0::2], ilo[1::2]
    even_hi, odd_hi = ihi[0::2], ihi[1::2]
    r2 = even_lo.shape[0]
    cap = STATE_SIZE - RATE  # 6 capacity words = 48 lanes
    cap_lo = jnp.ones((r2, 8 * cap), _U32)
    cap_hi = jnp.zeros((r2, 8 * cap), _U32)
    out_lo = jnp.concatenate([even_lo[:, :40], odd_lo[:, :40], cap_lo], 1)
    out_hi = jnp.concatenate([even_hi[:, :40], odd_hi[:, :40], cap_hi], 1)
    return out_lo, out_hi


def _pair_states_natural(lo, hi):
    """Natural (b, 5) digest planes -> (b/2, 16) hash-pair states."""
    b = lo.shape[0] // 2
    cap = STATE_SIZE - RATE
    cap_lo = jnp.ones((b, cap), _U32)
    cap_hi = jnp.zeros((b, cap), _U32)
    return (jnp.concatenate([lo.reshape(b, RATE), cap_lo], 1),
            jnp.concatenate([hi.reshape(b, RATE), cap_hi], 1))


def _xla_reduce(lo, hi, layers: int):
    """Plain XLA hash_pair reduction of (b, 5) digest planes, `layers` times."""
    for _ in range(layers):
        slo, shi = _pair_states_natural(lo, hi)
        out = tip5_dev.permutation((slo, shi))
        lo, hi = out[0][:, :5], out[1][:, :5]
    return lo, hi


def _packed_chain(ilo, ihi, max_pairs: int, tile: int, interpret: bool):
    """Hash packed states down the tree: each kernel call fuses up to
    MULTI_LEVELS levels (in-kernel pairing), with one XLA pair_packed
    between calls; returns (packed digest planes, pairs_done)."""
    pairs = 0
    while True:
        rows = ilo.shape[0]
        lv = min(MULTI_LEVELS, max_pairs - pairs + 1)
        while lv > 1 and (tile % (1 << (lv - 1)) or (rows >> (lv - 1)) < 1):
            lv -= 1
        ilo, ihi = tip5_pallas.permute_packed_multi(
            ilo, ihi, lv, tile=tile, interpret=interpret)
        pairs += lv - 1
        if pairs >= max_pairs or (ilo.shape[0] // 2) % tile != 0 \
                or ilo.shape[0] < 2:
            return ilo, ihi, pairs
        ilo, ihi = pair_packed(ilo, ihi)
        pairs += 1


def packed_eligible(num_states: int, tile: int = TILE) -> bool:
    """True iff a (num_states, 16) hash layer can enter the packed path."""
    r = num_states // 8
    return num_states % 8 == 0 and r >= tile and r % tile == 0


def reduce_layers_packed(state, num_layers: int, tile: int = TILE,
                         interpret: bool = False):
    """Drop-in for dist_merkle._reduce_layers: (b, 5) digest planes ->
    (b / 2^num_layers, 5), bulk layers through the packed dense kernel.

    Bit-exact with the XLA reduction (the packed permutation is the same
    arithmetic in a different lane assignment; tests pin this in interpret
    mode). Layers too small for a full (tile, 128) block finish on the XLA
    path after ONE unpack.
    """
    lo, hi = state
    done = 0
    if num_layers > 0 and packed_eligible(lo.shape[0] // 2, tile):
        slo, shi = _pair_states_natural(lo, hi)
        ilo, ihi = pack_states(slo, shi)
        ilo, ihi, pairs = _packed_chain(ilo, ihi, num_layers - 1, tile,
                                        interpret)
        lo, hi = unpack_digests(ilo, ihi)
        done = 1 + pairs
    return _xla_reduce(lo, hi, num_layers - done)


def commit_states_packed(slo, shi, num_layers: int, tile: int = TILE,
                         interpret: bool = False):
    """Leaf-hash states (B, 16) -> (B / 2^num_layers, 5) digest planes.

    The LDE tail: hash every leaf state (one permutation each) and reduce
    `num_layers` Merkle layers, all in packed layout — pack transpose paid
    once on the way in, digest unpack once on the way out.
    """
    ilo, ihi = pack_states(slo, shi)
    ilo, ihi, pairs = _packed_chain(ilo, ihi, num_layers, tile, interpret)
    lo, hi = unpack_digests(ilo, ihi)
    return _xla_reduce(lo, hi, num_layers - pairs)


def use_packed_commit() -> bool:
    """Trace-time dispatch gate for the packed commit path (TPU backend
    only; opt-out TWENTY_FIRST_TPU_PACKED_COMMIT=0 — read at trace time,
    so set it before the first call of a given shape)."""
    import os

    return (jax.default_backend() == "tpu"
            and os.environ.get("TWENTY_FIRST_TPU_PACKED_COMMIT", "1") != "0")
