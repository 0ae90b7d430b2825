"""Distributed Merkle commitment: sharded layers + cross-chip top tree.

TPU-native replacement for the reference's rayon subtree parallelism
(merkle_tree.rs:165-212): leafs are sharded over the mesh; each chip reduces
its contiguous subtree locally (log(n/d) batched hash_pair layers — exactly
the reference's "split into 2^t subtrees" strategy, with chips instead of
threads); the d subtree roots are all-gathered (one small collective) and the
top log(d) layers are computed redundantly on every chip, which is cheaper
than communicating for trees this small.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..math import gf
from ..tip5 import permutation as tip5_dev
from ..tip5.digest import Digest
from .mesh import AXIS


def _reduce_layers(state, num_layers: int):
    """Repeated batched hash_pair: (b, 5) limb planes -> (b / 2^k, 5).

    On the TPU backend, bulk layers run through the lane-packed dense
    Tip5 kernel (ops.tip5_packed: whole commit in (8,16) lane packing,
    per-layer regroup = two 40-lane slices; measured faster than the XLA
    path at 2^20 — DESIGN.md §19); small layers and other backends keep
    the XLA-fused path. Dispatch is decided at trace time
    (TWENTY_FIRST_TPU_PACKED_COMMIT=0 opts out before first use)."""
    from ..ops import tip5_packed

    if (num_layers > 0
            and tip5_packed.packed_eligible(state[0].shape[0] // 2)
            and tip5_packed.use_packed_commit()):
        return tip5_packed.reduce_layers_packed(state, num_layers)
    lo, hi = state
    for _ in range(num_layers):
        b = lo.shape[0] // 2
        plo = lo.reshape(b, 2, 5)
        phi = hi.reshape(b, 2, 5)
        lo, hi = tip5_dev.hash_pair(
            (plo[:, 0], phi[:, 0]), (plo[:, 1], phi[:, 1])
        )
    return lo, hi


@functools.lru_cache(maxsize=None)
def _make_distributed_root(mesh, log_n: int):
    d = mesh.shape[AXIS]
    log_d = d.bit_length() - 1
    if (1 << log_d) != d:
        raise ValueError("mesh size must be a power of two")
    if log_n < log_d:
        raise ValueError("tree smaller than mesh")

    def local(lo, hi):
        # (n/d, 5) local leafs -> local subtree root
        slo, shi = _reduce_layers((lo, hi), log_n - log_d)
        # gather the d subtree roots everywhere (tiny: d * 5 words)
        glo = jax.lax.all_gather(slo, AXIS, axis=0, tiled=True)
        ghi = jax.lax.all_gather(shi, AXIS, axis=0, tiled=True)
        rlo, rhi = _reduce_layers((glo, ghi), log_d)
        # Every chip holds the same (1, 5) root; expose it as a sharded
        # (d, 5) output (row per chip) — shard_map cannot statically infer
        # replication through the hash arithmetic.
        return rlo, rhi

    fn = shard_map(local, mesh=mesh, in_specs=(P(AXIS, None), P(AXIS, None)),
                   out_specs=(P(AXIS, None), P(AXIS, None)))
    return jax.jit(fn)


def distributed_merkle_root(leafs, mesh) -> Digest:
    """Merkle root of (n, 5) uint64 leafs, sharded over the mesh.

    Bit-exact with MerkleTree.new(leafs).root() for any mesh size.
    """
    leafs = np.asarray(leafs, dtype=np.uint64)
    n = leafs.shape[0]
    log_n = n.bit_length() - 1
    if (1 << log_n) != n:
        raise ValueError("number of leafs must be a power of two")
    lo, hi = _make_distributed_root(mesh, log_n)(*gf.to_limbs(leafs))
    # replicated output: every chip holds the (1, 5) root
    return Digest.from_array(gf.from_limbs((lo, hi))[0])


def distributed_merkle_root_limbs(state, mesh, log_n: int):
    """Jit-composable variant on limb planes (n, 5) -> (1, 5)."""
    return _make_distributed_root(mesh, log_n)(*state)
