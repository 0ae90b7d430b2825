"""Kernel lab + the promoted lane-dense Tip5 production path.

Most modules here are hand-written Pallas/MXU kernels that were built,
validated bit-exact against the XLA-fused production kernels, measured on
TPU v5e, and found SLOWER (numbers in DESIGN.md §5) — kept in-tree as
frozen experiments. Two are PROMOTED production dispatch targets:

  * `tip5_pallas` — narrow (B, 16) and lane-dense (8 states/row) Pallas Tip5
    permutations. The lane-dense kernel is PROMOTED for standalone batches:
    `tip5.permutation.permutation_batch` dispatches to
    `permutation_dense_nogrid` on TPU — measured **34.0M perms/s vs 23.1M**
    for the XLA path (interleaved medians, k 2 vs 18, batch 2^16, v5e,
    including the pack/unpack transposes each call). Tunnel note: this
    environment's remote-compile helper 500s on any pallas_call carrying
    a `grid=` (bisected 2026-08-20: trivial grid-free kernels with gf.mul
    chains and pltpu.roll compile and run bit-exact; grid=(4,) on a
    trivial kernel fails), hence the grid-free `permutation_dense_nogrid`
    (outer lax.map over single-block calls); the original grid variants
    remain for real TPU VMs.
  * `tip5_packed` — round 5: the SAME dense kernel driving whole Merkle /
    LDE commits in a strided (8,16) lane packing whose parent/child
    regroup is two 40-lane slices per layer (no per-layer transposes —
    the boundary moves that made round 4's per-layer dense swap LOSE its
    2^20 Merkle A/B, 51.2 vs 45.2 ms, scripts/ab_dense_merkle.py).
    Measured WINNING at 2^20 with the packing kept across layers
    (scripts/ab_packed_merkle.py / ab_packed_tile.py, DESIGN.md §19);
    dispatched from dist_merkle._reduce_layers and
    pipeline._hash_rows_commit on the TPU backend.
  * `tip5_mxu` — exact bf16 block-circulant MDS matmuls on the MXU
    (24M perms/s; the u32<->bf16 boundaries cost more HBM traffic than the
    saved VPU ops).
  * `ntt_pallas` — fused-pass NTT kernels keeping whole butterfly pipelines
    in VMEM (12-52 ms per 2^24 pass vs 4.2 ms for the slab-mapped XLA pass;
    Mosaic's u32 codegen is ~3x behind XLA's fusion on the butterfly op mix).

Correctness coverage: tests/test_pallas_kernels.py (runs in CI on the CPU
interpreter; set TWENTY_FIRST_TPU_PALLAS_HW_TEST=1 to run the same
bit-exactness checks on real TPU hardware — bench.py also runs a hardware
bit-exactness smoke every run, reported as extras["pallas_hw_bit_exact"]).

If a future hardware generation or Mosaic release changes the codegen
picture, these are the starting points; promote by wiring a dispatch in the
owning production module (tip5/permutation.py, math/ntt.py), not by
importing from here.
"""

from . import tip5_pallas  # noqa: F401
