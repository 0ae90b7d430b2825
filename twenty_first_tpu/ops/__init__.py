"""EXPERIMENTAL kernel lab — measured alternatives to the production paths.

Nothing in this package is on a default execution path. Each module is a
hand-written Pallas/MXU kernel that was built, validated bit-exact against
the XLA-fused production kernels, measured on TPU v5e, and found SLOWER
(numbers in DESIGN.md §5). They are kept in-tree as frozen experiments:

  * `tip5_pallas` — narrow (B, 16) and lane-dense (8 states/row) Pallas Tip5
    permutations. The lane-dense kernel is PROMOTED for standalone batches
    (the one exception to "nothing here is on a default path"):
    `tip5.permutation.permutation_batch` dispatches to
    `permutation_dense_nogrid` on TPU — measured **34.0M perms/s vs 23.1M**
    for the XLA path (interleaved medians, k 2 vs 18, batch 2^16, v5e,
    including the pack/unpack transposes each call). The FUSED pipelines
    (Merkle layers, LDE leaf hashing, hash flows) stay on the XLA path:
    the decision-rule A/B (scripts/ab_dense_merkle.py) measured the dense
    swap LOSING inside a 2^20 Merkle commit, **51.2 vs 45.2 ms** median —
    the (8,16)-packed layout's boundary transposes into every fused
    neighbor eat the standalone win, exactly as predicted when the kernel
    was frozen. Tunnel note: this environment's remote-compile helper
    500s on any pallas_call carrying a `grid=` (bisected 2026-08-20:
    trivial grid-free kernels with gf.mul chains and pltpu.roll compile
    and run bit-exact; grid=(4,) on a trivial kernel fails), hence the
    grid-free `permutation_dense_nogrid` (outer lax.map over single-block
    calls); the original grid variants remain for real TPU VMs.
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
