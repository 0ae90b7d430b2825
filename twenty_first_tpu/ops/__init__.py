"""EXPERIMENTAL kernel lab — measured alternatives to the production paths.

Nothing in this package is on a default execution path. Each module is a
hand-written Pallas/MXU kernel that was built, validated bit-exact against
the XLA-fused production kernels, measured on TPU v5e, and found SLOWER
(numbers in DESIGN.md §5). They are kept in-tree as frozen experiments:

  * `tip5_pallas` — narrow (B, 16) and lane-dense (8 states/row) Pallas Tip5
    permutations (3.9M / 29M perms/s vs ~24M for the XLA path's interleaved
    median). The lane-dense kernel WINS standalone (+20%); it is not
    promoted because the library's hot Tip5 sites are fused pipelines
    (Merkle layers, LDE leaf hashing) where its (8,16)-packed layout needs
    boundary transposes into every neighbor. That fused A/B (the decision
    rule: promote iff it wins inside a 2^20 Merkle commit) could NOT be
    measured: this environment's tunnel rejects all Mosaic AOT compiles
    (HTTP 500, reported as "skipped:mosaic-aot-tunnel" by bench.py every
    run), so the standalone numbers predate the tunnel regression and the
    fused A/B is recorded as BLOCKED, not decided — see DESIGN.md §5.
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
