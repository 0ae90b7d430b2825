"""Mosaic-vs-XLA ALU probe: pure gf op chains on a VMEM-resident tile.

The fused-pass Pallas NTT kernels measured ~3x slower per pass than XLA's
(DESIGN.md §5). This probe isolates WHERE the loss is: if a pure multiply
chain (no strided slicing, no relayouts, one contiguous tile) already runs
~3x slower under Mosaic, the wall is u32 codegen and no kernel
restructuring will pay; if the chain matches XLA, the loss is layout
(strided sublane slices / interleave relayouts) and a restructured kernel
could win.

Run on TPU: python scripts/pallas_alu_probe.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from twenty_first_tpu.math import gf

P = (1 << 64) - (1 << 32) + 1
ROWS, COLS = 512, 128  # 256 KB per u32 plane; tile + chain stays in VMEM


def _chain(op, a, b, k):
    o = a
    for _ in range(k):
        o = op(o, b)
        # rotate operands so the chain cannot collapse
        o = (o[1], o[0])
    return o


def make_pallas(op, k):
    def kernel(al, ah, bl, bh, ol, oh):
        with gf.u32_ops():
            o = _chain(op, (al[...], ah[...]), (bl[...], bh[...]), k)
        ol[...] = o[0]
        oh[...] = o[1]

    @jax.jit
    def run(al, ah, bl, bh):
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((ROWS, COLS), jnp.uint32)] * 2,
        )(al, ah, bl, bh)

    return run


def make_xla(op, k):
    @jax.jit
    def run(al, ah, bl, bh):
        with gf.u32_ops():
            o = _chain(op, (al, ah), (bl, bh), k)
        return o

    return run


def timed(runs, args, reps=6):
    # interleaved medians (shared-device methodology, DESIGN.md §5)
    outs = {name: [] for name in runs}
    for name, fn in runs.items():
        r = fn(*args)
        jax.block_until_ready(r)
        int(jnp.sum(r[0], dtype=jnp.uint32))  # force readback through tunnel
    for _ in range(reps):
        for name, fn in runs.items():
            t0 = time.perf_counter()
            int(jnp.sum(fn(*args)[0], dtype=jnp.uint32))
            outs[name].append(time.perf_counter() - t0)
    return {name: sorted(v)[len(v) // 2] for name, v in outs.items()}


def main():
    rng = np.random.default_rng(0)
    a = rng.integers(0, P, size=(ROWS, COLS), dtype=np.uint64)
    b = rng.integers(0, P, size=(ROWS, COLS), dtype=np.uint64)
    al, ah = (jax.device_put(v) for v in gf.to_limbs(a))
    bl, bh = (jax.device_put(v) for v in gf.to_limbs(b))
    n = ROWS * COLS

    for opname, op in (("mul_lazy", gf.mul_lazy),
                       ("add_lazy", gf.add_lazy)):
        K_LO, K_HI = 16, 112
        rows = {}
        for label, mk in (("pallas", make_pallas), ("xla", make_xla)):
            lo = timed({label: mk(op, K_LO)}, (al, ah, bl, bh))[label]
            hi = timed({label: mk(op, K_HI)}, (al, ah, bl, bh))[label]
            per_op = (hi - lo) / (K_HI - K_LO)
            rows[label] = per_op
            print(f"{opname:9s} {label:6s}: {per_op*1e6:8.2f} us/chain-step "
                  f"({n / per_op / 1e9:7.2f}G op/s)", flush=True)
        print(f"{opname:9s} ratio pallas/xla: "
              f"{rows['pallas'] / rows['xla']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
