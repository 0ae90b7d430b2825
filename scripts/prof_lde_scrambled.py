"""A/B: natural-order vs scrambled-interior LDE+commit (verdict item #4).

Both pipelines produce the IDENTICAL root (the scrambled variant's final
gatherless-DIT pass restores natural evaluation order), so this measures
pure data-movement deltas: the scrambled interior has ZERO bit-reverse
gathers and fuses the offset-power multiply into the iNTT's second pass;
the natural interior pays 2 in-body gathers per transform plus a
standalone scale multiply, but keeps the radix-4 DIT fusion shape XLA
likes. Interleaved k-chain medians (DESIGN.md §7 estimator).

Usage: python scripts/prof_lde_scrambled.py [log_rows=22] [reps=5]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from twenty_first_tpu.math import gf
from twenty_first_tpu.parallel.pipeline import (
    lde_commit_diags, lde_scrambled_tables, trace_lde_commit,
    trace_lde_commit_scrambled)

P = (1 << 64) - (1 << 32) + 1
LOG_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 22
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
W = 8
N = 1 << (LOG_ROWS - 2)

rng = np.random.default_rng(0)
tr = rng.integers(0, P, size=(W, N), dtype=np.uint64)
tlo, thi = (jax.device_put(v) for v in gf.to_limbs(tr))

inv_d, fwd_d = lde_commit_diags(N, 4)
d1, pw_dev, d4 = lde_scrambled_tables(N, 4)


@functools.partial(jax.jit, static_argnames=("k",))
def nat_chain(a, b, il, ih, fl, fh, k):
    def body(i, acc):
        r = trace_lde_commit((a ^ acc[0], b), expansion=4,
                             ntt_diags=((il, ih), (fl, fh)))
        return (acc[0] ^ jnp.sum(r[0], dtype=jnp.uint32),
                acc[1] + jnp.sum(r[1], dtype=jnp.uint32))
    o = jax.lax.fori_loop(0, k, body, (jnp.zeros((), jnp.uint32),
                                       jnp.zeros((), jnp.uint32)))
    return o[0] + o[1]


@functools.partial(jax.jit, static_argnames=("k",))
def scr_chain(a, b, d1l, d1h, pl, ph, d4l, d4h, k):
    def body(i, acc):
        r = trace_lde_commit_scrambled(
            (a ^ acc[0], b), expansion=4,
            tables=((d1l, d1h), (pl, ph), (d4l, d4h)))
        return (acc[0] ^ jnp.sum(r[0], dtype=jnp.uint32),
                acc[1] + jnp.sum(r[1], dtype=jnp.uint32))
    o = jax.lax.fori_loop(0, k, body, (jnp.zeros((), jnp.uint32),
                                       jnp.zeros((), jnp.uint32)))
    return o[0] + o[1]


nat_args = (tlo, thi, inv_d[0], inv_d[1], fwd_d[0], fwd_d[1])
scr_args = (tlo, thi, d1[0], d1[1], pw_dev[0], pw_dev[1], d4[0], d4[1])

# equality of the chained checksum certifies root equality in-graph
print("compiling + checking equality...", flush=True)
c_nat = int(nat_chain(*nat_args, k=1))
c_scr = int(scr_chain(*scr_args, k=1))
assert c_nat == c_scr, f"root checksum mismatch: {c_nat} vs {c_scr}"
print("checksums equal:", c_nat, flush=True)

K_LO, K_HI = 1, 3
for fn, args in ((nat_chain, nat_args), (scr_chain, scr_args)):
    int(fn(*args, k=K_LO))
    int(fn(*args, k=K_HI))

nat_d, scr_d = [], []
for r in range(REPS):
    row = {}
    for name, fn, args, acc in (("nat", nat_chain, nat_args, nat_d),
                                ("scr", scr_chain, scr_args, scr_d)):
        t0 = time.perf_counter(); int(fn(*args, k=K_LO))
        tl = time.perf_counter() - t0
        t0 = time.perf_counter(); int(fn(*args, k=K_HI))
        th = time.perf_counter() - t0
        acc.append((th - tl) / (K_HI - K_LO))
        row[name] = acc[-1]
    print(f"round {r}: nat {row['nat']*1e3:8.2f} ms   "
          f"scr {row['scr']*1e3:8.2f} ms", flush=True)

nat_d.sort(); scr_d.sort()
mn, ms = nat_d[len(nat_d) // 2], scr_d[len(scr_d) // 2]
print(f"\nLDE+commit 2^{LOG_ROWS} rows w{W}: natural {mn*1e3:.2f} ms | "
      f"scrambled {ms*1e3:.2f} ms | delta {(ms/mn-1)*100:+.1f}%")
