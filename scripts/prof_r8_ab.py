"""A/B the mixed radix-8 plan vs a radix-4-only plan at 2^24 full four-step.

Chained-k timing as in prof_ntt.py. The r4-only plan is produced by
monkeypatching _device_tables_mixed to emit r2/r4 entries only.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from twenty_first_tpu.math import ntt
from twenty_first_tpu.math import gf_numpy as gfn

LOG_N = int(os.environ.get("LOG_N", "24"))
N = 1 << LOG_N

rng = np.random.default_rng(0)
P = (1 << 64) - (1 << 32) + 1
vals = rng.integers(0, P, size=N, dtype=np.uint64)
LO = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32))
HI = jnp.asarray((vals >> 32).astype(np.uint32))


def timed(fn, args, k_lo=1, k_hi=5, reps=3):
    for k in (k_lo, k_hi):
        int(fn(*args, k=k))
    lows, highs = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        int(fn(*args, k=k_lo))
        lows.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        int(fn(*args, k=k_hi))
        highs.append(time.perf_counter() - t0)
    return (min(highs) - min(lows)) / (k_hi - k_lo)


def checksum(lo, hi):
    return (jnp.sum(lo.astype(jnp.uint64)) + jnp.sum(hi.astype(jnp.uint64))).astype(jnp.uint64)


def _split_u32(v):
    v = np.asarray(v, dtype=np.uint64)
    return ((v & np.uint64(0xFFFFFFFF)).astype(np.uint32), (v >> np.uint64(32)).astype(np.uint32))


@functools.lru_cache(maxsize=None)
def tables_r4only(log_n: int, inverse: bool):
    """r2/r4-only plan in the mixed-plan format."""
    n = 1 << log_n
    root = ntt.PRIMITIVE_ROOTS[n]
    if inverse:
        root = pow(root, P - 2, P)
    plan = []
    s = 0
    if log_n % 2 == 1:
        plan.append(("r2", None, 1, True))
        s = 1
    while s < log_n:
        m = 1 << s
        w4m = pow(root, n // (4 * m), P)
        t = gfn.powers(w4m, m)
        t2 = gfn.mul(t, t)
        t3 = gfn.mul(t2, t)
        plan.append(("r4", tuple(_split_u32(v) for v in (t, t2, t3)), m, m == 1))
        s += 2
    return ntt._bit_reverse_permutation(log_n), tuple(plan)


def run_variant(name):
    diag = ntt._four_step_diag_device(LOG_N, False)

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(lo, hi, dlo, dhi, k):
        for _ in range(k):
            lo, hi = ntt.four_step_ntt_traceable((lo, hi), LOG_N, False, (dlo, dhi))
        return checksum(lo, hi)

    t = timed(run, (LO, HI, diag[0], diag[1]))
    print(f"{name} 2^{LOG_N}: {t*1e3:.2f} ms  ({N/t/1e9:.2f} G elems/s)", flush=True)
    return t


def _core_ax2_noperm(x, log_n, inverse):
    """Timing-only variant: skip the bit-reverse gather (WRONG VALUES)."""
    import jax.numpy as jnp
    from twenty_first_tpu.math import gf
    perm, plan = ntt._device_tables_mixed(log_n, inverse)
    st = x
    n = x[0].shape[-2]
    for kind, tabs, m, trivial in plan:
        if kind == "r2":
            st = ntt._radix2_first_ax2(st, n)
        elif kind == "r4":
            st = ntt._radix4_true_ax2(st, tabs, m, n, inverse, trivial=trivial)
        else:
            st = ntt._radix8_true_ax2(st, tabs, m, n, inverse, trivial=trivial)
    return gf.canon(st)


if __name__ == "__main__":
    which = sys.argv[1:] or ["r8", "r4"]
    print("device:", jax.devices()[0], flush=True)
    orig = ntt._device_tables_mixed
    orig_core = ntt._ntt_core_ax2
    for w in which:
        ntt._device_tables_mixed = tables_r4only if w.startswith("r4") else orig
        ntt._ntt_core_ax2 = _core_ax2_noperm if w.endswith("noperm") else orig_core
        run_variant(w)
    ntt._device_tables_mixed = orig
    ntt._ntt_core_ax2 = orig_core
