import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from twenty_first_tpu.math import ntt, gf

P = (1 << 64) - (1 << 32) + 1
rng = np.random.default_rng(0)
LOG_N = 24
N = 1 << LOG_N
vals = rng.integers(0, P, size=N, dtype=np.uint64)
lo, hi = gf.to_limbs(vals)

print("device:", jax.devices()[0], flush=True)

def timed(fn, args, k_lo=1, k_hi=5, reps=3):
    for k in (k_lo, k_hi): int(fn(*args, k=k))
    lows, highs = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); int(fn(*args, k=k_lo)); lows.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); int(fn(*args, k=k_hi)); highs.append(time.perf_counter()-t0)
    return (min(highs)-min(lows))/(k_hi-k_lo)

def checksum(lo, hi):
    return (jnp.sum(lo.astype(jnp.uint64)) + jnp.sum(hi.astype(jnp.uint64))).astype(jnp.uint64)

t1, diag, row_perm = ntt._three_step_tables_device(LOG_N, False)

@functools.partial(jax.jit, static_argnames=("k",))
def run3(lo, hi, t1l, t1h, dl, dh, k):
    for _ in range(k):
        lo, hi = ntt.three_step_ntt_traceable((lo, hi), LOG_N, False, (t1l, t1h), (dl, dh), row_perm)
    return checksum(lo, hi)

# correctness spot-check vs two-step on device
d2 = ntt._four_step_diag_device(LOG_N, False)
ref = ntt._jitted_four_step(LOG_N, False)(lo, hi, d2[0], d2[1])
got = ntt._jitted_three_step(LOG_N, False)(lo, hi, t1[0], t1[1], diag[0], diag[1])
ok = bool(jnp.array_equal(ref[0], got[0]) & jnp.array_equal(ref[1], got[1]))
print("three-step matches two-step at 2^24:", ok, flush=True)

t = timed(run3, (lo, hi, t1[0], t1[1], diag[0], diag[1]))
print(f"three-step 2^24: {t*1e3:.2f} ms ({N/t/1e9:.2f}G elems/s)", flush=True)
