"""Interleaved A/B: baseline u32 four-step vs hybrid-u64-mul, same process,
alternating rounds, min-of-rounds per variant. Eliminates position bias."""
import sys, os
sys.path.insert(0, "/root/repo")
os.environ["TWENTY_FIRST_TPU_NTT_W64"] = "0"
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from twenty_first_tpu.math import ntt, gf, gf64

P = (1 << 64) - (1 << 32) + 1
log_n = 24
n = 1 << log_n
rng = np.random.default_rng(0)
x = rng.integers(0, P, size=n, dtype=np.uint64)
lo, hi = (jax.device_put(v) for v in gf.to_limbs(x))
diag = ntt._four_step_diag_device(log_n, False)


def mul_lazy_hybrid(a, b):
    return gf64.unpack(gf64.mul_lazy(gf64.pack(a), gf64.pack(b)))


_orig = gf.mul_lazy


def build(tag, hybrid):
    if hybrid:
        gf.mul_lazy = mul_lazy_hybrid
    else:
        gf.mul_lazy = _orig

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(a, b, dl, dh, k):
        o = (a, b)
        for _ in range(k):
            o = ntt.four_step_ntt_traceable(o, log_n, False, (dl, dh))
        return jnp.sum(o[0], dtype=jnp.uint32) + jnp.sum(o[1], dtype=jnp.uint32)

    # trace now (with the right monkeypatch state), compile both k
    for k in (2, 10):
        int(run(lo, hi, diag[0], diag[1], k=k))
    gf.mul_lazy = _orig
    return run


variants = {
    "baseline": build("baseline", False),
    "hyb-mul": build("hyb-mul", True),
}

results = {k: [] for k in variants}
for rnd in range(10):
    for name, run in variants.items():
        t0 = time.perf_counter(); int(run(lo, hi, diag[0], diag[1], k=2)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); int(run(lo, hi, diag[0], diag[1], k=10)); t3 = time.perf_counter() - t0
        results[name].append((t3 - t1) / 8)

for name, vals in results.items():
    best = min(vals)
    med = sorted(vals)[len(vals) // 2]
    print(f"{name}: min {best*1e3:.2f} ms  med {med*1e3:.2f} ms  -> {n/best/1e9:.2f}G elems/s", flush=True)
