"""A/B the orderless (scrambled) convolution path vs the natural-order
round trip on real hardware (DESIGN.md §5 DIF row, wired round 3), at 2^22
and 2^24, interleaved medians. Also measures one-shot host-array conv
(transfer included) vs the host-native kernel to place the
HOST_CONV_MAX_ELEMS crossover.

Run on the TPU (no JAX_PLATFORMS override).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools, time
import numpy as np
import jax, jax.numpy as jnp

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from twenty_first_tpu.math import gf, ntt

P = (1 << 64) - (1 << 32) + 1
rng = np.random.default_rng(0)
print("device:", jax.devices()[0], flush=True)

for clog in (22, 24):
    ca = rng.integers(0, P, size=1 << clog, dtype=np.uint64)
    cb = rng.integers(0, P, size=1 << clog, dtype=np.uint64)
    calo, cahi = (jax.device_put(v) for v in gf.to_limbs(ca))
    fb = ntt.ntt_values(cb)
    tnlo, tnhi = (jax.device_put(v) for v in gf.to_limbs(fb))
    idx = ntt.scrambled_index(clog)
    tslo, tshi = (jax.device_put(v) for v in gf.to_limbs(fb[idx]))
    cdiag_f = ntt._four_step_diag_device(clog, False)
    cdiag_i = ntt._four_step_diag_device(clog, True)
    sdiag_f = ntt._scrambled_diag_device(clog, False)
    sdiag_i = ntt._scrambled_diag_device(clog, True)

    # diag tables MUST be jit ARGUMENTS: captured as constants they ride
    # the remote-compile request body (32 MB at 2^22 -> HTTP 413)
    @functools.partial(jax.jit, static_argnames=("k",))
    def nat(al, ah, tl, th, dfl, dfh, dil, dih, k, clog=clog):
        o = (al, ah)
        for _ in range(k):
            f = ntt.four_step_ntt_traceable(o, clog, False, (dfl, dfh))
            o = ntt.four_step_ntt_traceable(
                gf.mul(f, (tl, th)), clog, True, (dil, dih))
        return jnp.sum(o[0], dtype=jnp.uint32) + jnp.sum(o[1], dtype=jnp.uint32)

    @functools.partial(jax.jit, static_argnames=("k",))
    def scr(al, ah, tl, th, dfl, dfh, dil, dih, k, clog=clog):
        o = (al, ah)
        for _ in range(k):
            f = ntt.four_step_ntt_scrambled(o, clog, False, (dfl, dfh))
            o = ntt.four_step_ntt_scrambled(
                gf.mul(f, (tl, th)), clog, True, (dil, dih))
        return jnp.sum(o[0], dtype=jnp.uint32) + jnp.sum(o[1], dtype=jnp.uint32)

    nargs = (calo, cahi, tnlo, tnhi, cdiag_f[0], cdiag_f[1],
             cdiag_i[0], cdiag_i[1])
    sargs = (calo, cahi, tslo, tshi, sdiag_f[0], sdiag_f[1],
             sdiag_i[0], sdiag_i[1])
    for k in (1, 5):
        int(nat(*nargs, k=k))
        int(scr(*sargs, k=k))
    rn, rs = [], []
    for r in range(8):
        t0 = time.perf_counter(); int(nat(*nargs, k=1)); tl = time.perf_counter() - t0
        t0 = time.perf_counter(); int(nat(*nargs, k=5)); th = time.perf_counter() - t0
        rn.append((th - tl) / 4)
        t0 = time.perf_counter(); int(scr(*sargs, k=1)); tl = time.perf_counter() - t0
        t0 = time.perf_counter(); int(scr(*sargs, k=5)); th = time.perf_counter() - t0
        rs.append((th - tl) / 4)
    rn.sort(); rs.sort()
    print(f"2^{clog} conv round trip: natural med {rn[4]*1e3:.2f} ms, "
          f"scrambled med {rs[4]*1e3:.2f} ms "
          f"({(rn[4]-rs[4])/rn[4]:+.1%} saved)", flush=True)

# one-shot host-array conv crossover (transfer included)
print("one-shot conv_values e2e (host array in/out):", flush=True)
for clog in (16, 18, 20, 22):
    a = rng.integers(0, P, size=1 << clog, dtype=np.uint64)
    b = rng.integers(0, P, size=1 << clog, dtype=np.uint64)
    best_host, best_dev = 1e9, 1e9
    for _ in range(3):
        t0 = time.perf_counter(); ntt._conv_host(a, b, False, False)
        best_host = min(best_host, time.perf_counter() - t0)
    old = ntt.HOST_CONV_MAX_ELEMS
    ntt.HOST_CONV_MAX_ELEMS = 0
    try:
        ntt.conv_values(a, b)  # compile
        for _ in range(3):
            t0 = time.perf_counter(); ntt.conv_values(a, b)
            best_dev = min(best_dev, time.perf_counter() - t0)
    finally:
        ntt.HOST_CONV_MAX_ELEMS = old
    print(f"  2^{clog}: host {best_host*1e3:7.1f} ms   device e2e "
          f"{best_dev*1e3:7.1f} ms", flush=True)
