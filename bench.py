"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: Goldilocks NTT 2^24 throughput (elements/s) on one chip.
Extras mirror the reference's criterion bench suite
(twenty-first/benches/*.rs): Tip5 hash_10 / hash_pair / hash_varlen /
65536-batch, Merkle commit heights 16/20 (parallel analogue) + host-object
new/frugal_root rows (benches/merkle_tree.rs:10-40) + auth-structure
open/verify, polynomial evaluate/interpolate/extrapolate/multiply/
clean-divide/zerofier/mod-reduce/coset, xfe NTT (benches/ntt.rs:48-82),
batch inversion (benches/inverses.rs), bfe/xfe/mixed muls
(benches/various_muls.rs), lattice KEM roundtrip, codec roundtrip, and the
orderless-convolution delta rows (gather cancellation, DESIGN.md §5).

Timing methodology (see DESIGN.md §7): the remote-TPU tunnel makes
`block_until_ready` non-blocking and per-call readbacks expensive, AND the
shared device makes minima unstable (interference produced a measured
impossible 160M perms/s minimum once). Device kernels are therefore timed
as k-fold chained applications inside one jit with an in-graph scalar
checksum, interleaving the k_lo / k_hi calls, and reporting the MEDIAN of
the per-round differences (t_hi - t_lo)/(k_hi - k_lo) — the estimator
DESIGN.md's ablation record was built with. Host-side benches (the
polynomial object API, host Merkle, KEM, codec) use plain wall timing —
they ARE host code.

Every protocol row that cannot run inside the time budget is emitted as
"dropped:budget" instead of silently vanishing. A persistent XLA
compilation cache (.jax_cache) makes repeat runs skip compilation.

Two profiles (round-3 lesson: the full protocol takes ~3000 s warm and
overflowed the driver's 480 s budget AND its stdout tail-capture window,
leaving the official artifact unparseable):
  * driver profile (default): the headline + ~10 key rows, sized to
    finish well inside BENCH_BUDGET_S=480 warm. Everything else is
    recorded as "skipped:driver-profile" in the file artifact.
  * BENCH_FULL=1: the complete criterion-protocol mirror.
In BOTH profiles stdout carries ONE SMALL JSON line (<= 2048 bytes,
asserted) with only the whitelisted key rows; the complete extras dict is
written to BENCH_full.json (full profile) / BENCH_driver.json (driver
profile) next to this script.

The reference publishes no absolute numbers (BASELINE.md), so vs_baseline
is 1.0 against the empty published set.
"""

import functools
import json
import os
import sys
import time

import numpy as np

_T0 = time.time()


def _p(msg):
    """Progress marker on stderr (stdout stays the single JSON line)."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


# stdout whitelist: the key rows the driver's tail capture must always
# contain, most-important-last-dropped first. Everything else lives only
# in the file artifact.
_STDOUT_ROWS = (
    "ntt_2^24_s",
    "tip5_permutations_per_s",
    "merkle_2^20_commit_s",
    "lde_commit_2^22_rows_w8_s",
    "merkle_2^16_commit_s",
    "tip5_hash_varlen_16386_s",
    "xfe_ntt_2^18_s",
    "poly_multiply_deg_2^14_s",
    "pallas_hw_bit_exact",
    "claim_wait_s",
    "device",
    "profile",
    "elapsed_s",
)

_STDOUT_LIMIT = 2048


def main():
    t_start = time.time()
    budget = float(os.environ.get("BENCH_BUDGET_S", "480"))
    full = os.environ.get("BENCH_FULL", "0") == "1"

    import jax
    import jax.numpy as jnp

    try:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from twenty_first_tpu.math import gf, ntt
    from twenty_first_tpu.tip5 import permutation as tip5_dev

    # The axon tunnel can wedge with jax.devices() blocking indefinitely
    # (observed: >1 h with the claim loop never granted). A watchdog emits
    # a diagnostic JSON line instead of hanging the driver's bench step.
    import threading

    _init_done = threading.Event()

    def _watchdog():
        grace = float(os.environ.get("BENCH_DEVICE_INIT_TIMEOUT_S", "900"))
        if not _init_done.wait(grace):
            print(json.dumps({
                "metric": "ntt_2^24_goldilocks_elems_per_s_per_chip",
                "value": 0.0,
                "unit": "elements/s",
                "vs_baseline": 0.0,
                "extras": {"error": "device-init-timeout",
                           "detail": f"jax.devices() did not return within "
                                     f"{grace:.0f}s (tunnel wedged)"},
            }), flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    _p("device init start")
    rng = np.random.default_rng(0)
    p = (1 << 64) - (1 << 32) + 1
    import jaxlib

    extras = {
        "device": str(jax.devices()[0]),
        "profile": "full" if full else "driver",
        "versions": {"jax": jax.__version__,
                     "jaxlib": getattr(jaxlib, "__version__", "?")},
        "methodology": ("device rows: interleaved k-chain, median of "
                        "per-round differences; host rows: min wall-clock"),
    }
    # jax.devices() can return instantly with the real chip CLAIM deferred
    # to the first op — force it here so the watchdog covers the wedge,
    # and don't bill claim latency (observed up to ~390 s after a previous
    # long-running claimant) against the measurement budget.
    _t_claim = time.time()
    int(jax.jit(lambda v: v.sum())(jnp.arange(8, dtype=jnp.uint32)))
    claim_s = time.time() - _t_claim
    if claim_s > 30:
        extras["claim_wait_s"] = claim_s
        budget += min(claim_s, 420.0)
    _init_done.set()
    _p("device init done")
    dropped = []
    skipped_profile = []

    def remaining():
        return budget - (time.time() - t_start)

    def block(names, need):
        """Budget gate; on a drop, records every row the block would have
        produced as dropped:budget instead of silently omitting it."""
        if remaining() > need:
            return True
        if isinstance(names, str):
            names = [names]
        dropped.extend(names)
        return False

    def full_block(names, need):
        """Row(s) in the full protocol only: under the driver profile they
        are recorded as skipped:driver-profile in the file artifact."""
        if full:
            return block(names, need)
        if isinstance(names, str):
            names = [names]
        skipped_profile.extend(names)
        return False

    # Per-row physical lower bounds (round-4 weak item #2: the interleaved
    # difference estimator once emitted xfe_ntt_2^18_s = 49 µs, below the
    # repo's OWN roofline floor, and the artifact shipped it). Floors come
    # from the same models the artifact documents (roofline_ntt /
    # roofline_tip5): HBM-materialization-bound for NTT plans, VPU-op-bound
    # for Tip5-dominated rows — scaled by 0.7 so a genuinely fast kernel
    # near the model floor is never falsely tagged. A reading below its
    # floor is replaced by the documented upper-bound estimate and the row
    # is tagged `suspect:below-floor`; the floors used are committed in
    # extras["floors"] so CI can audit the artifact.
    _HBM_GBPS = 819e9      # v5e
    _VPU_U32_OPS = 1.5e12  # practical u32 op rate (roofline_tip5)
    floors = {}

    def ntt_floor(n_elems, mats=14):
        return 0.7 * mats * 16 * n_elems / _HBM_GBPS

    def tip5_floor(num_perms):
        return 0.7 * 42000 * num_perms / _VPU_U32_OPS

    def timed_chain(fn, args, k_lo, k_hi, reps=3, floor=None, row=None):
        """Median over reps of (t(k_hi)-t(k_lo))/(k_hi-k_lo), interleaved.

        Tunnel dispatch noise can exceed the device time of cheap kernels,
        making the difference go negative; in that case widen the k spread
        (more device work per call, same constant overhead) and retry, and
        as a last resort report median(t_hi)/k_hi — an upper bound, never
        a negative artifact.

        At most TWO executables per row, deterministically — ONE for the
        fori_loop-based chains (round-5 Weak-#6 fix: `k` is a dynamic
        argument there, so k_lo and k_hi share an executable; the
        python-unrolled NTT chains keep static k because fori_loop
        carries cost +60% on that graph shape, and pay two): through the
        tunnel, making an executable available (even a local .jax_cache
        HIT) costs tens of seconds of deserialize+upload per variant, so
        the round-3 "widen the k spread and retry" path — a third, even
        longer chain — cost far more than it saved and made run time
        noise-dependent (the round-3/4 driver overflows). The per-call
        dispatch+readback jitter is small and stable (measured 26±1 ms),
        so the configured spreads already dominate it; if a difference
        still comes out <= 0 — or below the row's physical floor — the
        upper bound is reported instead of compiling anything new."""
        for k in (k_lo, k_hi):  # the ONLY two variants this row ever runs
            int(fn(*args, k=k))
        diffs, highs = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            int(fn(*args, k=k_lo))
            tl = time.perf_counter() - t0
            t0 = time.perf_counter()
            int(fn(*args, k=k_hi))
            th = time.perf_counter() - t0
            diffs.append((th - tl) / (k_hi - k_lo))
            highs.append(th)
        diffs.sort()
        highs.sort()
        est = diffs[len(diffs) // 2]
        upper = highs[len(highs) // 2] / k_hi
        if est <= 0:
            est = upper
        if floor is not None and row is not None:
            floors[row] = floor
            if est < floor:
                extras[f"{row}_note"] = (
                    f"suspect:below-floor (diff-est {est:.3g}s < physical "
                    f"floor {floor:.3g}s; reporting the upper-bound "
                    f"estimate {upper:.3g}s instead)")
                est = upper
        return est

    def timed_host(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    # ======================================================================
    # headline: NTT 2^24 (four-step)  [benches/ntt.rs bfe rows, scaled up]
    # ======================================================================
    log_n = int(os.environ.get("BENCH_NTT_LOG_N", "24"))
    n = 1 << log_n
    x = rng.integers(0, p, size=n, dtype=np.uint64)
    lo, hi = (jax.device_put(v) for v in gf.to_limbs(x))
    diag = ntt._four_step_diag_device(log_n, False)

    @functools.partial(jax.jit, static_argnames=("k",))
    def ntt_chain(a, b, dlo, dhi, k):
        # python-unrolled chain (NOT fori_loop): while-loop carries insert
        # full-plane copies per iteration, measured +60% on the headline
        o = (a, b)
        for _ in range(k):
            o = ntt.four_step_ntt_traceable(o, log_n, False, (dlo, dhi))
        return jnp.sum(o[0], dtype=jnp.uint32) + jnp.sum(o[1], dtype=jnp.uint32)

    _p("headline ntt start")
    # reps=6: round-3's driver artifact showed 18.5 ms where the builder's
    # longer runs settle at ~9.8 ms — the first interleaved rounds after a
    # fresh claim run slow; more rounds let the median reach steady state.
    t_ntt = timed_chain(ntt_chain, (lo, hi, diag[0], diag[1]), 1, 3,
                        reps=6, floor=ntt_floor(n), row=f"ntt_2^{log_n}_s")
    ntt_elems_per_s = n / t_ntt
    extras[f"ntt_2^{log_n}_s"] = t_ntt

    # Roofline check for DESIGN.md's "~10 ms is the floor" claim: the
    # transform is HBM-materialization-bound — each butterfly layer's
    # interleave is a `concatenate` HLO that XLA:TPU does not fuse through,
    # so every layer pays one read+write of both u32 planes (16 B/elem).
    # Plan at 2^24: two local radix-4 passes of 6 layers each + one
    # bit-reverse gather per pass = 14 materializations.
    mats = 14
    extras["roofline_ntt"] = {
        "hbm_materializations": mats,
        "bytes_per_elem": 16 * mats,
        "implied_GBps": 16 * mats * n / t_ntt / 1e9,
        "hbm_peak_GBps": 819,  # v5e
        "per_layer_ms": t_ntt / mats * 1e3,
        "per_layer_floor_ms": 16 * n / 819e9 * 1e3,
    }

    # ======================================================================
    # device protocol rows (cheap; run BEFORE the heavy hash/LDE blocks)
    # ======================================================================

    # --- xfe NTT 2^18 (benches/ntt.rs xfe rows) -----------------------------
    if block("xfe_ntt_2^18_s", 60):
        xlog = 18
        xdata = rng.integers(0, p, size=(3, 1 << xlog), dtype=np.uint64)
        xlo, xhi = (jax.device_put(v) for v in gf.to_limbs(xdata))
        xdiag = ntt._four_step_diag_device(xlog, False)

        @functools.partial(jax.jit, static_argnames=("k",))
        def xntt_chain(a, b, dlo, dhi, k):
            o = (a, b)
            for _ in range(k):
                o = ntt.four_step_ntt_traceable(o, xlog, False, (dlo, dhi))
            return (jnp.sum(o[0], dtype=jnp.uint32)
                    + jnp.sum(o[1], dtype=jnp.uint32))

        _p("xfe ntt start")
        t_xntt = timed_chain(xntt_chain, (xlo, xhi, xdiag[0], xdiag[1]), 1, 9,
                             floor=ntt_floor(3 << xlog),
                             row="xfe_ntt_2^18_s")
        extras["xfe_ntt_2^18_s"] = t_xntt

    # --- device batch inversion 2^20 (benches/inverses.rs) ------------------
    if full_block("batch_inversion_2^20_s", 50):
        inv_vals = rng.integers(1, p, size=1 << 20, dtype=np.uint64)
        ilo, ihi = (jax.device_put(v) for v in gf.to_limbs(inv_vals))

        @jax.jit
        def inv_chain(a, b, k):
            def body(i, st):
                return gf.batch_inversion(st)
            o = jax.lax.fori_loop(0, k, body, (a, b))
            return (jnp.sum(o[0], dtype=jnp.uint32)
                    + jnp.sum(o[1], dtype=jnp.uint32))

        _p("batch inversion start")
        t_inv = timed_chain(inv_chain, (ilo, ihi), 1, 9)
        extras["batch_inversion_2^20_s"] = t_inv

    # --- device muls 2^20: bfe*bfe / xfe*xfe / xfe*bfe ----------------------
    # (benches/various_muls.rs)
    if full_block(["bfe_mul_2^20_per_s", "xfe_mul_2^20_per_s",
                   "xfe_bfe_mul_2^20_per_s"], 60):
        from twenty_first_tpu.math import gf_ext

        ba = rng.integers(0, p, size=1 << 20, dtype=np.uint64)
        blo2, bhi2 = (jax.device_put(v) for v in gf.to_limbs(ba))
        xa = rng.integers(0, p, size=(3, 1 << 20), dtype=np.uint64)
        xb = rng.integers(0, p, size=(3, 1 << 20), dtype=np.uint64)
        alo, ahi = (jax.device_put(v) for v in gf.to_limbs(xa))
        blo, bhi = (jax.device_put(v) for v in gf.to_limbs(xb))

        @jax.jit
        def bmul_chain(al, ah, bl, bh, k):
            def body(i, st):
                return gf.mul(st, (bl, bh))
            o = jax.lax.fori_loop(0, k, body, (al, ah))
            return (jnp.sum(o[0], dtype=jnp.uint32)
                    + jnp.sum(o[1], dtype=jnp.uint32))

        @jax.jit
        def xmul_chain(al, ah, bl, bh, k):
            def body(i, st):
                return gf_ext.mul(st, (bl, bh))
            o = jax.lax.fori_loop(0, k, body, (al, ah))
            return (jnp.sum(o[0], dtype=jnp.uint32)
                    + jnp.sum(o[1], dtype=jnp.uint32))

        @jax.jit
        def xbmul_chain(al, ah, bl, bh, k):
            def body(i, st):
                return gf_ext.mul_base(st, (bl, bh))
            o = jax.lax.fori_loop(0, k, body, (al, ah))
            return (jnp.sum(o[0], dtype=jnp.uint32)
                    + jnp.sum(o[1], dtype=jnp.uint32))

        _p("muls start")
        t_bmul = timed_chain(bmul_chain, (blo2, bhi2, blo2, bhi2), 1, 17)
        extras["bfe_mul_2^20_per_s"] = (1 << 20) / t_bmul
        t_xmul = timed_chain(xmul_chain, (alo, ahi, blo, bhi), 1, 9)
        extras["xfe_mul_2^20_per_s"] = (1 << 20) / t_xmul
        t_xbmul = timed_chain(xbmul_chain, (alo, ahi, blo2, bhi2), 1, 17)
        extras["xfe_bfe_mul_2^20_per_s"] = (1 << 20) / t_xbmul

    # ======================================================================
    # Tip5 permutation / hash_10 / hash_pair throughput (benches/tip5.rs)
    # ======================================================================
    if block(["tip5_permutations_per_s", "tip5_hash_10_batch_65536_s",
              "tip5_hash_pair_per_s"], 100):
        batch = 1 << 16  # the reference's parallel bench batch (tip5.rs)
        states = rng.integers(0, p, size=(batch, 16), dtype=np.uint64)
        slo, shi = (jax.device_put(v) for v in gf.to_limbs(states))

        @jax.jit
        def perm_chain(a, b, k):
            def body(i, st):
                return tip5_dev.permutation(st)
            o = jax.lax.fori_loop(0, k, body, (a, b))
            return (jnp.sum(o[0], dtype=jnp.uint32)
                    + jnp.sum(o[1], dtype=jnp.uint32))

        _p("tip5 perm start")
        # the k-spread and estimator behind DESIGN.md §4's sustained figure
        # measured with (scripts/tip5_w64_ab.py): k 2 vs 18, 8 rounds,
        # median of differences
        t_perm = timed_chain(perm_chain, (slo, shi), 2, 18, reps=8,
                             floor=tip5_floor(batch),
                             row="tip5_hash_10_batch_65536_s")
        # hash_10 / hash_pair report the FUSED-pipeline rate (XLA path —
        # what Merkle/LDE actually sustain); the standalone permutation row
        # reports the permutation_batch dispatch (lane-dense Pallas kernel
        # on TPU: 34.0M vs 23.1M perms/s standalone, loses fused — the
        # reference's parallel bench is the standalone shape, tip5.rs)
        extras["tip5_hash_10_batch_65536_s"] = t_perm  # 1 permutation each
        extras["tip5_hash_pair_per_s"] = batch / t_perm
        t_standalone = t_perm
        if jax.default_backend() == "tpu" and \
                os.environ.get("TWENTY_FIRST_TPU_DENSE_PERM", "1") != "0":
            @jax.jit
            def perm_chain_standalone(a, b, k):
                def body(i, st):
                    return tip5_dev.permutation_batch(st)
                o = jax.lax.fori_loop(0, k, body, (a, b))
                return (jnp.sum(o[0], dtype=jnp.uint32)
                        + jnp.sum(o[1], dtype=jnp.uint32))

            _p("tip5 standalone (dense dispatch) start")
            try:
                t_standalone = timed_chain(perm_chain_standalone,
                                           (slo, shi), 2, 18, reps=8,
                                           floor=tip5_floor(batch),
                                           row="tip5_permutation_batch_2^16_s")
                # Pallas hardware bit-exactness smoke, REUSING this row's
                # executable (each Mosaic-bearing executable costs ~100 s
                # of tunnel upload per run): the k=1 chain returns the
                # u32-wrapped plane checksum of permutation_batch(states),
                # reproduced independently on the host via the native
                # scalar core. A kernel producing any wrong word fails
                # the 2^16-state checksum with overwhelming probability.
                from twenty_first_tpu import native as _native

                if _native.available():
                    host_perm = _native.tip5_permute_batch(states)
                    hlo, hhi = gf.to_limbs(host_perm)
                    want_ck = int((int(hlo.sum(dtype=np.uint64))
                                   + int(hhi.sum(dtype=np.uint64)))
                                  % (1 << 32))
                    got_ck = int(perm_chain_standalone(slo, shi, 1))
                    extras["pallas_hw_bit_exact"] = bool(got_ck == want_ck)
                    extras["pallas_hw_method"] = \
                        "checksum-vs-native-host-oracle (2^16 states)"
            except Exception as exc:  # Mosaic compile regression: report
                extras["tip5_dense_dispatch"] = \
                    f"skipped:{type(exc).__name__}"
                t_standalone = t_perm
        extras["tip5_permutation_batch_2^16_s"] = t_standalone
        extras["tip5_permutations_per_s"] = batch / t_standalone
        extras["roofline_tip5"] = {
            # static count from the kernel structure (DESIGN.md §4): per
            # round ~1.4k u32 ops of pow7 (12 words x 4 gl_mul), ~0.5k of
            # byte S-box, ~2.5k of digit-plane MDS + reduction; x5 rounds
            "u32_ops_per_perm_est": 42000,
            "achieved_u32_ops_per_s": 42000 * batch / t_standalone,
            "vpu_practical_u32_ops_per_s": 1.5e12,
        }

    # --- Tip5 hash_varlen (length 16386, reference bench shape) ------------
    if block("tip5_hash_varlen_16386_s", 80):
        rows = 64
        data = rng.integers(0, p, size=(rows, 16386), dtype=np.uint64)
        padded = np.zeros((rows, 16390), dtype=np.uint64)
        padded[:, :16386] = data
        padded[:, 16386] = 1
        vlo, vhi = (jax.device_put(v) for v in gf.to_limbs(padded))

        @jax.jit
        def varlen_chain(a, b, k):
            # carry-dependent input: prevents loop-invariant hoisting
            def body(i, acc):
                o = tip5_dev.hash_varlen_padded((a ^ acc[0], b))
                return (acc[0] ^ jnp.sum(o[0], dtype=jnp.uint32),
                        acc[1] + jnp.sum(o[1], dtype=jnp.uint32))
            o = jax.lax.fori_loop(
                0, k, body,
                (jnp.zeros((), jnp.uint32), jnp.zeros((), jnp.uint32)))
            return o[0] + o[1]

        _p("tip5 varlen start")
        t_varlen = timed_chain(varlen_chain, (vlo, vhi), 1, 9,
                               floor=tip5_floor(rows * 1640),
                               row="tip5_hash_varlen_16386_batch_s")
        extras["tip5_hash_varlen_16386_batch_s"] = t_varlen
        extras["tip5_hash_varlen_16386_s"] = t_varlen / rows

    # ======================================================================
    # Merkle (benches/merkle_tree.rs:10-40 + auth structure)
    # ======================================================================

    # --- device in-graph commit heights 16/20: par_new analogue ------------
    if True:
        from twenty_first_tpu.parallel import dist_merkle

        # height 16 is full-profile-only since round 5: its Mosaic-bearing
        # executable costs ~35 s of tunnel upload per run, and the 2^20
        # row already pins the packed-commit path in the driver profile
        for height in (16, 20):
            gate = block if height == 20 else full_block
            if not gate(f"merkle_2^{height}_commit_s",
                        60 if height == 16 else 90):
                continue
            leafs = rng.integers(0, p, size=(1 << height, 5), dtype=np.uint64)
            llo, lhi = (jax.device_put(v) for v in gf.to_limbs(leafs))

            @functools.partial(jax.jit, static_argnames=("height",))
            def merkle_chain(a, b, k, height=height):
                # the input must DEPEND on the carry or XLA hoists the
                # whole reduction out of the loop (loop-invariant code
                # motion) and the k-chain measures one iteration
                def body(i, acc):
                    r = dist_merkle._reduce_layers((a ^ acc[0], b), height)
                    return (acc[0] ^ jnp.sum(r[0], dtype=jnp.uint32),
                            acc[1] + jnp.sum(r[1], dtype=jnp.uint32))
                o = jax.lax.fori_loop(
                    0, k, body,
                    (jnp.zeros((), jnp.uint32), jnp.zeros((), jnp.uint32)))
                return o[0] + o[1]

            _p(f"merkle {height} start")
            t_merkle = timed_chain(merkle_chain, (llo, lhi), 1, 5, reps=3,
                                   floor=tip5_floor(1 << height),
                                   row=f"merkle_2^{height}_commit_s")
            extras[f"merkle_2^{height}_commit_s"] = t_merkle

    # --- host object API: new / frugal_root (the reference's 4 bench
    #     groups; par_* == sequential_* here — the native layer hashing is
    #     OpenMP-parallel, the device path is lane-parallel) ---------------
    if full_block(["merkle_new_2^16_s", "merkle_root_frugal_2^16_s"], 40):
        from twenty_first_tpu.util_types.merkle_tree import MerkleTree

        leafs16 = rng.integers(0, p, size=(1 << 16, 5), dtype=np.uint64)
        _p("merkle host 16 start")
        extras["merkle_new_2^16_s"] = timed_host(
            lambda: MerkleTree.new(leafs16), reps=2)
        extras["merkle_root_frugal_2^16_s"] = timed_host(
            lambda: MerkleTree.frugal_root(leafs16), reps=2)

    if full_block(["merkle_new_2^20_s", "merkle_root_frugal_2^20_s"], 40):
        from twenty_first_tpu.util_types.merkle_tree import MerkleTree

        leafs20 = rng.integers(0, p, size=(1 << 20, 5), dtype=np.uint64)
        _p("merkle host 20 start")
        extras["merkle_new_2^20_s"] = timed_host(
            lambda: MerkleTree.new(leafs20), reps=1)
        extras["merkle_root_frugal_2^20_s"] = timed_host(
            lambda: MerkleTree.frugal_root(leafs20), reps=1)

    # --- Merkle auth-structure open + verify (host path) -------------------
    if full_block("merkle_2^10_auth_open_verify_s", 30):
        from twenty_first_tpu.util_types.merkle_tree import MerkleTree

        leafs_o = rng.integers(0, p, size=(1 << 10, 5), dtype=np.uint64)
        tree = MerkleTree.new(leafs_o)
        indices = list(range(0, 1 << 10, 37))

        def open_and_verify():
            proof = tree.inclusion_proof_for_leaf_indices(indices)
            assert proof.verify(tree.root())

        _p("merkle auth start")
        extras["merkle_2^10_auth_open_verify_s"] = timed_host(open_and_verify)

    # --- Merkle auth-structure size (benches/..._auth_structure_size.rs) ---
    if full_block("merkle_2^12_auth_structure_digests_32idx", 25):
        from twenty_first_tpu.util_types.merkle_tree import MerkleTree

        leafs_a = rng.integers(0, p, size=(1 << 12, 5), dtype=np.uint64)
        tree_a = MerkleTree.new(leafs_a)
        idxs = list(range(0, 1 << 12, 1 << 7))  # 32 spread-out openings
        proof_a = tree_a.inclusion_proof_for_leaf_indices(idxs)
        extras["merkle_2^12_auth_structure_digests_32idx"] = len(
            proof_a.authentication_structure)

    # ======================================================================
    # polynomial suite (host object API over vectorized arrays)
    # ======================================================================
    # multiply is the driver profile's representative poly row; the rest
    # of the suite is full-profile
    if block("poly_multiply_deg_2^14_s", 25):
        from twenty_first_tpu.math.polynomial import Polynomial

        deg = (1 << 14) - 1
        pa = Polynomial.from_array(
            rng.integers(0, p, size=deg + 1, dtype=np.uint64))
        pb = Polynomial.from_array(
            rng.integers(0, p, size=deg + 1, dtype=np.uint64))
        _p("poly multiply start")
        extras["poly_multiply_deg_2^14_s"] = timed_host(
            lambda: pa.fast_multiply(pb))

    if full_block(["poly_interpolate_2^9_s", "poly_interpolate_2^10_s",
                   "poly_interpolate_2^15_s",
                   "poly_batch_evaluate_2^14_on_2^14_s",
                   "poly_batch_evaluate_2^12_on_2^9_s", "poly_zerofier_2^9_s",
                   "poly_clean_divide_2^12_s"], 50):
        from twenty_first_tpu.math.polynomial import Polynomial
        from twenty_first_tpu.math.b_field_element import bfe

        _p("poly suite start")
        dom = rng.integers(1, p, size=1 << 10, dtype=np.uint64)
        dom = np.unique(dom)[: 1 << 9]
        vals = rng.integers(0, p, size=dom.shape[0], dtype=np.uint64)
        extras["poly_interpolate_2^9_s"] = timed_host(
            lambda: Polynomial.fast_interpolate(dom, vals), reps=2)

        # reference interpolation.rs sizes (benches/interpolation.rs:13-14)
        # and the evaluation.rs headline shape (benches/evaluation.rs:13)
        for lg in (10, 15):
            domb = np.unique(rng.integers(
                1, p, size=(1 << lg) + (1 << (lg - 2)),
                dtype=np.uint64))[: 1 << lg]
            valsb = rng.integers(0, p, size=1 << lg, dtype=np.uint64)
            extras[f"poly_interpolate_2^{lg}_s"] = timed_host(
                lambda d=domb, v=valsb: Polynomial.fast_interpolate(d, v),
                reps=2)
        dom14 = np.unique(rng.integers(
            1, p, size=(1 << 14) + (1 << 12),
            dtype=np.uint64))[: 1 << 14]
        p14 = Polynomial.from_array(
            rng.integers(0, p, size=1 << 14, dtype=np.uint64))
        extras["poly_batch_evaluate_2^14_on_2^14_s"] = timed_host(
            lambda: p14._remainder_tree_eval(dom14), reps=2)

        pdeg = Polynomial.from_array(
            rng.integers(0, p, size=1 << 12, dtype=np.uint64))
        extras["poly_batch_evaluate_2^12_on_2^9_s"] = timed_host(
            lambda: pdeg.batch_evaluate([bfe(int(v)) for v in dom]), reps=2)

        extras["poly_zerofier_2^9_s"] = timed_host(
            lambda: Polynomial.zerofier([bfe(int(v)) for v in dom]), reps=2)

        divisor = Polynomial.zerofier([bfe(int(v)) for v in dom[:64]])
        product = pdeg * divisor
        extras["poly_clean_divide_2^12_s"] = timed_host(
            lambda: product.clean_divide(divisor), reps=2)

    # --- coset extrapolation (polynomial.rs:2117-2331) ----------------------
    if full_block(["device_coset_extrapolate_2^18_to_2^10_s",
                   "poly_coset_extrapolate_dispatch_2^18_to_2^10_s"], 60):
        from twenty_first_tpu.math.polynomial import Polynomial
        from twenty_first_tpu.math.b_field_element import bfe

        codeword = rng.integers(0, p, size=1 << 18, dtype=np.uint64)
        # 2^10 points: the reference-parity extrapolation shape
        points = [bfe(int(v)) for v in
                  np.unique(rng.integers(1, p, size=1 << 11,
                                         dtype=np.uint64))[: 1 << 10]]
        _p("coset extrapolate start")
        # the device kernel (poly_batch coefficient route) — also warms the
        # kernel the object API dispatches to on accelerator backends
        from twenty_first_tpu.math import poly_batch

        pts_arr = np.array([q.value() for q in points], dtype=np.uint64)
        extras["device_coset_extrapolate_2^18_to_2^10_s"] = timed_host(
            lambda: poly_batch.batch_coset_extrapolate(
                codeword[None, :], 7, pts_arr), reps=2)

        # same computation through the object API: measures the dispatch +
        # conversion overhead over the device row above, not a second kernel
        extras["poly_coset_extrapolate_dispatch_2^18_to_2^10_s"] = timed_host(
            lambda: Polynomial.coset_extrapolate(bfe(7), codeword, points),
            reps=1)

    # --- poly scale / scalar-mul / fps inverse / mod-reduce / coset --------
    if full_block(["poly_scale_2^14_s", "poly_scalar_mul_2^14_s",
                   "poly_fps_inverse_2^10_s", "poly_mod_reduce_2^14_by_2^9_s",
                   "poly_fast_coset_evaluate_2^16_s",
                   "poly_fast_coset_interpolate_2^16_s"], 45):
        from twenty_first_tpu.math.polynomial import Polynomial
        from twenty_first_tpu.math.b_field_element import bfe

        ps = Polynomial.from_array(
            rng.integers(0, p, size=1 << 14, dtype=np.uint64))
        alpha = bfe(1234567891011)
        _p("poly scale start")
        extras["poly_scale_2^14_s"] = timed_host(lambda: ps.scale(alpha))
        extras["poly_scalar_mul_2^14_s"] = timed_host(
            lambda: ps.scalar_mul(alpha))
        extras["poly_fps_inverse_2^10_s"] = timed_host(
            lambda: ps.formal_power_series_inverse_newton(1 << 10), reps=2)

        # mod-reduce (benches/poly_mod_reduce.rs shape)
        modp = Polynomial.from_array(
            rng.integers(0, p, size=(1 << 9) + 1, dtype=np.uint64))
        extras["poly_mod_reduce_2^14_by_2^9_s"] = timed_host(
            lambda: ps.reduce(modp), reps=2)

        # coset evaluate / interpolate (benches/polynomial_coset.rs)
        cofs = rng.integers(0, p, size=1 << 16, dtype=np.uint64)
        pco = Polynomial.from_array(cofs)
        extras["poly_fast_coset_evaluate_2^16_s"] = timed_host(
            lambda: pco.fast_coset_evaluate(bfe(7), 1 << 16), reps=2)
        cw16 = rng.integers(0, p, size=1 << 16, dtype=np.uint64)
        extras["poly_fast_coset_interpolate_2^16_s"] = timed_host(
            lambda: Polynomial.fast_coset_interpolate(bfe(7), cw16), reps=2)

    # --- NTT table precompute (benches/ntt.rs:33-46) ------------------------
    if full_block("ntt_table_precompute_2^20_s", 25):
        _p("ntt precompute start")

        def precompute_2_20():
            ntt._bit_reverse_permutation.cache_clear()
            ntt._twiddles_host.cache_clear()
            ntt._bit_reverse_permutation(20)
            ntt._twiddles_host(20, False)

        extras["ntt_table_precompute_2^20_s"] = timed_host(precompute_2_20,
                                                           reps=2)

    # --- lattice KEM roundtrip ---------------------------------------------
    if full_block("kem_roundtrip_s", 25):
        from twenty_first_tpu.math import lattice

        seed = bytes(rng.integers(0, 256, size=32, dtype=np.uint8))

        def kem_roundtrip():
            sk, pk = lattice.keygen(seed)
            shared, ct = lattice.enc(pk, seed)
            assert lattice.dec(sk, ct) == shared

        _p("kem start")
        extras["kem_roundtrip_s"] = timed_host(kem_roundtrip)

    # --- codec roundtrip -----------------------------------------------------
    if full_block("codec_roundtrip_2^10_s", 15):
        from twenty_first_tpu.math.bfield_codec import BFE, Vec_, encode
        from twenty_first_tpu.math.b_field_element import bfe

        vec = [bfe(int(v)) for v in
               rng.integers(0, p, size=1 << 10, dtype=np.uint64)]
        vec_codec = Vec_(BFE)

        def codec_roundtrip():
            enc = encode(vec)
            assert vec_codec.decode(vec_codec.encode(vec)) == vec
            assert enc is not None

        _p("codec start")
        extras["codec_roundtrip_2^10_s"] = timed_host(codec_roundtrip)

    # --- Pallas kernels: per-element bit-exactness on real HW --------------
    # Full profile only: the driver profile gets the zero-extra-executable
    # checksum form above (each Mosaic-bearing executable costs ~100 s of
    # tunnel upload per run); this block compares every output word.
    if "pallas_hw_bit_exact" not in extras and \
            full_block("pallas_hw_bit_exact", 40):
        _p("pallas hw smoke start")
        try:
            if jax.default_backend() == "cpu":
                extras["pallas_hw_bit_exact"] = "skipped:cpu-backend"
            else:
                from twenty_first_tpu.ops import tip5_pallas
                from twenty_first_tpu.tip5 import permutation as jnp_perm

                # the PROMOTED grid-free lane-dense kernel (the tunnel
                # rejects grids, so the narrow grid kernel would always
                # report skipped:mosaic-aot-tunnel; this checks the kernel
                # production actually dispatches to). The oracle side runs
                # on the HOST (native scalar core) — every device
                # executable costs tens of seconds of tunnel upload.
                from twenty_first_tpu import native
                from twenty_first_tpu.tip5.tip5 import _permute_values

                st = rng.integers(0, p, size=(4096, 16), dtype=np.uint64)
                if native.available():
                    want = native.tip5_permute_batch(st)
                else:
                    want = np.array([_permute_values([int(v) for v in row])
                                     for row in st], dtype=np.uint64)
                got = np.asarray(tip5_pallas.permutation_dense_values(st))
                extras["pallas_hw_bit_exact"] = bool(
                    np.array_equal(got, want))
                del jnp_perm
        except Exception as e:  # Mosaic availability varies by backend
            # The axon tunnel's compile service rejects Mosaic AOT
            # requests (HTTP 500/UNIMPLEMENTED); that is a documented
            # environment limitation, not a kernel bug — report it as a
            # structured skip so the artifact stays auditable, and keep
            # the first line of the underlying error for forensics.
            msg = f"{type(e).__name__}: {e}".splitlines()[0]
            lowered = msg.lower()
            if any(tok in lowered for tok in
                   ("mosaic", "custom_call", "unimplemented", "500",
                    "tpu_custom_call", "not supported")):
                extras["pallas_hw_bit_exact"] = "skipped:mosaic-aot-tunnel"
            else:
                extras["pallas_hw_bit_exact"] = f"error:{type(e).__name__}"
            extras["pallas_hw_detail"] = msg[:300]

    # ======================================================================
    # orderless-convolution delta (DESIGN.md §5 DIF row): full NTT round
    # trip with a prepared table, natural order (pays the bit-reverse
    # gathers) vs scrambled order (pays none). Measured on v5e the
    # scrambled variant LOSES 5-6% (the removed gathers are the cheap
    # major-axis kind), so production conv uses natural order; these rows
    # keep the comparison pinned in every artifact.
    # ======================================================================
    if full_block(["ntt_conv_2^22_natural_s", "ntt_conv_2^22_scrambled_s"], 60):
        clog = 22
        ca = rng.integers(0, p, size=1 << clog, dtype=np.uint64)
        cb = rng.integers(0, p, size=1 << clog, dtype=np.uint64)
        calo, cahi = (jax.device_put(v) for v in gf.to_limbs(ca))
        fb_nat = ntt.ntt_values(cb)
        tnlo, tnhi = (jax.device_put(v) for v in gf.to_limbs(fb_nat))
        idx = ntt.scrambled_index(clog)
        tslo, tshi = (jax.device_put(v) for v in gf.to_limbs(fb_nat[idx]))
        cdiag_f = ntt._four_step_diag_device(clog, False)
        cdiag_i = ntt._four_step_diag_device(clog, True)
        sdiag_f = ntt._scrambled_diag_device(clog, False)
        sdiag_i = ntt._scrambled_diag_device(clog, True)

        # diag tables as jit ARGUMENTS — captured constants ride the
        # remote-compile request body (32 MB at 2^22 -> HTTP 413)
        @functools.partial(jax.jit, static_argnames=("k",))
        def conv_nat_chain(al, ah, tl, th, dfl, dfh, dil, dih, k):
            o = (al, ah)
            for _ in range(k):
                f = ntt.four_step_ntt_traceable(o, clog, False, (dfl, dfh))
                o = ntt.four_step_ntt_traceable(
                    gf.mul(f, (tl, th)), clog, True, (dil, dih))
            return (jnp.sum(o[0], dtype=jnp.uint32)
                    + jnp.sum(o[1], dtype=jnp.uint32))

        @functools.partial(jax.jit, static_argnames=("k",))
        def conv_scr_chain(al, ah, tl, th, dfl, dfh, dil, dih, k):
            o = (al, ah)
            for _ in range(k):
                f = ntt.four_step_ntt_scrambled(o, clog, False, (dfl, dfh))
                o = ntt.four_step_ntt_scrambled(
                    gf.mul(f, (tl, th)), clog, True, (dil, dih))
            return (jnp.sum(o[0], dtype=jnp.uint32)
                    + jnp.sum(o[1], dtype=jnp.uint32))

        _p("conv delta start")
        t_nat = timed_chain(
            conv_nat_chain,
            (calo, cahi, tnlo, tnhi, cdiag_f[0], cdiag_f[1],
             cdiag_i[0], cdiag_i[1]), 1, 5)
        t_scr = timed_chain(
            conv_scr_chain,
            (calo, cahi, tslo, tshi, sdiag_f[0], sdiag_f[1],
             sdiag_i[0], sdiag_i[1]), 1, 5)
        extras["ntt_conv_2^22_natural_s"] = t_nat
        extras["ntt_conv_2^22_scrambled_s"] = t_scr

    # ======================================================================
    # STARK LDE + commit pipeline (BASELINE config 4: 2^22-row commit)
    # ======================================================================
    if block("lde_commit_2^22_rows_w8_s", 70):
        from twenty_first_tpu.parallel.pipeline import (
            lde_commit_diags, trace_lde_commit)

        # extended-domain rows (default: trace n = 2^20 x 4 = 2^22 rows)
        lde_log_rows = int(os.environ.get("BENCH_LDE_LOG_ROWS", "22"))
        lde_w = 8                  # trace columns (<= RATE)
        lde_n = 1 << (lde_log_rows - 2)
        tr = rng.integers(0, p, size=(lde_w, lde_n), dtype=np.uint64)
        tlo, thi = (jax.device_put(v) for v in gf.to_limbs(tr))
        # four-step diagonals as jit args (compile-payload rule)
        inv_d, fwd_d = lde_commit_diags(lde_n, 4)
        z1 = jnp.zeros((1,), jnp.uint32)
        inv_d = inv_d or (z1, z1)
        fwd_d = fwd_d or (z1, z1)

        @functools.partial(jax.jit,
                           static_argnames=("use_inv", "use_fwd"))
        def lde_chain(a, b, il, ih, fl, fh, k, use_inv=True, use_fwd=True):
            diags = ((il, ih) if use_inv else None,
                     (fl, fh) if use_fwd else None)
            # carry-dependent input: prevents loop-invariant hoisting
            def body(i, acc):
                r = trace_lde_commit((a ^ acc[0], b), expansion=4,
                                     ntt_diags=diags)
                return (acc[0] ^ jnp.sum(r[0], dtype=jnp.uint32),
                        acc[1] + jnp.sum(r[1], dtype=jnp.uint32))
            o = jax.lax.fori_loop(
                0, k, body,
                (jnp.zeros((), jnp.uint32), jnp.zeros((), jnp.uint32)))
            return o[0] + o[1]

        _p("lde commit start")
        from twenty_first_tpu.parallel.pipeline import lde_commit_diags as _d
        real_inv, real_fwd = _d(lde_n, 4)
        t_lde = timed_chain(
            functools.partial(lde_chain, use_inv=real_inv is not None,
                              use_fwd=real_fwd is not None),
            (tlo, thi, inv_d[0], inv_d[1], fwd_d[0], fwd_d[1]), 1, 3,
            # hash-bound: ~2^(rows) leaf perms + 2^(rows) Merkle perms
            floor=tip5_floor(2 << lde_log_rows),
            row=f"lde_commit_2^{lde_log_rows}_rows_w8_s")
        extras[f"lde_commit_2^{lde_log_rows}_rows_w8_s"] = t_lde

    for name in dropped:
        if name and name not in extras:
            extras[name] = "dropped:budget"
    for name in skipped_profile:
        if name and name not in extras:
            extras[name] = "skipped:driver-profile"

    elapsed = time.time() - t_start
    extras["elapsed_s"] = round(elapsed, 1)
    extras["budget_s"] = budget
    extras["floors"] = floors
    # Floor-sanity invariant (auditable by CI): a floored row's committed
    # value is never below its physical floor unless tagged suspect.
    for row, fl in floors.items():
        v = extras.get(row)
        if isinstance(v, float) and v < fl:
            assert f"{row}_note" in extras, (
                f"row {row} = {v} below floor {fl} without a suspect tag")

    # Complete extras -> file artifact (the stdout line must stay small).
    here = os.path.dirname(os.path.abspath(__file__))
    artifact = "BENCH_full.json" if full else "BENCH_driver.json"
    full_result = {
        "metric": f"ntt_2^{log_n}_goldilocks_elems_per_s_per_chip",
        "value": ntt_elems_per_s,
        "unit": "elements/s",
        "vs_baseline": 1.0,
        "extras": extras,
    }
    try:
        with open(os.path.join(here, artifact), "w") as f:
            json.dump(full_result, f, indent=1)
            f.write("\n")
        _p(f"full extras written to {artifact}")
    except OSError as e:
        _p(f"could not write {artifact}: {e}")

    # Small stdout line: whitelisted key rows only, trimmed (least
    # important first) until it fits the driver's tail-capture window.
    stdout_rows = (f"ntt_2^{log_n}_s",) + _STDOUT_ROWS[1:] \
        if log_n != 24 else _STDOUT_ROWS
    small_extras = {k: extras[k] for k in stdout_rows if k in extras}
    small_extras["full_extras_file"] = artifact
    result = dict(full_result, extras=small_extras)
    line = json.dumps(result)
    for k in reversed(stdout_rows):
        if len(line) <= _STDOUT_LIMIT:
            break
        small_extras.pop(k, None)
        line = json.dumps(result)
    assert len(line) <= _STDOUT_LIMIT, (
        f"stdout line {len(line)} B exceeds the {_STDOUT_LIMIT} B "
        f"tail-capture guarantee even after trimming")
    billed = elapsed - (claim_s if claim_s > 30 else 0.0)
    if not full and billed > float(os.environ.get("BENCH_BUDGET_S", "480")):
        _p(f"WARNING: billed time {billed:.0f}s exceeded the driver "
           f"budget — tighten the driver profile")
    _p(f"done; emitting {len(line)} B")
    print(line)


if __name__ == "__main__":
    main()
