"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: Goldilocks NTT 2^24 throughput (elements/s) on one chip.
Extras mirror the reference's criterion bench suite
(twenty-first/benches/*.rs): Tip5 hash_10 / hash_pair / hash_varlen /
65536-batch, Merkle commit heights 16/20 + auth-structure open/verify,
polynomial evaluate/interpolate/extrapolate/multiply/clean-divide/zerofier,
lattice KEM roundtrip, codec roundtrip.

Timing methodology: the remote-TPU tunnel in this environment makes
`block_until_ready` non-blocking and per-call readbacks expensive, so naive
per-call timing is dishonest in both directions. Device kernels are
therefore timed as a *k-fold chained application inside one jit* with an
in-graph checksum reduced to a scalar; the difference t(k_hi) - t(k_lo)
divided by (k_hi - k_lo) isolates pure device compute. Host-side benches
(the polynomial object API, KEM, codec) use plain wall timing — they ARE
host code.

The reference publishes no absolute numbers (BASELINE.md), so vs_baseline
is 1.0 against the empty published set. A persistent XLA compilation cache
(.jax_cache) makes repeat runs skip compilation.
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


def main():
    t_start = time.time()
    budget = float(os.environ.get("BENCH_BUDGET_S", "480"))

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

    rng = np.random.default_rng(0)
    p = (1 << 64) - (1 << 32) + 1
    extras = {"device": str(jax.devices()[0])}

    def remaining():
        return budget - (time.time() - t_start)

    def timed_chain(fn, args, k_lo, k_hi, reps=3):
        """min over reps of t(k_hi)-t(k_lo), divided by (k_hi-k_lo).

        Tunnel dispatch noise can exceed the device time of cheap kernels,
        making the difference go negative; in that case widen the k spread
        (more device work per call, same constant overhead) and retry, and
        as a last resort report min(t_hi)/k_hi — an upper bound, never a
        negative artifact."""
        def measure(k_lo, k_hi, reps):
            for k in (k_lo, k_hi):  # compile both variants
                int(fn(*args, k=k))
            lows, highs = [], []
            for _ in range(reps):
                t0 = time.perf_counter()
                int(fn(*args, k=k_lo))
                lows.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                int(fn(*args, k=k_hi))
                highs.append(time.perf_counter() - t0)
            return (min(highs) - min(lows)) / (k_hi - k_lo), min(highs)
        est, t_hi = measure(k_lo, k_hi, reps)
        if est <= 0 and remaining() > 60:
            k_hi2 = k_lo + 4 * (k_hi - k_lo)
            est, t_hi = measure(k_lo, k_hi2, reps)
            k_hi = k_hi2
        if est <= 0:
            est = t_hi / k_hi
        return est

    def timed_host(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    # --- headline: NTT 2^24 (four-step) ------------------------------------
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
    t_ntt = timed_chain(ntt_chain, (lo, hi, diag[0], diag[1]), 1, 3,
                        reps=4)
    ntt_elems_per_s = n / t_ntt
    extras[f"ntt_2^{log_n}_s"] = t_ntt

    # --- Merkle auth-structure open + verify (host path) -------------------
    if remaining() > 60:
        from twenty_first_tpu.util_types.merkle_tree import (
            MerkleTree, MerkleTreeInclusionProof)

        leafs16 = rng.integers(0, p, size=(1 << 10, 5), dtype=np.uint64)
        tree = MerkleTree.new(leafs16)
        indices = list(range(0, 1 << 10, 37))

        def open_and_verify():
            proof = tree.inclusion_proof_for_leaf_indices(indices)
            assert proof.verify(tree.root())

        _p("merkle auth start")
        extras["merkle_2^10_auth_open_verify_s"] = timed_host(open_and_verify)

    # --- polynomial suite (host object API over vectorized arrays) ---------
    if remaining() > 60:
        from twenty_first_tpu.math.polynomial import Polynomial
        from twenty_first_tpu.math.b_field_element import bfe

        deg = (1 << 14) - 1
        pa = Polynomial.from_array(
            rng.integers(0, p, size=deg + 1, dtype=np.uint64))
        pb = Polynomial.from_array(
            rng.integers(0, p, size=deg + 1, dtype=np.uint64))
        _p("poly suite start")
        extras["poly_multiply_deg_2^14_s"] = timed_host(
            lambda: pa.fast_multiply(pb))

        dom = rng.integers(1, p, size=1 << 10, dtype=np.uint64)
        dom = np.unique(dom)[: 1 << 9]
        vals = rng.integers(0, p, size=dom.shape[0], dtype=np.uint64)
        extras["poly_interpolate_2^9_s"] = timed_host(
            lambda: Polynomial.fast_interpolate(dom, vals), reps=2)

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

    if remaining() > 60:
        from twenty_first_tpu.math.polynomial import Polynomial
        from twenty_first_tpu.math.b_field_element import bfe

        codeword = rng.integers(0, p, size=1 << 18, dtype=np.uint64)
        # 2^10 points: the reference-parity extrapolation shape
        points = [bfe(int(v)) for v in
                  np.unique(rng.integers(1, p, size=1 << 11,
                                         dtype=np.uint64))[: 1 << 10]]
        _p("coset extrapolate start")
        # device barycentric form first (poly_batch): one lax.map dispatch,
        # closed-form coset weights — also warms the kernel the object API
        # dispatches to on accelerator backends
        from twenty_first_tpu.math import poly_batch

        pts_arr = np.array([q.value() for q in points], dtype=np.uint64)
        extras["device_coset_extrapolate_2^18_to_2^10_s"] = timed_host(
            lambda: poly_batch.batch_coset_extrapolate(
                codeword[None, :], 7, pts_arr), reps=2)

        extras["poly_coset_extrapolate_2^18_to_2^10_s"] = timed_host(
            lambda: Polynomial.coset_extrapolate(bfe(7), codeword, points),
            reps=1)

    # --- poly scale / scalar-mul / formal-power-series inverse (host) ------
    if remaining() > 45:
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
    if remaining() > 30:
        _p("ntt precompute start")

        def precompute_2_20():
            ntt._bit_reverse_permutation.cache_clear()
            ntt._twiddles_host.cache_clear()
            ntt._bit_reverse_permutation(20)
            ntt._twiddles_host(20, False)

        extras["ntt_table_precompute_2^20_s"] = timed_host(precompute_2_20,
                                                           reps=2)

    # --- Merkle auth-structure size (benches/..._auth_structure_size.rs) ---
    if remaining() > 30:
        from twenty_first_tpu.util_types.merkle_tree import MerkleTree

        leafs_a = rng.integers(0, p, size=(1 << 12, 5), dtype=np.uint64)
        tree_a = MerkleTree.new(leafs_a)
        idxs = list(range(0, 1 << 12, 1 << 7))  # 32 spread-out openings
        proof_a = tree_a.inclusion_proof_for_leaf_indices(idxs)
        extras["merkle_2^12_auth_structure_digests_32idx"] = len(
            proof_a.authentication_structure)

    # --- lattice KEM roundtrip ---------------------------------------------
    if remaining() > 30:
        from twenty_first_tpu.math import lattice

        seed = bytes(rng.integers(0, 256, size=32, dtype=np.uint8))

        def kem_roundtrip():
            sk, pk = lattice.keygen(seed)
            shared, ct = lattice.enc(pk, seed)
            assert lattice.dec(sk, ct) == shared

        _p("kem start")
        extras["kem_roundtrip_s"] = timed_host(kem_roundtrip)

    # --- codec roundtrip -----------------------------------------------------
    if remaining() > 20:
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

    # --- Tip5 permutation / hash_10 / hash_pair throughput ------------------
    if remaining() > 120:
        batch = 1 << 16  # the reference's parallel bench batch (tip5.rs)
        states = rng.integers(0, p, size=(batch, 16), dtype=np.uint64)
        slo, shi = (jax.device_put(v) for v in gf.to_limbs(states))

        @functools.partial(jax.jit, static_argnames=("k",))
        def perm_chain(a, b, k):
            def body(i, st):
                return tip5_dev.permutation(st)
            o = jax.lax.fori_loop(0, k, body, (a, b))
            return (jnp.sum(o[0], dtype=jnp.uint32)
                    + jnp.sum(o[1], dtype=jnp.uint32))

        _p("tip5 perm start")
        t_perm = timed_chain(perm_chain, (slo, shi), 1, 17)
        extras["tip5_permutations_per_s"] = batch / t_perm
        extras["tip5_hash_10_batch_65536_s"] = t_perm  # 1 permutation each
        extras["tip5_hash_pair_per_s"] = batch / t_perm

    # --- Tip5 hash_varlen (length 16386, reference bench shape) ------------
    if remaining() > 90:
        rows = 64
        data = rng.integers(0, p, size=(rows, 16386), dtype=np.uint64)
        padded = np.zeros((rows, 16390), dtype=np.uint64)
        padded[:, :16386] = data
        padded[:, 16386] = 1
        vlo, vhi = (jax.device_put(v) for v in gf.to_limbs(padded))

        @functools.partial(jax.jit, static_argnames=("k",))
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
        t_varlen = timed_chain(varlen_chain, (vlo, vhi), 1, 9)
        extras["tip5_hash_varlen_16386_s"] = t_varlen / rows

    # --- Merkle commit heights 16 / 20 (in-graph layered reduction) --------
    if remaining() > 90:
        from twenty_first_tpu.parallel import dist_merkle

        for height in (16, 20):
            if remaining() < 60:
                break
            leafs = rng.integers(0, p, size=(1 << height, 5), dtype=np.uint64)
            llo, lhi = (jax.device_put(v) for v in gf.to_limbs(leafs))

            @functools.partial(jax.jit, static_argnames=("k",))
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
            t_merkle = timed_chain(merkle_chain, (llo, lhi), 1, 5, reps=3)
            extras[f"merkle_2^{height}_commit_s"] = t_merkle

    # --- STARK LDE + commit pipeline (BASELINE config 4: 2^22-row commit) --
    if remaining() > 120:
        from twenty_first_tpu.parallel.pipeline import trace_lde_commit

        # extended-domain rows (default: trace n = 2^20 x 4 = 2^22 rows)
        lde_log_rows = int(os.environ.get("BENCH_LDE_LOG_ROWS", "22"))
        lde_w = 8                  # trace columns (<= RATE)
        tr = rng.integers(0, p, size=(lde_w, 1 << (lde_log_rows - 2)),
                          dtype=np.uint64)
        tlo, thi = (jax.device_put(v) for v in gf.to_limbs(tr))

        @functools.partial(jax.jit, static_argnames=("k",))
        def lde_chain(a, b, k):
            # carry-dependent input: prevents loop-invariant hoisting
            def body(i, acc):
                r = trace_lde_commit((a ^ acc[0], b), expansion=4)
                return (acc[0] ^ jnp.sum(r[0], dtype=jnp.uint32),
                        acc[1] + jnp.sum(r[1], dtype=jnp.uint32))
            o = jax.lax.fori_loop(
                0, k, body,
                (jnp.zeros((), jnp.uint32), jnp.zeros((), jnp.uint32)))
            return o[0] + o[1]

        _p("lde commit start")
        t_lde = timed_chain(lde_chain, (tlo, thi), 1, 3)
        extras[f"lde_commit_2^{lde_log_rows}_rows_w{lde_w}_s"] = t_lde


    # --- xfe NTT 2^18 (reference benches/ntt.rs xfe rows) -------------------
    if remaining() > 90:
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
        t_xntt = timed_chain(xntt_chain, (xlo, xhi, xdiag[0], xdiag[1]), 1, 9)
        extras[f"xfe_ntt_2^{xlog}_s"] = t_xntt

    # --- device batch inversion 2^20 (reference benches/inverses.rs) -------
    if remaining() > 90:
        inv_vals = rng.integers(1, p, size=1 << 20, dtype=np.uint64)
        ilo, ihi = (jax.device_put(v) for v in gf.to_limbs(inv_vals))

        @functools.partial(jax.jit, static_argnames=("k",))
        def inv_chain(a, b, k):
            def body(i, st):
                return gf.batch_inversion(st)
            o = jax.lax.fori_loop(0, k, body, (a, b))
            return (jnp.sum(o[0], dtype=jnp.uint32)
                    + jnp.sum(o[1], dtype=jnp.uint32))

        _p("batch inversion start")
        t_inv = timed_chain(inv_chain, (ilo, ihi), 1, 9)
        extras["batch_inversion_2^20_s"] = t_inv

    # --- device xfe multiply 2^20 (reference benches/various_muls.rs) ------
    if remaining() > 90:
        from twenty_first_tpu.math import gf_ext

        xa = rng.integers(0, p, size=(3, 1 << 20), dtype=np.uint64)
        xb = rng.integers(0, p, size=(3, 1 << 20), dtype=np.uint64)
        alo, ahi = (jax.device_put(v) for v in gf.to_limbs(xa))
        blo, bhi = (jax.device_put(v) for v in gf.to_limbs(xb))

        @functools.partial(jax.jit, static_argnames=("k",))
        def xmul_chain(al, ah, bl, bh, k):
            def body(i, st):
                return gf_ext.mul(st, (bl, bh))
            o = jax.lax.fori_loop(0, k, body, (al, ah))
            return (jnp.sum(o[0], dtype=jnp.uint32)
                    + jnp.sum(o[1], dtype=jnp.uint32))

        _p("xfe mul start")
        t_xmul = timed_chain(xmul_chain, (alo, ahi, blo, bhi), 1, 9)
        extras["xfe_mul_2^20_per_s"] = (1 << 20) / t_xmul

    _p("done; emitting")
    result = {
        "metric": f"ntt_2^{log_n}_goldilocks_elems_per_s_per_chip",
        "value": ntt_elems_per_s,
        "unit": "elements/s",
        "vs_baseline": 1.0,
        "extras": extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
