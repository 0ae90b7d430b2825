"""Piece-run NTT stage experiment.

Hypothesis (from the round-2 ablations): each butterfly layer costs TWO
full HBM round trips — one multi-output arithmetic fusion (the four y_q
quarter tensors, twiddle muls shared) plus one unfused `concatenate` that
interleaves them (0.62 ms/layer at 2^24 = 2 x 268 MB at ~865 GB/s = peak).

Escape: keep the four radix-4 outputs as SEPARATE "piece" tensors for a
run of L consecutive layers. Each later layer in the run slices its
butterfly inputs directly out of the pieces (strided row slices — fusible),
so the interleave is never materialized inside the run; ONE concatenate
per run reassembles. Movement: (L+1) passes per L layers instead of 2L.

Usage (TPU): python scripts/prof_pieces.py [log_n]
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from twenty_first_tpu.math import gf, ntt  # noqa: E402


def _split_rows(x, m0):
    """(..., R*m0, w) -> four (..., R//4*m0, w) row-group slices."""
    R = x.shape[-2] // m0
    x = x.reshape(x.shape[:-2] + (R // 4, 4, m0) + x.shape[-1:])
    return [x[..., q, :, :].reshape(x.shape[:-4] + (R // 4 * m0,) + x.shape[-1:])
            for q in range(4)]


def _r4_layer_pieces(pieces, tq, m0, pow4, inverse, trivial):
    """One radix-4 DIT layer applied per piece; pieces stay separate.

    pieces: list of (kappa, (lo, hi)); arrays (..., R*m0, w).
    tq: (t, t2, t3) full-length numpy limb pairs for this layer (len 4**l*m0)
        or None when trivial.
    pow4: 4**l = number of existing kappa values (twiddle slice stride).
    """
    new = []
    for kappa, (plo, phi) in pieces:
        alo, blo, clo, dlo = _split_rows(plo, m0)
        ahi, bhi, chi, dhi = _split_rows(phi, m0)
        a, b, c, d = (alo, ahi), (blo, bhi), (clo, chi), (dlo, dhi)
        if trivial:
            u1, u2, u3 = c, b, d
        else:
            off = kappa * m0

            def sl(pair):
                return (jnp.asarray(pair[0][off:off + m0])[:, None],
                        jnp.asarray(pair[1][off:off + m0])[:, None])

            def bmul(x, tw):
                # broadcast twiddle (m0, 1) over (..., R*m0, w): reshape piece
                # to (..., R, m0, w) for the mul, back to flat after
                xl, xh = x
                R4 = xl.shape[-2] // m0
                x3 = (xl.reshape(xl.shape[:-2] + (R4, m0) + xl.shape[-1:]),
                      xh.reshape(xh.shape[:-2] + (R4, m0) + xh.shape[-1:]))
                ol, oh = gf.mul_lazy(x3, tw)
                return (ol.reshape(xl.shape), oh.reshape(xh.shape))

            u1 = bmul(c, sl(tq[0]))
            u2 = bmul(b, sl(tq[1]))
            u3 = bmul(d, sl(tq[2]))
        e0 = gf.add_lazy(a, u2)
        e1 = gf.sub_lazy(a, u2)
        o0 = gf.add_lazy(u1, u3)
        o1 = gf.mul_by_i_lazy(gf.sub_lazy(u1, u3), inverse)
        ys = (gf.add_lazy(e0, o0), gf.add_lazy(e1, o1),
              gf.sub_lazy(e0, o0), gf.sub_lazy(e1, o1))
        for q, y in enumerate(ys):
            new.append((q * pow4 + kappa, y))
    return new


def _assemble(pieces, m0):
    """Interleave pieces back into one (..., n, w) pair (ONE concat)."""
    pieces = sorted(pieces, key=lambda kv: kv[0])
    outs = []
    for plane in range(2):
        parts = []
        for _, pair in pieces:
            x = pair[plane]
            Rm = x.shape[-2]
            parts.append(x.reshape(x.shape[:-2] + (Rm // m0, 1, m0)
                                   + x.shape[-1:]))
        cat = jnp.concatenate(parts, axis=-3)
        n = cat.shape[-4] * cat.shape[-3] * cat.shape[-2]
        outs.append(cat.reshape(cat.shape[:-4] + (n,) + cat.shape[-1:]))
    return tuple(outs)


def ntt_stages_ax2_runs(st, log_n, inverse, runs):
    """Axis(-2) butterfly stages on bit-reversed input, grouped into piece
    runs. runs: tuple of run lengths summing to the number of r4 layers."""
    _, plan = ntt._device_tables_mixed(log_n, inverse, radix8=False)
    assert all(k == "r4" for k, _, _, _ in plan), "odd log_n not supported"
    assert sum(runs) == len(plan)
    li = 0
    for run in runs:
        if run == 1:
            kind, tabs, m, trivial = plan[li]
            st = ntt._radix4_true_ax2(st, tabs, m, st[0].shape[-2], inverse,
                                      trivial=trivial)
            li += 1
            continue
        m0 = plan[li][2]
        pieces = [(0, st)]
        for l in range(run):
            _, tabs, m, trivial = plan[li]
            pieces = _r4_layer_pieces(pieces, None if trivial else tabs,
                                      m0, 4 ** l, inverse, trivial)
            li += 1
        st = _assemble(pieces, m0)
    return st


def core_runs(x, log_n, inverse, runs):
    perm, _ = ntt._device_tables_mixed(log_n, inverse, radix8=False)
    lo, hi = x
    lo = jnp.take(lo, perm, axis=-2)
    hi = jnp.take(hi, perm, axis=-2)
    return gf.canon(ntt_stages_ax2_runs((lo, hi), log_n, inverse, runs))


def main():
    p = (1 << 64) - (1 << 32) + 1
    rng = np.random.default_rng(0)

    # --- correctness: 2^12 single-slab vs the stock core -------------------
    n = 1 << 12
    w = 8
    data = rng.integers(0, p, size=(n, w), dtype=np.uint64)
    lo, hi = gf.to_limbs(data)
    ref = jax.jit(lambda a, b: ntt._ntt_core_ax2((a, b), 12, False))(lo, hi)
    for runs in ((1, 1, 1, 1, 1, 1), (2, 2, 2), (3, 3), (2, 3, 1), (1, 2, 3)):
        got = jax.jit(functools.partial(core_runs, log_n=12, inverse=False,
                                        runs=runs))((lo, hi))
        ok = (np.array_equal(np.asarray(got[0]), np.asarray(ref[0]))
              and np.array_equal(np.asarray(got[1]), np.asarray(ref[1])))
        print(f"runs={runs}: correct={ok}")
        assert ok

    # --- timing: local pass over the 2^24 four-step shape ------------------
    # matrix (4096, 4096) slab-mapped at 128 lanes, like _local_pass
    log_loc = 12
    nn = 1 << log_loc
    wfull = nn
    data = rng.integers(0, p, size=(nn, wfull), dtype=np.uint64)
    lo, hi = (jax.device_put(v) for v in gf.to_limbs(data))

    def local_pass(a, b, runs):
        nslab = wfull // 128

        def to_slabs(t):
            t = t.reshape(t.shape[:-1] + (nslab, 128))
            return jnp.moveaxis(t, -2, 0)

        def body(args):
            return core_runs(args, log_loc, False, runs)

        olo, ohi = jax.lax.map(body, (to_slabs(a), to_slabs(b)))
        olo = jnp.moveaxis(olo, 0, -2).reshape(a.shape)
        ohi = jnp.moveaxis(ohi, 0, -2).reshape(b.shape)
        return olo, ohi

    def timed(runs, k_lo=1, k_hi=3, reps=3):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(a, b, k):
            o = (a, b)
            for _ in range(k):
                o = local_pass(o[0], o[1], runs)
            return (jnp.sum(o[0], dtype=jnp.uint32)
                    + jnp.sum(o[1], dtype=jnp.uint32))

        for k in (k_lo, k_hi):
            int(chain(lo, hi, k))
        lows, highs = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            int(chain(lo, hi, k_lo))
            lows.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            int(chain(lo, hi, k_hi))
            highs.append(time.perf_counter() - t0)
        return (min(highs) - min(lows)) / (k_hi - k_lo)

    for runs in ((1, 1, 1, 1, 1, 1), (2, 2, 2), (3, 3), (2, 3, 1),
                 (1, 2, 3), (2, 2, 1, 1)):
        t = timed(runs)
        print(f"local pass 4096x4096 runs={runs}: {t * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
