"""DIF (Gentleman-Sande) NTT stages: natural-order input, bit-reversed
output, NO input gather. Prototype + equivalence check + 2^24 timing.

Identity under test: take(DIF_stages(x), bitrev, axis=-2) == DIT core
output (which equals the reference NTT). The four-step then needs ONE
final combined (rows x lanes) un-reverse gather instead of two per-pass
input gathers.
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from twenty_first_tpu.math import gf, ntt  # noqa: E402


def _radix4_dif_ax2(x, tq, m, n, inverse, trivial):
    """Radix-4 DIF butterfly at stride m over axis -2 (blocks of 4m).

    Adjoint of the DIT butterfly with the same (t, t2, t3) tables. The DIT
    butterfly reads its q-indexed inputs from slots (0, 2, 1, 3); the DIF
    transpose therefore WRITES its q-indexed outputs to slots (0, 2, 1, 3):
        s0 = a + c, s1 = b + d, d0 = a - c, d1 = i*(b - d)
        slot0 = s0 + s1              (q=0)
        slot1 = (s0 - s1) * t2       (q=2)
        slot2 = (d0 + d1) * t        (q=1)
        slot3 = (d0 - d1) * t3       (q=3)
    """
    lo, hi = x
    batch = lo.shape[:-2]
    w = lo.shape[-1]
    shape = batch + (n // (4 * m), 4, m, w)
    lo = lo.reshape(shape)
    hi = hi.reshape(shape)
    a = (lo[..., 0, :, :], hi[..., 0, :, :])
    b = (lo[..., 1, :, :], hi[..., 1, :, :])
    c = (lo[..., 2, :, :], hi[..., 2, :, :])
    d = (lo[..., 3, :, :], hi[..., 3, :, :])
    s0 = gf.add_lazy(a, c)
    s1 = gf.add_lazy(b, d)
    d0 = gf.sub_lazy(a, c)
    d1 = gf.mul_by_i_lazy(gf.sub_lazy(b, d), inverse)
    y0 = gf.add_lazy(s0, s1)
    y1 = gf.sub_lazy(s0, s1)
    y2 = gf.add_lazy(d0, d1)
    y3 = gf.sub_lazy(d0, d1)
    if not trivial:
        t, t2, t3 = (ntt._tw_ax2(v) for v in tq)
        y1 = gf.mul_lazy(y1, t2)
        y2 = gf.mul_lazy(y2, t)
        y3 = gf.mul_lazy(y3, t3)
    out_shape = batch + (n, w)
    return (
        jnp.stack([y0[0], y1[0], y2[0], y3[0]], axis=-3).reshape(out_shape),
        jnp.stack([y0[1], y1[1], y2[1], y3[1]], axis=-3).reshape(out_shape),
    )


def _radix2_last_dif_ax2(x, n):
    lo, hi = x
    batch = lo.shape[:-2]
    w = lo.shape[-1]
    shape = batch + (n // 2, 2, w)
    lo = lo.reshape(shape)
    hi = hi.reshape(shape)
    u = (lo[..., 0, :], hi[..., 0, :])
    v = (lo[..., 1, :], hi[..., 1, :])
    top = gf.add_lazy(u, v)
    bot = gf.sub_lazy(u, v)
    out_shape = batch + (n, w)
    return (
        jnp.stack([top[0], bot[0]], axis=-2).reshape(out_shape),
        jnp.stack([top[1], bot[1]], axis=-2).reshape(out_shape),
    )


def dif_stages_ax2(st, log_n, inverse):
    """DIF stages on NATURAL-order input; output bit-reversed, lazy."""
    _, plan = ntt._device_tables_mixed(log_n, inverse, radix8=False)
    n = st[0].shape[-2]
    for kind, tabs, m, trivial in reversed(plan):
        if kind == "r2":
            st = _radix2_last_dif_ax2(st, n)
        else:
            st = _radix4_dif_ax2(st, tabs, m, n, inverse, trivial)
    return st


def main():
    p = (1 << 64) - (1 << 32) + 1
    rng = np.random.default_rng(0)

    # --- equivalence: take(DIF out, bitrev) == DIT core ---------------------
    for log_n in (4, 5, 6, 8):
        n, w = 1 << log_n, 8
        data = rng.integers(0, p, size=(n, w), dtype=np.uint64)
        lo, hi = gf.to_limbs(data)
        perm = ntt._bit_reverse_permutation(log_n)
        for inv in (False, True):
            ref = jax.jit(lambda a, b, l=log_n, i=inv:
                          ntt._ntt_core_ax2((a, b), l, i))(lo, hi)
            dif = jax.jit(lambda a, b, l=log_n, i=inv:
                          gf.canon(dif_stages_ax2((a, b), l, i)))(lo, hi)
            got = (np.asarray(dif[0])[perm], np.asarray(dif[1])[perm])
            ok = (np.array_equal(got[0], np.asarray(ref[0]))
                  and np.array_equal(got[1], np.asarray(ref[1])))
            print(f"log_n={log_n} inv={inv}: {ok}", flush=True)
            assert ok, (log_n, inv)
    print("equivalence OK", flush=True)


if __name__ == "__main__":
    main()
