"""Batch-first polynomial ops on device (limb planes).

The scalar `Polynomial` class (math/polynomial.py) mirrors the reference's
object API; this module is the TPU-native throughput path operating on
whole batches of polynomials as uint64/limb arrays — the layer a STARK
prover actually drives (SURVEY §7: "batch-first APIs"):

  * batch_ntt / batch_intt            (rows, n) transforms
  * batch_coset_evaluate / interpolate  low-degree extension on a coset
  * batch_multiply                    pointwise-NTT products
  * batch_evaluate_barycentric        codeword-form evaluation at a point
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import gf
from . import gf_numpy as gfn
from . import ntt as ntt_mod
from .b_field_element import GENERATOR, P, PRIMITIVE_ROOTS


def _pow_row(base: int, n: int):
    return gfn.powers(base, n)


def batch_ntt(values: np.ndarray, inverse: bool = False) -> np.ndarray:
    """(rows, n) uint64 -> row-wise (i)NTT."""
    return ntt_mod.ntt_values(values, inverse=inverse)


def batch_intt(values: np.ndarray) -> np.ndarray:
    return ntt_mod.ntt_values(values, inverse=True)


def batch_coset_evaluate(coefficients: np.ndarray, order: int,
                         offset: int = GENERATOR) -> np.ndarray:
    """Row-wise low-degree extension: evaluate each row's polynomial on the
    coset offset * <omega_order>. coefficients: (rows, k) with k <= order."""
    coefficients = np.asarray(coefficients, dtype=np.uint64)
    rows, k = coefficients.shape
    assert k <= order and order & (order - 1) == 0
    scaled = gfn.mul(coefficients, _pow_row(offset, k)[None, :])
    padded = np.zeros((rows, order), dtype=np.uint64)
    padded[:, :k] = scaled
    return ntt_mod.ntt_values(padded)


def batch_coset_interpolate(codewords: np.ndarray,
                            offset: int = GENERATOR) -> np.ndarray:
    """Inverse of batch_coset_evaluate: (rows, order) -> coefficients."""
    codewords = np.asarray(codewords, dtype=np.uint64)
    order = codewords.shape[-1]
    coeffs = ntt_mod.ntt_values(codewords, inverse=True)
    offset_inv = pow(int(offset), P - 2, P)
    return gfn.mul(coeffs, _pow_row(offset_inv, order)[None, :])


def batch_multiply(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise polynomial products via NTT.

    a: (rows, da+1), b: (rows, db+1) -> (rows, da+db+1)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    rows = a.shape[0]
    assert b.shape[0] == rows
    out_len = a.shape[1] + b.shape[1] - 1
    n = 1 << (out_len - 1).bit_length()
    pa = np.zeros((rows, n), dtype=np.uint64)
    pb = np.zeros((rows, n), dtype=np.uint64)
    pa[:, : a.shape[1]] = a
    pb[:, : b.shape[1]] = b
    fa = gf.to_limbs(ntt_mod.ntt_values(pa))
    fb = gf.to_limbs(ntt_mod.ntt_values(pb))
    prod = gf.from_limbs(gf.mul(fa, fb))
    return ntt_mod.ntt_values(prod, inverse=True)[:, :out_len]


def batch_evaluate_barycentric(codewords: np.ndarray, point: int) -> np.ndarray:
    """Evaluate each row's interpolant (over <omega_n>) at `point` using the
    barycentric formula (polynomial.rs:2587-2638), fully on device.

    Requires `point` outside the domain. codewords: (rows, n) -> (rows,)."""
    codewords = np.asarray(codewords, dtype=np.uint64)
    rows, n = codewords.shape
    domain = _pow_row(PRIMITIVE_ROOTS[n], n)
    z = np.full(n, point % P, dtype=np.uint64)
    diffs = gf.to_limbs(gfn.sub(z, domain))
    inv = gf.batch_inversion(diffs)
    weights = gf.mul(gf.to_limbs(domain), inv)  # d_i / (z - d_i)
    cw = gf.to_limbs(codewords)
    wl = jnp.broadcast_to(weights[0], cw[0].shape)
    wh = jnp.broadcast_to(weights[1], cw[1].shape)
    terms = gf.mul(cw, (wl, wh))
    # sum rows in the field: fold via prefix (log-depth) addition
    num = _row_field_sum(terms)
    den_all = _row_field_sum((weights[0][None, :], weights[1][None, :]))
    den_inv = gf.inverse_or_zero(den_all)
    out = gf.mul(num, (jnp.broadcast_to(den_inv[0], num[0].shape),
                       jnp.broadcast_to(den_inv[1], num[1].shape)))
    return gf.from_limbs(out)


def batch_coset_extrapolate(codewords: np.ndarray, offset: int,
                            points: np.ndarray,
                            point_chunk: int = 64,
                            use_jit: bool = True) -> np.ndarray:
    """Extrapolate codeword rows over the coset `offset * <omega_n>` to
    arbitrary OUT-OF-DOMAIN points, fully on device — the STARK
    out-of-domain-sampling hot path (reference dispatch:
    polynomial.rs:2117-2331; the host object API's
    `Polynomial.coset_extrapolate` mirrors it).

    Uses the closed-form barycentric weights of a coset domain: with
    Z(X) = X^n - offset^n and d_i = offset*omega^i,

        f(z) = Z(z) / (n * offset^n) * sum_i c_i * d_i / (z - d_i),

    so each point costs one batched inversion row + one weighted fold —
    no interpolation, O(n) per point, batched over codeword rows AND
    points. codewords: (rows, n); points: (m,) -> (rows, m).

    Bit-exact vs interpolate-then-evaluate for points outside the coset
    (in-domain points hit a zero denominator — use the codeword entry)."""
    cw = np.asarray(codewords, dtype=np.uint64)
    rows, n = cw.shape
    pts = np.asarray(points, dtype=np.uint64) % np.uint64(P)
    m = pts.shape[0]
    off = int(offset) % P
    domain = gfn.mul(_pow_row(PRIMITIVE_ROOTS[n], n), np.uint64(off))
    off_n = pow(off, n, P)
    # per-point scale (z^n - offset^n) / (n * offset^n), vectorized host
    zn = np.ones(m, dtype=np.uint64)
    base = pts.copy()
    e = n
    while e:
        if e & 1:
            zn = gfn.mul(zn, base)
        e >>= 1
        if e:
            base = gfn.mul(base, base)
    scale = gfn.mul(gfn.sub(zn, np.uint64(off_n)),
                    np.uint64(pow(n * off_n % P, P - 2, P)))
    cw_dev = gf.to_limbs(cw)
    dom_dev = gf.to_limbs(domain)
    if use_jit and m > point_chunk:
        # ONE dispatch: lax.map over point chunks (each chunk's working
        # set stays bounded); pad the point count to a chunk multiple
        pad = (-m) % point_chunk
        zp = np.concatenate([pts, np.ones(pad, dtype=np.uint64)])
        sp = np.concatenate([scale, np.zeros(pad, dtype=np.uint64)])
        nch = zp.shape[0] // point_chunk
        out = _coset_extrapolate_mapped(
            cw_dev, dom_dev,
            gf.to_limbs(zp.reshape(nch, point_chunk)),
            gf.to_limbs(sp.reshape(nch, point_chunk)))
        return gf.from_limbs(out)[:, :m]
    out = np.empty((rows, m), dtype=np.uint64)
    for start in range(0, m, point_chunk):
        zc = pts[start: start + point_chunk]
        sc = scale[start: start + point_chunk]
        chunk = _coset_extrapolate_chunk(
            cw_dev, dom_dev, gf.to_limbs(zc), gf.to_limbs(sc),
            use_jit=use_jit)
        out[:, start: start + point_chunk] = gf.from_limbs(chunk)
    return out


def _coset_extrapolate_core(cl, ch, dl, dh, zl, zh, sl, sh):
    """Device core: codeword limb planes (rows, n), domain (n,), point
    chunk (c,), per-point scales (c,) -> (rows, c) values."""
    c = zl.shape[0]
    n = dl.shape[0]
    diffs = gf.sub((jnp.broadcast_to(zl[:, None], (c, n)),
                    jnp.broadcast_to(zh[:, None], (c, n))),
                   (dl[None, :], dh[None, :]))
    inv = gf.batch_inversion(diffs)          # 1/(z_j - d_i)
    w = gf.mul(inv, (dl[None, :], dh[None, :]))  # d_i/(z_j - d_i)
    terms = gf.mul((cl[:, None, :], ch[:, None, :]),
                   (w[0][None], w[1][None]))     # (rows, c, n)
    num = _row_field_sum(terms)                  # (rows, c)
    return gf.mul(num, (jnp.broadcast_to(sl[None, :], num[0].shape),
                        jnp.broadcast_to(sh[None, :], num[1].shape)))


def batch_coset_extrapolate_xfe(codewords: np.ndarray, offset: int,
                                points: np.ndarray,
                                point_chunk: int = 16,
                                use_jit: bool = True) -> np.ndarray:
    """Extrapolate codeword rows to EXTENSION-FIELD points on device — the
    actual STARK out-of-domain-sampling shape (base-field trace columns
    sampled at an xfe challenge; x_field_element.rs lift semantics).

    codewords: (rows, n) base-field or (rows, n, 3) extension-field values;
    points: (m, 3) xfe values, all outside the lifted coset domain.
    Returns (rows, m, 3). Same closed-form coset-weight identity as
    batch_coset_extrapolate, with the divided differences, inversions and
    folds in the extension field (gf_ext)."""
    from . import gf_ext
    from . import xgf_numpy as xgf

    cw = np.asarray(codewords, dtype=np.uint64)
    cw_x = cw.ndim == 3
    rows, n = cw.shape[0], cw.shape[1]
    pts = np.asarray(points, dtype=np.uint64) % np.uint64(P)
    m = pts.shape[0]
    off = int(offset) % P
    domain = gfn.mul(_pow_row(PRIMITIVE_ROOTS[n], n), np.uint64(off))
    off_n = pow(off, n, P)
    # host: scale_j = (z_j^n - offset^n) / (n * offset^n) in the extension
    zn = np.zeros((m, 3), dtype=np.uint64)
    zn[:, 0] = 1
    base = pts.copy()
    e = n
    while e:
        if e & 1:
            zn = xgf.mul(zn, base)
        e >>= 1
        if e:
            base = xgf.mul(base, base)
    zn[:, 0] = gfn.sub(zn[:, 0], np.uint64(off_n))
    scale = xgf.mul_base(zn, np.uint64(pow(n * off_n % P, P - 2, P)))
    # device layouts: codewords (rows[,3],n) with component axis -2;
    # points/scales as (m, 3) limb pairs
    if cw_x:
        cw_dev = gf.to_limbs(np.ascontiguousarray(np.swapaxes(cw, 1, 2)))
    else:
        cw_dev = gf.to_limbs(cw)
    dom_dev = gf.to_limbs(domain)
    pad = (-m) % point_chunk
    zp = np.concatenate([pts, np.ones((pad, 3), dtype=np.uint64)])
    sp = np.concatenate([scale, np.zeros((pad, 3), dtype=np.uint64)])
    nch = zp.shape[0] // point_chunk
    args = (cw_dev, dom_dev,
            gf.to_limbs(zp.reshape(nch, point_chunk, 3)),
            gf.to_limbs(sp.reshape(nch, point_chunk, 3)), cw_x)
    if use_jit:
        out = _coset_extrapolate_xfe_mapped(*args)
    else:
        chunks = [
            _coset_extrapolate_core_xfe(
                cw_dev[0], cw_dev[1], dom_dev[0], dom_dev[1],
                args[2][0][i], args[2][1][i], args[3][0][i], args[3][1][i],
                cw_x)
            for i in range(nch)
        ]
        out = (jnp.concatenate([c[0] for c in chunks], axis=1),
               jnp.concatenate([c[1] for c in chunks], axis=1))
    vals = gf.from_limbs(out)  # (rows, nch*point_chunk, 3)
    return vals[:, :m]


def _coset_extrapolate_core_xfe(cl, ch, dl, dh, zl, zh, sl, sh,
                                cw_x: bool):
    """Device core, extension-field points: codeword limb planes
    ((rows, n) base or (rows, 3, n) xfe), domain (n,), point chunk (c, 3),
    scales (c, 3) -> (rows, c, 3) values."""
    from . import gf_ext

    c = zl.shape[0]
    n = dl.shape[0]
    d_b = (dl[None, :], dh[None, :])
    # diffs (c, 3, n): component 0 is z0 - d_i; components 1, 2 broadcast
    c0 = gf.sub((jnp.broadcast_to(zl[:, 0, None], (c, n)),
                 jnp.broadcast_to(zh[:, 0, None], (c, n))), d_b)
    diffs = (
        jnp.stack([c0[0],
                   jnp.broadcast_to(zl[:, 1, None], (c, n)),
                   jnp.broadcast_to(zl[:, 2, None], (c, n))], axis=-2),
        jnp.stack([c0[1],
                   jnp.broadcast_to(zh[:, 1, None], (c, n)),
                   jnp.broadcast_to(zh[:, 2, None], (c, n))], axis=-2),
    )
    inv = gf_ext.batch_inversion(diffs, axis=-1)      # (c, 3, n)
    w = gf_ext.mul_base(inv, (dl, dh))                # d_i/(z_j - d_i)
    if cw_x:
        terms = gf_ext.mul((w[0][None], w[1][None]),
                           (cl[:, None], ch[:, None]))  # (rows, c, 3, n)
    else:
        terms = gf.mul((w[0][None], w[1][None]),
                       (cl[:, None, None, :], ch[:, None, None, :]))
    num = _row_field_sum(terms)                       # (rows, c, 3)
    out = gf_ext.mul((num[0][..., None], num[1][..., None]),
                     (sl[None, :, :, None], sh[None, :, :, None]))
    return out[0][..., 0], out[1][..., 0]


_coset_extrapolate_xfe_map_jit = {}


def _coset_extrapolate_xfe_mapped(cw, dom, zcs, scs, cw_x: bool):
    """All xfe point chunks in one dispatch (lax.map over the chunk axis).
    zcs/scs: (nch, c, 3) limb pairs -> (rows, nch*c, 3) limb pair."""
    key = bool(cw_x)
    if key not in _coset_extrapolate_xfe_map_jit:
        import jax

        def run(cl, ch, dl, dh, zls, zhs, sls, shs, _cw_x=key):
            def body(args):
                zl, zh, sl, sh = args
                return _coset_extrapolate_core_xfe(cl, ch, dl, dh, zl, zh,
                                                   sl, sh, _cw_x)

            ol, oh = jax.lax.map(body, (zls, zhs, sls, shs))
            # (nch, rows, c, 3) -> (rows, nch*c, 3)
            ol = jnp.moveaxis(ol, 0, 1)
            oh = jnp.moveaxis(oh, 0, 1)
            return (ol.reshape(ol.shape[0], -1, 3),
                    oh.reshape(oh.shape[0], -1, 3))

        _coset_extrapolate_xfe_map_jit[key] = jax.jit(run)
    return _coset_extrapolate_xfe_map_jit[key](
        cw[0], cw[1], dom[0], dom[1], zcs[0], zcs[1], scs[0], scs[1])


# one stable jit wrapper: per-shape executables cache inside it (a fresh
# jit object per call would recompile every chunk)
_coset_extrapolate_jit = None
_coset_extrapolate_map_jit = None


def _coset_extrapolate_mapped(cw, dom, zcs, scs):
    """All point chunks in one dispatch: lax.map over the chunk axis.

    zcs/scs: (nch, c) limb pairs -> (rows, nch*c) limb pair."""
    global _coset_extrapolate_map_jit
    if _coset_extrapolate_map_jit is None:
        import jax

        def run(cl, ch, dl, dh, zls, zhs, sls, shs):
            def body(args):
                zl, zh, sl, sh = args
                return _coset_extrapolate_core(cl, ch, dl, dh, zl, zh,
                                               sl, sh)

            ol, oh = jax.lax.map(body, (zls, zhs, sls, shs))
            # (nch, rows, c) -> (rows, nch*c)
            ol = jnp.moveaxis(ol, 0, 1)
            oh = jnp.moveaxis(oh, 0, 1)
            return (ol.reshape(ol.shape[0], -1),
                    oh.reshape(oh.shape[0], -1))

        _coset_extrapolate_map_jit = jax.jit(run)
    return _coset_extrapolate_map_jit(
        cw[0], cw[1], dom[0], dom[1], zcs[0], zcs[1], scs[0], scs[1])


def _coset_extrapolate_chunk(cw, dom, zc, sc, use_jit: bool = True):
    # use_jit=False runs the ops eagerly: XLA:CPU's LLVM backend takes
    # minutes on the fully-unrolled inversion-chain graph (the TPU
    # compiler takes seconds) — tests on the CPU backend pass False
    global _coset_extrapolate_jit
    if not use_jit:
        return _coset_extrapolate_core(
            cw[0], cw[1], dom[0], dom[1], zc[0], zc[1], sc[0], sc[1])
    if _coset_extrapolate_jit is None:
        import jax

        _coset_extrapolate_jit = jax.jit(_coset_extrapolate_core)
    return _coset_extrapolate_jit(
        cw[0], cw[1], dom[0], dom[1], zc[0], zc[1], sc[0], sc[1])


def _row_field_sum(x):
    """Field sum along the last (power-of-two) axis via log-depth halving."""
    lo, hi = x
    n = lo.shape[-1]
    assert n & (n - 1) == 0 and n > 0
    while n > 1:
        half = n // 2
        lo, hi = gf.add(
            (lo[..., :half], hi[..., :half]),
            (lo[..., half:], hi[..., half:]),
        )
        n = half
    return lo[..., 0], hi[..., 0]
