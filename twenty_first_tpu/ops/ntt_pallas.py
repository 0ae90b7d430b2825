"""Pallas TPU kernel: fused-stage column NTT for the four-step transform.

The XLA butterfly implementation materializes the full array every stage
(~2 passes over HBM per stage, ~24 stages at 2^24). This kernel runs ALL
log2(n_local) stages of a local transform in VMEM: the (n_local, TC) tile
is read once, transformed in registers/VMEM, written once.

Key layout choice: the transform runs along the MAJOR axis (axis 0) of a
(n_local, TC) tile with the batch/free index on the lanes. Every butterfly
stage is then a major-axis reshape (free in row-major tiling) plus
non-minor slicing — no lane-granularity constraints at any stage size, and
the per-stage twiddles broadcast along the lanes.

Used by ntt_pallas.four_step_ntt: reshape (n,) -> (n2, n1), column-NTT
kernel over axis 0, diagonal twiddle multiply (fused into the second
kernel's prologue), transpose, column-NTT again — natural-order output,
identical values to math/ntt.py (pinned in tests).

Bit-reversal is hoisted OUT of the kernel as one XLA row-gather per pass
(rows move whole 128-lane vectors; cheap next to the butterfly passes).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..math import gf
from ..math import ntt as ntt_mod
from ..math.b_field_element import P


def _col_ntt_kernel_factory(log_n: int, with_diag: bool):
    """Kernel: (n, TC) tile -> in-place NTT along axis 0.

    Inputs: lo, hi, per-stage twiddles (concatenated (n-1,) limb vectors),
    optionally a (n, TC) diagonal-twiddle tile multiplied in before the
    butterflies (used to fuse the four-step diagonal into pass 2).
    """
    n = 1 << log_n

    def kernel(*refs):
        if with_diag:
            lo_ref, hi_ref, twl_ref, twh_ref, dlo_ref, dhi_ref, \
                out_lo_ref, out_hi_ref = refs
        else:
            lo_ref, hi_ref, twl_ref, twh_ref, out_lo_ref, out_hi_ref = refs
        tc = lo_ref.shape[1]
        # Stage results round-trip through the OUTPUT refs: the ref writes
        # end value liveness each stage so the VMEM allocator reuses one
        # set of stage buffers instead of stacking log_n of them (which
        # blows the 16 MB scoped-vmem limit).
        if with_diag:
            olo, ohi = gf.mul((lo_ref[...], hi_ref[...]),
                              (dlo_ref[...], dhi_ref[...]))
            out_lo_ref[...] = olo
            out_hi_ref[...] = ohi
        else:
            out_lo_ref[...] = lo_ref[...]
            out_hi_ref[...] = hi_ref[...]
        offset = 0
        for s in range(log_n):
            m = 1 << s
            blocks = n // (2 * m)
            lo = out_lo_ref[...].reshape(blocks, 2 * m, tc)
            hi = out_hi_ref[...].reshape(blocks, 2 * m, tc)
            u = (lo[:, :m, :], hi[:, :m, :])
            v = (lo[:, m:, :], hi[:, m:, :])
            # twiddles live in a (L, 1) column array: sublane-major, so the
            # (m, 1) -> (1, m, 1) reshape is metadata-only and broadcasts
            # along blocks (major) and lanes (minor)
            twl = twl_ref[offset: offset + m, :].reshape(1, m, 1)
            twh = twh_ref[offset: offset + m, :].reshape(1, m, 1)
            offset += m
            v = gf.mul(v, (twl, twh))
            top = gf.add(u, v)
            bot = gf.sub(u, v)
            out_lo_ref[...] = jnp.concatenate(
                [top[0], bot[0]], axis=1).reshape(n, tc)
            out_hi_ref[...] = jnp.concatenate(
                [top[1], bot[1]], axis=1).reshape(n, tc)

    return kernel


@functools.lru_cache(maxsize=None)
def _stage_twiddles_flat(log_n: int, inverse: bool):
    """All per-stage twiddles concatenated as (L, 1) column arrays."""
    _, stages = ntt_mod._device_tables(log_n, inverse)
    lo = np.concatenate([s[0] for s in stages]) if stages else \
        np.zeros(0, np.uint32)
    hi = np.concatenate([s[1] for s in stages]) if stages else \
        np.zeros(0, np.uint32)
    # pad to a sublane-friendly length
    pad = (-len(lo)) % 8 or 8
    lo = np.concatenate([lo, np.zeros(pad, np.uint32)])
    hi = np.concatenate([hi, np.zeros(pad, np.uint32)])
    return lo.reshape(-1, 1), hi.reshape(-1, 1)


def col_ntt(x, log_n: int, inverse: bool, tc: int = 128, diag=None):
    """NTT along axis 0 of (n, cols) limb planes via the fused-stage kernel.

    If `diag` limb planes are given, multiplies elementwise before the
    butterflies (four-step diagonal fusion). Includes the bit-reversal
    row gather (XLA) before the kernel. cols % tc == 0.
    """
    lo, hi = x
    n = 1 << log_n
    cols = lo.shape[1]
    assert lo.shape[0] == n and cols % tc == 0
    perm, _ = ntt_mod._device_tables(log_n, inverse)
    twl, twh = _stage_twiddles_flat(log_n, inverse)
    lo = jnp.take(lo, perm, axis=0)
    hi = jnp.take(hi, perm, axis=0)
    grid = (cols // tc,)
    data_spec = pl.BlockSpec((n, tc), lambda i: (0, i))
    tw_spec = pl.BlockSpec(twl.shape, lambda i: (0, 0))
    in_specs = [data_spec, data_spec, tw_spec, tw_spec]
    args = [lo, hi, jnp.asarray(twl), jnp.asarray(twh)]
    if diag is not None:
        in_specs += [data_spec, data_spec]
        args += [diag[0], diag[1]]
    try:
        params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    except TypeError:  # older API name
        params = None
    return pl.pallas_call(
        _col_ntt_kernel_factory(log_n, diag is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=[data_spec, data_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, cols), jnp.uint32),
            jax.ShapeDtypeStruct((n, cols), jnp.uint32),
        ],
        **({"compiler_params": params} if params is not None else {}),
    )(*args)


def four_step_ntt(x, log_n: int, inverse: bool, diag, tc: int = 128):
    """Natural-order NTT of (n,) limb planes via two fused-stage passes.

    Same math as math/ntt.four_step_ntt_traceable; the diagonal twiddle is
    fused into the second pass's prologue.
    """
    lo, hi = x
    log_n1, log_n2 = ntt_mod._four_step_split(log_n)
    n1, n2 = 1 << log_n1, 1 << log_n2
    lo = lo.reshape(n2, n1)
    hi = hi.reshape(n2, n1)
    # Narrower column tiles for tall transforms keep the per-stage kernel
    # stack within VMEM (stage temporaries scale with n_local * tc).
    if log_n2 > 10:
        tc = min(tc, 64)
    # pass 1: NTT over j2 (axis 0 already)
    y = col_ntt((lo, hi), log_n2, inverse, tc=min(tc, n1))
    # diagonal twiddle w^(j1*k2) is indexed [k2, j1]; transpose to match the
    # second pass's [j1, k2] layout and fuse into its prologue. The kernel
    # multiplies AFTER the bit-reversal row gather, so permute the diagonal's
    # rows the same way.
    perm1, _ = ntt_mod._device_tables(log_n1, inverse)
    dl = jnp.take(jnp.transpose(diag[0]), perm1, axis=0)
    dh = jnp.take(jnp.transpose(diag[1]), perm1, axis=0)
    y = (jnp.transpose(y[0]), jnp.transpose(y[1]))  # [j1, k2]
    z = col_ntt(y, log_n1, inverse, tc=min(tc, n2), diag=(dl, dh))
    # z[k1, k2] = X[k2 + n2*k1] -> natural order flatten
    zlo = z[0].reshape(-1)
    zhi = z[1].reshape(-1)
    if inverse:
        zlo, zhi = gf.mul_const((zlo, zhi), pow(1 << log_n, P - 2, P))
    return zlo, zhi


@functools.partial(jax.jit, static_argnames=("log_n", "inverse", "tc"))
def _jitted_four_step(lo, hi, dlo, dhi, log_n: int, inverse: bool,
                      tc: int = 128):
    return four_step_ntt((lo, hi), log_n, inverse, (dlo, dhi), tc=tc)


def ntt_values(values: np.ndarray, inverse: bool = False) -> np.ndarray:
    """Host-convenience single-vector NTT through the Pallas kernels."""
    values = np.asarray(values, dtype=np.uint64)
    log_n = int(values.shape[-1]).bit_length() - 1
    lo, hi = gf.to_limbs(values)
    diag = ntt_mod._four_step_diag_device(log_n, inverse)
    out = _jitted_four_step(lo, hi, diag[0], diag[1], log_n, inverse)
    return gf.from_limbs(out)
