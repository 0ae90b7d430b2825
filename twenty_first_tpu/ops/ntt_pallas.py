"""Pallas TPU kernels: fused-stage local passes for the four-step NTT.

Why this exists: under plain XLA every butterfly layer's interleave is a
`concatenate` HLO, which breaks fusion, so each of the ~12 radix-4 layers of
a 2^24 four-step transform materializes one full HBM round trip (~0.62 ms).
Measured at 2^24 the XLA path is HBM-bound at ~9.8 ms regardless of
local-transform size (see DESIGN.md). These kernels run ALL butterfly layers
of a (n_local, tc) tile inside VMEM: each pass reads the array once and
writes it once, with the per-layer interleaves as VMEM relayouts.

Structure (mirrors math/ntt.four_step_ntt_traceable, same values):

    x (n2, n1) --XLA row gather (bit-rev j2)--> P1 kernel (stages over axis 0)
      --XLA transpose + row gather (bit-rev j1) + diagonal mul-->
      P2 kernel (stages over axis 0, n^-1 fused) --> (n1, n2) natural order

The butterfly stages themselves are shared with the XLA path
(math/ntt._ntt_stages_ax2_tw): true radix-4 lazy-residue butterflies with
twiddles passed as a flat (L, 1) input ref (Pallas kernels cannot capture
numpy constants).

Reference parity: same transform as twenty-first/src/math/ntt.rs:67-214;
the fused-stage tiling is the TPU replacement for its cache-resident
in-place butterfly loop.
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

# Column-tile width of the fused-stage kernels. 128 = one VPU lane group;
# the (n_local, 128) tile plus stage temporaries stays inside VMEM for
# n_local <= 2^12.
_TC = 128


def fused_local_pass(x, log_t: int, inverse: bool, post_const: int | None = None,
                     tc: int = _TC, pregathered: bool = False):
    """NTT over axis -2 of (..., t, w) limb planes via one fused-stage kernel.

    One HBM read + one HBM write for all butterfly layers (plus the XLA
    bit-reverse row gather unless ``pregathered``).
    """
    lo, hi = x
    t = 1 << log_t
    assert lo.shape[-2] == t
    w = lo.shape[-1]
    batch = lo.shape[:-2]
    nb = int(np.prod(batch, dtype=np.int64)) if batch else 1
    lo = lo.reshape((nb, t, w))
    hi = hi.reshape((nb, t, w))
    if not pregathered:
        perm, _ = ntt_mod._device_tables_mixed(log_t, inverse)
        lo = jnp.take(lo, perm, axis=-2)
        hi = jnp.take(hi, perm, axis=-2)
    tc = min(tc, w)
    assert w % tc == 0
    twl, twh, _ = ntt_mod._stage_tw_flat(log_t, inverse)
    data_spec = pl.BlockSpec((1, t, tc), lambda b, i: (b, 0, i))
    tw_spec = pl.BlockSpec(twl.shape, lambda b, i: (0, 0))

    def kernel(lo_ref, hi_ref, twl_ref, twh_ref, olo_ref, ohi_ref):
        # Mosaic has no 64-bit ints: force the pure-u32 limb multiply path
        with gf.u32_ops():
            st = (lo_ref[0], hi_ref[0])
            st = ntt_mod._ntt_stages_ax2_tw(st, log_t, inverse,
                                            twl_ref[...], twh_ref[...])
            if post_const is not None:
                olo, ohi = gf.mul_const(gf.canon(st), post_const)
            else:
                olo, ohi = gf.canon(st)
        olo_ref[0] = olo
        ohi_ref[0] = ohi

    olo, ohi = pl.pallas_call(
        kernel,
        grid=(nb, w // tc),
        in_specs=[data_spec, data_spec, tw_spec, tw_spec],
        out_specs=[data_spec, data_spec],
        out_shape=[jax.ShapeDtypeStruct((nb, t, w), jnp.uint32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(lo, hi, jnp.asarray(twl), jnp.asarray(twh))
    return olo.reshape(batch + (t, w)), ohi.reshape(batch + (t, w))


def four_step_ntt(x, log_n: int, inverse: bool, diag):
    """Natural-order NTT over the last axis of (..., n) limb planes.

    Same values as math/ntt.four_step_ntt_traceable. The bit-reverse row
    gather of pass 2 and the four-step diagonal multiply ride one XLA
    transpose pass between the two kernels.
    """
    lo, hi = x
    log_n1, log_n2 = ntt_mod._four_step_split(log_n)
    n1, n2 = 1 << log_n1, 1 << log_n2
    batch = lo.shape[:-1]
    lo = lo.reshape(batch + (n2, n1))
    hi = hi.reshape(batch + (n2, n1))
    # pass 1: NTT over j2 (axis -2) -> Y[k2, j1]
    y = fused_local_pass((lo, hi), log_n2, inverse)
    # transpose to [j1, k2], bit-reverse j1 rows, multiply the diagonal
    # twiddle w^(j1*k2) (diag is stored [k2, j1]; transpose + same row
    # gather applied host-side via XLA ops so the elementwise mul fuses
    # into the gather's output)
    perm1, _ = ntt_mod._device_tables_mixed(log_n1, inverse)
    yt_lo = jnp.take(jnp.swapaxes(y[0], -1, -2), perm1, axis=-2)
    yt_hi = jnp.take(jnp.swapaxes(y[1], -1, -2), perm1, axis=-2)
    d_lo = jnp.take(jnp.swapaxes(diag[0], -1, -2), perm1, axis=-2)
    d_hi = jnp.take(jnp.swapaxes(diag[1], -1, -2), perm1, axis=-2)
    yt = gf.mul((yt_lo, yt_hi), (d_lo, d_hi))
    # pass 2: NTT over j1 (axis -2), 1/n fused -> Z[k1, k2]
    n_inv = pow(1 << log_n, P - 2, P) if inverse else None
    z = fused_local_pass(yt, log_n1, inverse, post_const=n_inv,
                         pregathered=True)
    return (z[0].reshape(batch + (n1 * n2,)),
            z[1].reshape(batch + (n1 * n2,)))


@functools.lru_cache(maxsize=None)
def _jitted_four_step(log_n: int, inverse: bool):
    @jax.jit
    def run(lo, hi, dlo, dhi):
        return four_step_ntt((lo, hi), log_n, inverse, (dlo, dhi))

    return run


def ntt_limbs(x, inverse: bool = False):
    """NTT over the last axis of limb planes via the Pallas kernels."""
    lo, hi = x
    log_n = int(lo.shape[-1]).bit_length() - 1
    diag = ntt_mod._four_step_diag_device(log_n, inverse)
    return _jitted_four_step(log_n, inverse)(lo, hi, diag[0], diag[1])


def ntt_values(values: np.ndarray, inverse: bool = False) -> np.ndarray:
    """Host-convenience NTT through the Pallas kernels."""
    values = np.asarray(values, dtype=np.uint64)
    out = ntt_limbs(gf.to_limbs(values), inverse=inverse)
    return gf.from_limbs(out)
