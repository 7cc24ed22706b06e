"""Pallas TPU kernel: fused Butteraugli candidate-side masking blur.

Per candidate, the masking stage combines the UHF/HF band planes into a
contrast magnitude, applies the diff-precompute response, blurs it with the
sigma-2.7 masking Gaussian, and squares the difference against the
reference-side blur (``kernels/butteraugli.py`` ``_mask_candidate_side``;
the reference wraps the same model inside the butteraugli crate,
src/metrics/butteraugli.rs:45-135).

In the batched sweep program this is the last per-candidate blur still
running as dense MXU matmuls with HBM round trips between the elementwise
stages (the opsin/band blurs moved into ``pallas/freqsep.py`` in round 2).
This kernel fuses blur + renormalization + the final squared diff per row
tile in VMEM, so the blurred plane never exists in HBM:

- combine + diff-precompute stay in XLA, where they fuse into one
  elementwise pass producing the d1 plane (zero-padding that plane then
  gives the FIR structurally exact zeros outside the image — the same
  zeros the row-normalized matmul operator has);
- the sigma-2.7 blur is a 13-tap separable FIR with the model's border
  renormalization applied via a precomputed reciprocal plane (exactly the
  ``pallas/freqsep.py`` scheme);
- the final ``mul * (b0 - b1)^2`` term is emitted directly.

Negative result (don't retry): fusing the combine + diff-precompute INTO
the kernel (restaging all four uhf/hf planes as overlapping slabs instead
of one d1 plane) measured 0.914x the XLA path at 512px/25 — the 4-plane
restage costs more than the matmuls it replaces.  This 1-plane form only
restages d1 (1.06x its size in slab overlap).

Exactness: identical arithmetic to the XLA path modulo float summation
order inside the FIR (~1e-6 relative on butteraugli scores).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .freqsep import _fir_h, _fir_v, _overlap_slabs, _recip_norm, _taps


def _maskac_kernel(
    slab_ref, b0_ref, recip_ref, out_ref, *, ac_mul, taps, tile, wp, halo
):
    r = len(taps) // 2
    d1 = slab_ref[0, 0, 0]  # (tile + 2*halo, wp_in)
    blur_v = _fir_v(d1, taps, r, tile, halo)
    b1 = _fir_h(blur_v, taps, r, wp, halo) * recip_ref[0]
    d = b0_ref[0] - b1
    out_ref[0, 0] = ac_mul * d * d


@functools.partial(jax.jit, static_argnames=("ac_mul", "sigma", "interpret"))
def mask_diff_ac_batch_pallas(
    d1: jnp.ndarray,
    b0: jnp.ndarray,
    ac_mul: float,
    sigma: float = 2.7,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, W) diff-precomputed contrast planes, (H, W) reference-side
    blur -> (B, H, W) diff_ac masking term."""
    b, hgt, w = d1.shape
    taps = _taps(sigma)
    halo = 8  # >= radius(6) for sigma 2.7, multiple of 8 keeps rows aligned

    wp = ((w + 127) // 128) * 128
    wp_in = ((wp + 2 * halo + 127) // 128) * 128

    # Scoped-VMEM model: ~6 live (tile+2*halo, wp_in) f32 temporaries for
    # the FIR chain.  512px keeps tile=128; CLIC-class widths shrink the
    # tile (the opsin kernel measured stack OOMs at full tile there).
    tile = min(128, ((hgt + 7) // 8) * 8)
    while tile > 8 and 6 * (tile + 2 * halo) * wp_in * 4 > 12 * 1024 * 1024:
        tile //= 2
    hp = ((hgt + tile - 1) // tile) * tile
    nt = hp // tile

    pad = ((0, 0), (halo, hp - hgt + halo), (halo, wp_in - w - halo))
    slabs = _overlap_slabs(jnp.pad(d1, pad), tile, halo, hp)[:, None]
    # (B, 1, nt, tile+2*halo, wp_in)

    recip = np.zeros((hp, wp), np.float32)
    recip[:hgt, :w] = _recip_norm(hgt, w, sigma)
    recip_dev = jnp.asarray(recip)
    b0p = jnp.pad(b0, ((0, hp - hgt), (0, wp - w)))

    kernel = functools.partial(
        _maskac_kernel, ac_mul=ac_mul, taps=taps, tile=tile, wp=wp, halo=halo
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, tile + 2 * halo, wp_in),
                lambda bi, ti: (bi, 0, ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile, wp),
                lambda bi, ti: (0, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile, wp),
                lambda bi, ti: (0, ti, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile, wp),
            lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, nt, tile, wp), jnp.float32),
        interpret=interpret,
    )(slabs, b0p[None], recip_dev[None])
    out = out.reshape(b, hp, wp)
    if hp != hgt or wp != w:
        out = out[:, :hgt, :w]
    return out
