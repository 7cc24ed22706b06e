"""Pallas TPU kernel: fused candidate-side SSIM moments.

The SSIMULACRA2 inner loop needs, per scale and channel, the Gaussian-blurred
moments of the candidate image against the precomputed reference:
``mu2 = blur(x2)``, ``s22 = blur(x2*x2)``, ``s12 = blur(x1*x2)``.

The XLA formulation materializes the three product planes in HBM and blurs
each in two passes (an HBM round-trip between the vertical and horizontal
pass).  This kernel fuses everything per (channel, row-tile): the halo-padded
input slabs are DMA'd from HBM into VMEM once, the three products are formed
in registers, and both separable passes complete in VMEM.

Inputs are zero-padded by the blur radius along H at the caller, so every
tile issues one fixed-size DMA (DMA extents must be static) and the metric's
zero boundary semantics fall out naturally.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..blur import gaussian_taps

TILE_H = 128


def _hblur(x: jnp.ndarray, taps, r: int) -> jnp.ndarray:
    w = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (r, r)))
    out = taps[0] * xp[:, 0:w]
    for i in range(1, len(taps)):
        out = out + taps[i] * xp[:, i : i + w]
    return out


def _vblur_from_slab(slab: jnp.ndarray, taps, tile: int) -> jnp.ndarray:
    # slab has tile + 2r rows; output row i uses slab rows i .. i+2r.
    out = taps[0] * slab[0:tile, :]
    for i in range(1, len(taps)):
        out = out + taps[i] * slab[i : i + tile, :]
    return out


def _moments_kernel(
    x1_hbm, x2_hbm, mu2_ref, s22_ref, s12_ref, slab1, slab2, sems,
    *, taps, r, tile, slab_rows,
):
    c = pl.program_id(0)
    t = pl.program_id(1)
    row0 = t * tile  # in padded coordinates the halo starts right here

    copy1 = pltpu.make_async_copy(
        x1_hbm.at[c, pl.ds(row0, slab_rows), :], slab1, sems.at[0]
    )
    copy2 = pltpu.make_async_copy(
        x2_hbm.at[c, pl.ds(row0, slab_rows), :], slab2, sems.at[1]
    )
    copy1.start()
    copy2.start()
    copy1.wait()
    copy2.wait()

    x1 = slab1[...]
    x2 = slab2[...]
    mu2_ref[0] = _hblur(_vblur_from_slab(x2, taps, tile), taps, r)
    s22_ref[0] = _hblur(_vblur_from_slab(x2 * x2, taps, tile), taps, r)
    s12_ref[0] = _hblur(_vblur_from_slab(x1 * x2, taps, tile), taps, r)


@functools.partial(jax.jit, static_argnames=("sigma",))
def candidate_moments_pallas(
    xyb1: jnp.ndarray, xyb2: jnp.ndarray, sigma: float = 1.5
):
    """(3, H, W) reference + candidate planes -> (mu2, s22, s12), (3, H, W)."""
    taps = tuple(float(t) for t in gaussian_taps(sigma))
    r = len(taps) // 2
    c, h, w = xyb1.shape

    # Tile over rows; pad H to a tile multiple plus the halo on both ends.
    # DMA extents must be 8-row aligned, so the slab rounds tile+2r up to a
    # multiple of 8 and the input carries matching extra zero rows.
    tile = min(TILE_H, ((h + 7) // 8) * 8)
    # Width-scaled row tile: the per-step scoped-VMEM footprint grows
    # linearly with the lane extent; keep (tile x padded width) at or
    # under its 512px-proven budget so 2048px images fit (VERDICT r2 #3).
    _wp_est = ((w + 127) // 128) * 128
    while tile > 8 and tile * _wp_est > 128 * 512:
        tile //= 2
    hp = ((h + tile - 1) // tile) * tile
    slab_rows = ((tile + 2 * r + 7) // 8) * 8
    bottom_pad = (slab_rows - tile - r) + (hp - h)
    # Lane (W) extent of DMA'd slices must be 128-aligned; extra zero
    # columns are inert under the zero-boundary blur and cropped after.
    wp = ((w + 127) // 128) * 128
    pad = ((0, 0), (r, bottom_pad), (0, wp - w))
    x1p = jnp.pad(xyb1, pad)
    x2p = jnp.pad(xyb2, pad)
    w = wp

    nt = hp // tile
    kernel = functools.partial(
        _moments_kernel, taps=taps, r=r, tile=tile, slab_rows=slab_rows
    )
    out_shape = jax.ShapeDtypeStruct((c, hp, w), xyb1.dtype)
    out_spec = pl.BlockSpec(
        (1, tile, w), lambda ci, ti: (ci, ti, 0), memory_space=pltpu.VMEM
    )
    mu2, s22, s12 = pl.pallas_call(
        kernel,
        grid=(c, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((slab_rows, w), xyb1.dtype),
            pltpu.VMEM((slab_rows, w), xyb1.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x1p, x2p)
    orig_w = xyb1.shape[2]
    if hp != h or w != orig_w:
        mu2 = mu2[:, :h, :orig_w]
        s22 = s22[:, :h, :orig_w]
        s12 = s12[:, :h, :orig_w]
    return mu2, s22, s12


def fused_candidate_moments(xyb1: jnp.ndarray, xyb2: jnp.ndarray, sigma: float):
    """Pallas path (TPU); XLA shifted-slice fallback elsewhere."""
    if jax.default_backend() not in ("tpu", "axon"):
        from ..blur import blur_separable

        stacked = jnp.concatenate([xyb2, xyb2 * xyb2, xyb1 * xyb2], axis=0)
        blurred = blur_separable(stacked, sigma)
        return blurred[:3], blurred[3:6], blurred[6:9]
    return candidate_moments_pallas(xyb1, xyb2, sigma=sigma)
