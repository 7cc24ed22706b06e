"""Pallas TPU kernel: fully-fused SSIMULACRA2 per-scale features.

For one pyramid scale, the candidate side of SSIMULACRA2 needs, per channel:
blur the three moment products (mu2, s22, s12), form the SSIM distance map
and the ringing/detail-loss maps against the precomputed reference
(xyb1, mu1, s11), and reduce six statistics (sum d, sum d^4, sum artifact,
sum artifact^4, sum detail, sum detail^4).

The XLA formulation materializes the blurred moments and maps in HBM between
fusions.  This kernel does everything for a (channel, row-tile) in VMEM:
halo slabs of xyb1/xyb2 are DMA'd in, both separable blur passes and all
maps happen in registers, and only six scalars per tile leave the kernel.
HBM traffic per scale drops to reading 4 planes per channel + ~nothing out.

Geometry contract (caller-side): planes are padded to lane-aligned width
with zeros, which matches the metric's zero boundary semantics; reductions
are masked to the valid width in-kernel.

Status: the batched kernel (grid (C, nt, N), reference slab resident across
the candidate batch, slab DMA double-buffered) with block-tridiagonal MXU
matmul horizontal blurs (`_hblur_mm`) beats the XLA batch formulation by
~1.1-1.35x interleaved on a v5e chip and matches it to ~5e-4; it is the
default for ``ssimulacra2_batch`` on TPU (CODEC_EVAL_SSIM2_IMPL=auto).
The earlier full-(W, W)-operator attempt blew the ~16MB scoped-VMEM budget
(Mosaic double-buffers input blocks and splits HIGHEST-precision matmul
operands into bf16 copies: 18.5-19.5MB); factoring the banded Toeplitz
operator into three (128, 128) blocks applied to the previous/current/next
128-lane input block keeps every slice lane-aligned, skips the zero band
blocks, and needs only ~0.2MB of operator VMEM.  The single-pair kernel's
ANY-space inputs still cannot carry a vmap batch dimension, so vmapped
per-candidate callers (iter/eval.py) keep the XLA path under "auto".
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..blur import _banded_matrix, gaussian_taps

TILE_H = 96
#: Tile for the matmul in-kernel blur (block-tridiagonal operators are tiny,
#: so the same tile as the FIR path fits the ~16MB scoped-VMEM budget).
TILE_H_MM = 96
C2 = 0.0009

#: In-kernel horizontal-blur implementation: "matmul" (default —
#: block-tridiagonal (128, 128) operators on the MXU; lane shifts lower to
#: expensive shuffles) or "fir" (lane-shift accumulation, bit-exact vs the
#: XLA shifted path, ~1.1-1.35x slower end-to-end).
PALLAS_HBLUR = os.environ.get("CODEC_EVAL_PALLAS_HBLUR", "matmul")


def _hblur(x, taps, r):
    w = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (r, r)))
    out = taps[0] * xp[:, 0:w]
    for i in range(1, len(taps)):
        out = out + taps[i] * xp[:, i : i + w]
    return out


def _hblur_mm(x, t_top, t_mid, t_bot):
    """Horizontal blur as block-tridiagonal 128-wide matmuls on the MXU.

    The banded (W, W) Toeplitz operator only couples adjacent 128-lane
    blocks (radius 7 < 128), so the blur factors into three tiny (128, 128)
    operators applied to the previous / current / next input block — all
    slices 128-aligned (no lane shuffles), zero band-blocks skipped, and no
    (W, W) operator eating scoped VMEM."""
    nblk = x.shape[-1] // 128
    dot = lambda a, b: jax.lax.dot(
        a, b, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    outs = []
    for j in range(nblk):
        acc = dot(x[:, j * 128 : (j + 1) * 128], t_mid)
        if j > 0:
            acc = acc + dot(x[:, (j - 1) * 128 : j * 128], t_top)
        if j < nblk - 1:
            acc = acc + dot(x[:, (j + 1) * 128 : (j + 2) * 128], t_bot)
        outs.append(acc)
    return jnp.concatenate(outs, axis=1)


def _vblur(slab, taps, tile):
    out = taps[0] * slab[0:tile, :]
    for i in range(1, len(taps)):
        out = out + taps[i] * slab[i : i + tile, :]
    return out


def _features_kernel(
    x1_hbm, x2_hbm, mu1_ref, s11_ref, t_top_ref, t_mid_ref, t_bot_ref,
    d1_ref, d4_ref, a1_ref, a4_ref, l1_ref, l4_ref,
    slab1, slab2, sems,
    *, taps, r, tile, slab_rows, valid_w, valid_h, use_mm,
):
    # Double-buffered slab pipeline across grid steps: each step starts the
    # NEXT step's DMA into the other slot before waiting on its own (which
    # the previous step already started), so slab transfer overlaps compute.
    c = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    nc = pl.num_programs(0)
    k = c * nt + t
    total = nc * nt
    slot = jax.lax.rem(k, 2)
    next_slot = jax.lax.rem(k + 1, 2)
    row0 = t * tile

    def dmas(kk, slot_idx):
        cc = jax.lax.div(kk, nt)
        rr = jax.lax.rem(kk, nt) * tile
        return (
            pltpu.make_async_copy(
                x1_hbm.at[cc, pl.ds(rr, slab_rows), :],
                slab1.at[slot_idx],
                sems.at[slot_idx, 0],
            ),
            pltpu.make_async_copy(
                x2_hbm.at[cc, pl.ds(rr, slab_rows), :],
                slab2.at[slot_idx],
                sems.at[slot_idx, 1],
            ),
        )

    @pl.when(k == 0)
    def _():
        a, b = dmas(k, slot)
        a.start()
        b.start()

    @pl.when(k + 1 < total)
    def _():
        a, b = dmas(k + 1, next_slot)
        a.start()
        b.start()

    a, b = dmas(k, slot)
    a.wait()
    b.wait()

    x1s = slab1[slot]
    x2s = slab2[slot]
    x1 = x1s[r : r + tile, :]
    x2 = x2s[r : r + tile, :]
    mu1 = mu1_ref[0]
    s11 = s11_ref[0]

    if use_mm:
        hblur = lambda v: _hblur_mm(
            v, t_top_ref[...], t_mid_ref[...], t_bot_ref[...]
        )
    else:
        hblur = lambda v: _hblur(v, taps, r)
    mu2 = hblur(_vblur(x2s, taps, tile))
    s22 = hblur(_vblur(x2s * x2s, taps, tile))
    s12 = hblur(_vblur(x1s * x2s, taps, tile))

    mu11 = mu1 * mu1
    mu22 = mu2 * mu2
    mu12 = mu1 * mu2
    mu_diff = mu1 - mu2
    num_m = 1.0 - mu_diff * mu_diff
    num_s = 2.0 * (s12 - mu12) + C2
    denom_s = (s11 - mu11) + (s22 - mu22) + C2
    d = jnp.maximum(1.0 - (num_m * num_s) / denom_s, 0.0)

    detail1 = jnp.abs(x1 - mu1)
    detail2 = jnp.abs(x2 - mu2)
    ed = (1.0 + detail2) / (1.0 + detail1) - 1.0
    artifact = jnp.maximum(ed, 0.0)
    detail_lost = jnp.maximum(-ed, 0.0)

    # Mask out lane padding and (for the last tile) row padding.
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0) + row0
    mask = jnp.logical_and(col < valid_w, row < valid_h).astype(d.dtype)

    d = d * mask
    artifact = artifact * mask
    detail_lost = detail_lost * mask

    # Outputs are whole (C, nt) SMEM arrays; each grid step writes its slot.
    d1_ref[c, t] = jnp.sum(d)
    d4_ref[c, t] = jnp.sum(d * d * d * d)
    a1_ref[c, t] = jnp.sum(artifact)
    a4_ref[c, t] = jnp.sum(artifact**4)
    l1_ref[c, t] = jnp.sum(detail_lost)
    l4_ref[c, t] = jnp.sum(detail_lost**4)


def _block_tridiag_ops(sigma: float):
    """(t_top, t_mid, t_bot): the three (128, 128) blocks of the banded
    Toeplitz blur operator that couple a 128-lane output block to the
    previous / same / next input block (band radius << 128)."""
    full = _banded_matrix(3 * 128, sigma)
    return full[0:128, 128:256], full[128:256, 128:256], full[256:384, 128:256]


@functools.partial(jax.jit, static_argnames=("sigma",))
def scale_features_pallas(
    xyb1: jnp.ndarray,
    mu1: jnp.ndarray,
    s11: jnp.ndarray,
    xyb2: jnp.ndarray,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """One scale's features: (3, H, W) inputs -> (3, 2, 3) feature block
    (norm x {ssim, artifact, detail}) matching ``_scale_features``."""
    taps = tuple(float(t) for t in gaussian_taps(sigma))
    r = len(taps) // 2
    c, h, w = xyb1.shape

    use_mm = PALLAS_HBLUR == "matmul"
    tile = min(TILE_H_MM if use_mm else TILE_H, ((h + 7) // 8) * 8)
    # Width-scaled row tile: the per-step scoped-VMEM footprint grows
    # linearly with the lane extent; keep (tile x padded width) at or
    # under its 512px-proven budget so 2048px images fit (VERDICT r2 #3).
    _wp_est = ((w + 127) // 128) * 128
    while tile > 8 and tile * _wp_est > 96 * 512:
        tile //= 2
    hp = ((h + tile - 1) // tile) * tile
    slab_rows = ((tile + 2 * r + 7) // 8) * 8
    bottom = (slab_rows - tile - r) + (hp - h)
    wp = ((w + 127) // 128) * 128

    pad_halo = ((0, 0), (r, bottom), (0, wp - w))
    pad_tile = ((0, 0), (0, hp - h), (0, wp - w))
    x1p = jnp.pad(xyb1, pad_halo)
    x2p = jnp.pad(xyb2, pad_halo)
    mu1p = jnp.pad(mu1, pad_tile)
    s11p = jnp.pad(s11, pad_tile)

    nt = hp // tile
    kernel = functools.partial(
        _features_kernel,
        taps=taps, r=r, tile=tile, slab_rows=slab_rows, valid_w=w, valid_h=h,
        use_mm=use_mm,
    )
    t_top, t_mid, t_bot = (jnp.asarray(m) for m in _block_tridiag_ops(sigma))
    sum_shape = jax.ShapeDtypeStruct((c, nt), jnp.float32)
    sum_spec = pl.BlockSpec((c, nt), lambda ci, ti: (0, 0),
                            memory_space=pltpu.SMEM)
    tile_spec = pl.BlockSpec((1, tile, wp), lambda ci, ti: (ci, ti, 0),
                             memory_space=pltpu.VMEM)
    op_spec = pl.BlockSpec((128, 128), lambda ci, ti: (0, 0),
                           memory_space=pltpu.VMEM)

    sums = pl.pallas_call(
        kernel,
        grid=(c, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            tile_spec,
            tile_spec,
            op_spec,
            op_spec,
            op_spec,
        ],
        out_specs=tuple(sum_spec for _ in range(6)),
        out_shape=tuple(sum_shape for _ in range(6)),
        scratch_shapes=[
            pltpu.VMEM((2, slab_rows, wp), jnp.float32),
            pltpu.VMEM((2, slab_rows, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )(x1p, x2p, mu1p, s11p, t_top, t_mid, t_bot)

    n = jnp.float32(h * w)
    d1, d4, a1, a4, l1, l4 = (s.sum(axis=1) for s in sums)
    ssim_1 = d1 / n
    ssim_4 = jnp.sqrt(jnp.sqrt(d4 / n))
    art_1 = a1 / n
    art_4 = jnp.sqrt(jnp.sqrt(a4 / n))
    det_1 = l1 / n
    det_4 = jnp.sqrt(jnp.sqrt(l4 / n))
    return jnp.stack(
        [
            jnp.stack([ssim_1, art_1, det_1], axis=-1),
            jnp.stack([ssim_4, art_4, det_4], axis=-1),
        ],
        axis=1,
    )


# ---------------------------------------------------------------------------
# Batched variant: candidate batch folded into the grid
# ---------------------------------------------------------------------------


def _features_kernel_batch(
    x1_hbm, x2_hbm, mu1_ref, s11_ref, t_top_ref, t_mid_ref, t_bot_ref,
    d1_ref, d4_ref, a1_ref, a4_ref, l1_ref, l4_ref,
    ref_slab, slab2, sems,
    *, taps, r, tile, slab_rows, valid_w, valid_h, n_cand, use_mm,
):
    """Grid (C, nt, N): the innermost axis sweeps candidates, so the
    reference slab (and the mu1/s11 VMEM blocks, whose index map ignores n)
    load once per (channel, tile) and are reused across the whole batch;
    only the candidate slab streams, double-buffered across steps."""
    c = pl.program_id(0)
    t = pl.program_id(1)
    n = pl.program_id(2)
    nt = pl.num_programs(1)
    nc = pl.num_programs(0)
    k = (c * nt + t) * n_cand + n
    total = nc * nt * n_cand
    slot = jax.lax.rem(k, 2)
    next_slot = jax.lax.rem(k + 1, 2)
    row0 = t * tile

    def cand_dma(kk, slot_idx):
        cc = jax.lax.div(kk, nt * n_cand)
        rest = jax.lax.rem(kk, nt * n_cand)
        tt = jax.lax.div(rest, n_cand)
        nn = jax.lax.rem(rest, n_cand)
        return pltpu.make_async_copy(
            x2_hbm.at[nn, cc, pl.ds(tt * tile, slab_rows), :],
            slab2.at[slot_idx],
            sems.at[slot_idx, 0],
        )

    @pl.when(k == 0)
    def _():
        cand_dma(k, slot).start()

    @pl.when(n == 0)
    def _():
        # New (c, t): (re)load the shared reference slab.
        pltpu.make_async_copy(
            x1_hbm.at[c, pl.ds(row0, slab_rows), :], ref_slab, sems.at[0, 1]
        ).start()

    @pl.when(k + 1 < total)
    def _():
        cand_dma(k + 1, next_slot).start()

    cand_dma(k, slot).wait()

    @pl.when(n == 0)
    def _():
        pltpu.make_async_copy(
            x1_hbm.at[c, pl.ds(row0, slab_rows), :], ref_slab, sems.at[0, 1]
        ).wait()

    x1s = ref_slab[...]
    x2s = slab2[slot]
    x1 = x1s[r : r + tile, :]
    x2 = x2s[r : r + tile, :]
    mu1 = mu1_ref[0]
    s11 = s11_ref[0]

    if use_mm:
        hblur = lambda v: _hblur_mm(
            v, t_top_ref[...], t_mid_ref[...], t_bot_ref[...]
        )
    else:
        hblur = lambda v: _hblur(v, taps, r)
    mu2 = hblur(_vblur(x2s, taps, tile))
    s22 = hblur(_vblur(x2s * x2s, taps, tile))
    s12 = hblur(_vblur(x1s * x2s, taps, tile))

    mu11 = mu1 * mu1
    mu22 = mu2 * mu2
    mu12 = mu1 * mu2
    mu_diff = mu1 - mu2
    num_m = 1.0 - mu_diff * mu_diff
    num_s = 2.0 * (s12 - mu12) + C2
    denom_s = (s11 - mu11) + (s22 - mu22) + C2
    d = jnp.maximum(1.0 - (num_m * num_s) / denom_s, 0.0)

    detail1 = jnp.abs(x1 - mu1)
    detail2 = jnp.abs(x2 - mu2)
    ed = (1.0 + detail2) / (1.0 + detail1) - 1.0
    artifact = jnp.maximum(ed, 0.0)
    detail_lost = jnp.maximum(-ed, 0.0)

    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0) + row0
    mask = jnp.logical_and(col < valid_w, row < valid_h).astype(d.dtype)
    d = d * mask
    artifact = artifact * mask
    detail_lost = detail_lost * mask

    # Flat 1-D SMEM outputs: multi-dim SMEM windows pad each of the two
    # minor dims (to 8 x 64 element tiles), which blows a (N, 3, nt) f32
    # window up ~28x and overflows the 1 MB smem budget at N=100.
    idx = (n * nc + c) * nt + t
    d1_ref[idx] = jnp.sum(d)
    d4_ref[idx] = jnp.sum(d * d * d * d)
    a1_ref[idx] = jnp.sum(artifact)
    a4_ref[idx] = jnp.sum(artifact**4)
    l1_ref[idx] = jnp.sum(detail_lost)
    l4_ref[idx] = jnp.sum(detail_lost**4)


@functools.partial(jax.jit, static_argnames=("sigma",))
def scale_features_pallas_batch(
    xyb1: jnp.ndarray,
    mu1: jnp.ndarray,
    s11: jnp.ndarray,
    xyb2_batch: jnp.ndarray,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Batched per-scale features: (3,H,W) reference vs (N,3,H,W) candidates
    -> (N, 3, 2, 3) feature blocks in one kernel launch."""
    taps = tuple(float(t) for t in gaussian_taps(sigma))
    r = len(taps) // 2
    c, h, w = xyb1.shape
    n_cand = xyb2_batch.shape[0]

    use_mm = PALLAS_HBLUR == "matmul"
    tile = min(TILE_H_MM if use_mm else TILE_H, ((h + 7) // 8) * 8)
    # Width-scaled row tile: the per-step scoped-VMEM footprint grows
    # linearly with the lane extent; keep (tile x padded width) at or
    # under the proven budget so 2048px images fit (VERDICT r2 #3).  The
    # budget is env-tunable: the 96*512 original shrank the tile to 24 at
    # 2048px (1.67x row-halo amplification); 48 compiles and measures
    # faster there (see ROADMAP round 5).
    _wp_est = ((w + 127) // 128) * 128
    _budget = int(os.environ.get("CODEC_EVAL_SSIM2_TILE_BUDGET", str(96 * 1024)))
    while tile > 8 and tile * _wp_est > _budget:
        tile //= 2
    hp = ((h + tile - 1) // tile) * tile
    slab_rows = ((tile + 2 * r + 7) // 8) * 8
    bottom = (slab_rows - tile - r) + (hp - h)
    wp = ((w + 127) // 128) * 128

    pad_halo = ((0, 0), (r, bottom), (0, wp - w))
    x1p = jnp.pad(xyb1, pad_halo)
    x2p = jnp.pad(xyb2_batch, ((0, 0),) + pad_halo)
    pad_tile = ((0, 0), (0, hp - h), (0, wp - w))
    mu1p = jnp.pad(mu1, pad_tile)
    s11p = jnp.pad(s11, pad_tile)

    nt = hp // tile
    kernel = functools.partial(
        _features_kernel_batch,
        taps=taps, r=r, tile=tile, slab_rows=slab_rows,
        valid_w=w, valid_h=h, n_cand=n_cand, use_mm=use_mm,
    )
    t_top, t_mid, t_bot = (jnp.asarray(m) for m in _block_tridiag_ops(sigma))
    sum_shape = jax.ShapeDtypeStruct((n_cand * c * nt,), jnp.float32)
    sum_spec = pl.BlockSpec(
        (n_cand * c * nt,), lambda ci, ti, ni: (0,), memory_space=pltpu.SMEM
    )
    tile_spec = pl.BlockSpec(
        (1, tile, wp), lambda ci, ti, ni: (ci, ti, 0), memory_space=pltpu.VMEM
    )
    op_spec = pl.BlockSpec(
        (128, 128), lambda ci, ti, ni: (0, 0), memory_space=pltpu.VMEM
    )

    sums = pl.pallas_call(
        kernel,
        grid=(c, nt, n_cand),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            tile_spec,
            tile_spec,
            op_spec,
            op_spec,
            op_spec,
        ],
        out_specs=tuple(sum_spec for _ in range(6)),
        out_shape=tuple(sum_shape for _ in range(6)),
        scratch_shapes=[
            pltpu.VMEM((slab_rows, wp), jnp.float32),
            pltpu.VMEM((2, slab_rows, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )(x1p, x2p, mu1p, s11p, t_top, t_mid, t_bot)

    nn = jnp.float32(h * w)
    d1, d4, a1, a4, l1, l4 = (
        s.reshape(n_cand, c, nt).sum(axis=2) for s in sums
    )  # (N, C)
    feats = jnp.stack(
        [
            jnp.stack([d1 / nn, a1 / nn, l1 / nn], axis=-1),
            jnp.stack(
                [
                    jnp.sqrt(jnp.sqrt(d4 / nn)),
                    jnp.sqrt(jnp.sqrt(a4 / nn)),
                    jnp.sqrt(jnp.sqrt(l4 / nn)),
                ],
                axis=-1,
            ),
        ],
        axis=2,
    )  # (N, C, 2, 3)
    return feats
