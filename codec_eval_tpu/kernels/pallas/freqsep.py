"""Pallas TPU kernels: fused Butteraugli opsin dynamics + band separation.

The candidate side of every Butteraugli pair runs opsin dynamics (surround
blur + local-adaptation gamma + opponent transform) and frequency
separation (LF/MF/HF/UHF band split with range reshaping).  In XLA each
blur is a separate matmul pair with HBM round trips between the elementwise
stages — ~8 ms of the 16 ms butteraugli batch at 512px/25 candidates.

These kernels keep the chains in VMEM:

- ``opsin_xyb_batch_pallas``: intensity-scaled linear RGB -> opponent XYB.
  The sigma-1.2 surround blur runs as an in-register separable FIR
  (sublane slices vertically, lane slices horizontally) with the model's
  border renormalization applied via a precomputed reciprocal plane.
- ``bands_batch_pallas``: (XYB, LF) -> the seven MF/HF/UHF band planes.
  The sigma-3.22 and sigma-1.56 blur chain (blur of a blur's residual)
  runs inside one kernel per row tile with compounding halos, so the
  intermediate planes never touch HBM.

The sigma-7.16 LF blur stays outside on the MXU (33-tap FIR is VPU-hostile;
a dense banded matmul at that radius is faster) — see kernels/butteraugli.py
``_blur``.  Inputs are restaged host-side as overlapping row slabs so plain
BlockSpec indexing feeds the grid (same trick as pallas/malta.py).

Exactness: identical arithmetic to the XLA path modulo float summation
order inside the FIR (taps applied in the same order; differences are
~1e-7 relative).  Border semantics match the model exactly: zero-padded
convolution divided by the blurred inside-image indicator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _taps(sigma: float) -> tuple:
    radius = max(1, int(2.25 * sigma))
    t = np.exp(
        -1.0 / (2.0 * sigma * sigma) * np.arange(-radius, radius + 1) ** 2
    )
    return tuple(float(v) for v in t)


def _overlap_slabs(x: jnp.ndarray, tile: int, halo: int, hp: int) -> jnp.ndarray:
    """(..., Hpad, W) zero-padded -> (..., nt, tile + 2*halo, W) row slabs.

    ``x`` must already be padded to ``hp + 2*halo`` rows (halo top/bottom).
    """
    nt = hp // tile
    slabs = [
        x[..., i * tile : i * tile + tile + 2 * halo, :] for i in range(nt)
    ]
    return jnp.stack(slabs, axis=-3)


def _col_tile(w: int, halo: int) -> tuple[int, int, int]:
    """Column tiling plan: (ctile, nc, ctile_in).

    CLIC-class widths overflow the kernels' scoped-VMEM budgets when a row
    slab spans the whole (lane-padded) width, so the width axis is tiled
    too: each column tile carries a ``halo``-lane halo on both sides (the
    blur chains' full compounded radius), lane-padded up to the next
    multiple of 128.  nc == 1 reproduces the original single-tile layout
    (lane pad only on the right), so narrow images keep their exact
    previous restaging.
    """
    wp = ((w + 127) // 128) * 128
    if wp <= 512:
        return wp, 1, ((wp + 2 * halo + 127) // 128) * 128
    ctile = 512
    nc = (w + ctile - 1) // ctile
    ctile_in = ((ctile + 2 * halo + 127) // 128) * 128
    return ctile, nc, ctile_in


def _overlap_tiles2d(
    x: jnp.ndarray,
    tile: int,
    halo: int,
    hp: int,
    ctile: int,
    nc: int,
    ctile_in: int,
    w: int,
) -> jnp.ndarray:
    """(..., H, W) -> (..., nt, nc, tile + 2*halo, ctile_in) overlapping
    2-D tiles.  ``x`` is the UNPADDED plane; this pads rows to hp + 2*halo
    and columns so every tile's window is in range (image at column
    ``halo`` of each tile's local frame, matching the kernels' indexing).
    """
    wcp = ctile * nc
    pad = [(0, 0)] * (x.ndim - 2) + [
        (halo, hp - x.shape[-2] + halo),
        (halo, wcp - w + (ctile_in - ctile - 2 * halo) + halo),
    ]
    xp = jnp.pad(x, pad)
    rows = _overlap_slabs(xp, tile, halo, hp)  # (..., nt, rows, Wpad)
    tiles = [
        rows[..., j * ctile : j * ctile + ctile_in] for j in range(nc)
    ]
    return jnp.stack(tiles, axis=-2 - 1)  # (..., nt, nc, rows, ctile_in)


@functools.lru_cache(maxsize=None)
def _recip_norm(h: int, w: int, sigma: float) -> np.ndarray:
    """1 / (blurred inside-image indicator), 0 outside — (h, w) f32.

    Multiplying the zero-padded separable FIR by this plane reproduces the
    model's border-renormalized blur exactly (the denominator separates
    into an outer product of 1-D blurred masks).
    """
    t = np.asarray(_taps(sigma), np.float64)
    r = len(t) // 2

    def norm1d(n):
        ones = np.ones(n)
        padded = np.pad(ones, r)
        out = np.zeros(n)
        for i, tap in enumerate(t):
            out += tap * padded[i : i + n]
        return out

    denom = np.outer(norm1d(h), norm1d(w))
    return (1.0 / denom).astype(np.float32)


def _fir_v(x, taps, r: int, rows: int, row0: int):
    """Vertical FIR: x (..., >=row0+rows+r, W) -> (..., rows, W) starting at
    absolute slab row ``row0`` (x rows row0-r .. row0+rows+r contribute)."""
    out = None
    for i, t in enumerate(taps):
        piece = t * x[..., row0 - r + i : row0 - r + i + rows, :]
        out = piece if out is None else out + piece
    return out


def _fir_h(x, taps, r: int, cols: int, col0: int):
    out = None
    for i, t in enumerate(taps):
        piece = t * x[..., :, col0 - r + i : col0 - r + i + cols]
        out = piece if out is None else out + piece
    return out


def _window_dma_db(hbm, slab2, sems, *, tile, halo, ctile, ctile_in, nt, nc):
    """Double-buffered (tile + 2*halo, ctile_in) window reads over a
    (b, nt, nc) grid: start the NEXT step's copy before computing this
    step's window, so the per-step DMA latency overlaps compute (the same
    slot/semaphore pattern as pallas/scale_features.py).  Returns this
    step's (C, rows, ctile_in) window value."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    ci = pl.program_id(2)
    k = (bi * nt + ti) * nc + ci
    total = pl.num_programs(0) * nt * nc
    slot = jax.lax.rem(k, 2)
    nxt = jax.lax.rem(k + 1, 2)

    def copy(kk, slot_idx):
        bb = jax.lax.div(kk, nt * nc)
        rest = jax.lax.rem(kk, nt * nc)
        tt = jax.lax.div(rest, nc)
        cc = jax.lax.rem(rest, nc)
        return pltpu.make_async_copy(
            hbm.at[
                bb, :,
                pl.ds(tt * tile, tile + 2 * halo),
                pl.ds(cc * ctile, ctile_in),
            ],
            slab2.at[slot_idx],
            sems.at[slot_idx],
        )

    @pl.when(k == 0)
    def _():
        copy(k, slot).start()

    @pl.when(k + 1 < total)
    def _():
        copy(k + 1, nxt).start()

    copy(k, slot).wait()
    return slab2[slot]


# ---------------------------------------------------------------------------
# K1: opsin dynamics.
# ---------------------------------------------------------------------------


def _opsin_compute(lin, recip, write_out, *, consts, taps12, tile, wp, halo):
    r = len(taps12) // 2
    # Renormalized surround blur at output rows/cols.
    blur_v = _fir_v(lin, taps12, r, tile, halo)
    blurred = _fir_h(blur_v, taps12, r, wp, halo) * recip

    center = lin[:, halo : halo + tile, halo : halo + wp]

    (m00, m01, m02, m10, m11, m12, m20, m21, m22,
     b0, b1, b2, gmul, goff, gsub) = consts

    def absorb(p):
        return (
            m00 * p[0] + m01 * p[1] + m02 * p[2] + b0,
            m10 * p[0] + m11 * p[1] + m12 * p[2] + b1,
            m20 * p[0] + m21 * p[1] + m22 * p[2] + b2,
        )

    def fast_log2(v):
        bits = jax.lax.bitcast_convert_type(v.astype(jnp.float32), jnp.int32)
        e = bits - jnp.int32(0x3F2AAAAB)
        exp = e >> 23
        mant = jax.lax.bitcast_convert_type(bits - (exp << 23), jnp.float32)
        m = mant - 1.0
        p = (0.74245876 * m + 1.4287161) * m - 1.8503833e-06
        q = (0.17409343 * m + 1.0096718) * m + 0.99032813
        return p / q + exp.astype(jnp.float32)

    pre = absorb(blurred)
    cur_c = absorb(center)
    biases = (b0, b1, b2)
    xyb = []
    for i in range(3):
        p = jnp.maximum(jnp.maximum(pre[i], biases[i]), 1e-4)
        gamma = gmul * fast_log2(jnp.maximum(p, 0.0) + goff) - gsub
        sens = jnp.maximum(gamma / p, 1e-4)
        xyb.append(jnp.maximum(cur_c[i] * sens, biases[i]))
    write_out((xyb[0] - xyb[1], xyb[0] + xyb[1], xyb[2]))


def _opsin_kernel(
    slab_ref, recip_ref, out_ref, *, consts, taps12, tile, wp, halo
):
    def write_out(planes):
        for i, v in enumerate(planes):
            out_ref[0, i, 0, 0] = v

    _opsin_compute(
        slab_ref[0, :, 0, 0], recip_ref[0, 0], write_out,
        consts=consts, taps12=taps12, tile=tile, wp=wp, halo=halo,
    )


def _opsin_kernel_dma(
    lin_hbm, recip_ref, out_ref, slab2, sems,
    *, consts, taps12, tile, wp, halo, ctile_in, nt, nc,
):
    """DMA-input variant for wide planes (see _bands_kernel_dma): the
    stacked restage at 2048px amplifies the input ~3.9x in HBM; the kernel
    reads its window from ONE padded plane (double-buffered) and writes
    (B, 3, hp, wcp) blocks directly."""
    lin = _window_dma_db(
        lin_hbm, slab2, sems, tile=tile, halo=halo, ctile=wp,
        ctile_in=ctile_in, nt=nt, nc=nc,
    )

    def write_out(planes):
        for i, v in enumerate(planes):
            out_ref[0, i] = v

    _opsin_compute(
        lin, recip_ref[0, 0], write_out,
        consts=consts, taps12=taps12, tile=tile, wp=wp, halo=halo,
    )


@functools.partial(jax.jit, static_argnames=("consts", "interpret"))
def opsin_xyb_batch_pallas(
    linear_scaled: jnp.ndarray, consts, interpret: bool = False
) -> jnp.ndarray:
    """(B, 3, H, W) intensity-scaled linear RGB -> (B, 3, H, W) opponent XYB."""
    b, c, h, w = linear_scaled.shape
    sigma = 1.2
    taps12 = _taps(sigma)
    halo = 8  # >= radius(2), multiple of 8 so slab rows stay aligned

    # Column tiling bounds the per-step footprint independent of image
    # width (CLIC-class planes previously fell back to XLA).
    ctile, nc, ctile_in = _col_tile(w, halo)
    # Scoped-VMEM model: Mosaic keeps ~22 (tile+2*halo, ctile_in)-row f32
    # temporaries live for the unrolled blur+gamma chain (27.8 MB measured
    # at tile=128, width 2048 — a stack OOM; 8.2 MB at 512).  Halve the
    # row tile until the model fits.
    tile = min(128, ((h + 7) // 8) * 8)
    while tile > 8 and 23 * (tile + 2 * halo) * ctile_in * 4 > 14 * 1024 * 1024:
        tile //= 2
    hp = ((h + tile - 1) // tile) * tile
    nt = hp // tile
    wcp = ctile * nc

    recip = np.zeros((hp, wcp), np.float32)
    recip[:h, :w] = _recip_norm(h, w, sigma)
    recip_tiles = np.ascontiguousarray(
        recip.reshape(nt, tile, nc, ctile).transpose(0, 2, 1, 3)
    )
    recip_spec = pl.BlockSpec(
        (1, 1, tile, ctile),
        lambda bi, ti, ci: (ti, ci, 0, 0),
        memory_space=pltpu.VMEM,
    )

    restage = __import__("os").environ.get("CODEC_EVAL_FREQSEP_RESTAGE", "auto")
    if (nc > 1 or restage == "dma") and not interpret and restage != "stack":
        # Wide planes: DMA the window from ONE padded plane (the stacked
        # restage amplifies input bytes ~3.9x at tile 128); write output
        # blocks directly in (B, 3, hp, wcp) layout.
        pad = [(0, 0), (0, 0), (halo, hp - h + halo),
               (halo, wcp - w + (ctile_in - ctile - 2 * halo) + halo)]
        lin_padded = jnp.pad(linear_scaled, pad)
        kernel = functools.partial(
            _opsin_kernel_dma, consts=consts, taps12=taps12, tile=tile,
            wp=ctile, halo=halo, ctile_in=ctile_in, nt=nt, nc=nc,
        )
        out = pl.pallas_call(
            kernel,
            grid=(b, nt, nc),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), recip_spec],
            out_specs=pl.BlockSpec(
                (1, 3, tile, ctile),
                lambda bi, ti, ci: (bi, 0, ti, ci),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, 3, hp, wcp), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, 3, tile + 2 * halo, ctile_in), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(lin_padded, jnp.asarray(recip_tiles))
        if hp != h or wcp != w:
            out = out[:, :, :h, :w]
        return out

    slabs = _overlap_tiles2d(
        linear_scaled, tile, halo, hp, ctile, nc, ctile_in, w
    )
    # (B, 3, nt, nc, tile+2*halo, ctile_in) -> blocks (1,3,1,1,rows,ctile_in)

    kernel = functools.partial(
        _opsin_kernel, consts=consts, taps12=taps12, tile=tile, wp=ctile,
        halo=halo,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nt, nc),
        in_specs=[
            pl.BlockSpec(
                (1, 3, 1, 1, tile + 2 * halo, ctile_in),
                lambda bi, ti, ci: (bi, 0, ti, ci, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            recip_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, 3, 1, 1, tile, ctile),
            lambda bi, ti, ci: (bi, 0, ti, ci, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, 3, nt, nc, tile, ctile), jnp.float32
        ),
        interpret=interpret,
    )(slabs, jnp.asarray(recip_tiles))
    out = jnp.moveaxis(out, 4, 3).reshape(b, 3, hp, wcp)
    if hp != h or wcp != w:
        out = out[:, :, :h, :w]
    return out


# ---------------------------------------------------------------------------
# K2: band separation given LF.
# ---------------------------------------------------------------------------


def _bands_compute(
    mf_pre, recip332, recip156, write_out,
    *, consts, taps332, taps156, tile, wp, halo,
):
    (mf_x_remove, mf_y_amplify, uhf_x_remove, hf_x_remove,
     suppress_yw, suppress_s, maxclamp_hf, maxclamp_uhf, maxclamp_mul,
     uhf_y_mul, hf_y_mul, hf_y_amplify) = consts
    r332 = len(taps332) // 2
    r156 = len(taps156) // 2

    def remove_range(v, wdt):
        return jnp.where(v > wdt, v - wdt, jnp.where(v < -wdt, v + wdt, 0.0))

    def amplify_range(v, wdt):
        return jnp.where(v > wdt, v + wdt, jnp.where(v < -wdt, v - wdt, 2.0 * v))

    def maximum_clamp(v, m):
        return jnp.where(
            v >= m, (v - m) * maxclamp_mul + m,
            jnp.where(v < -m, (v + m) * maxclamp_mul - m, v),
        )

    # Stage 1: sigma-3.22 blur of all three mf_pre planes.  Valid rows for
    # the next stage: [halo - r156_need, halo + tile + r156_need).
    inner_rows = tile + 2 * (r156 + 1)  # r156 rounded up margin
    inner0 = halo - (r156 + 1)
    inner_cols = wp + 2 * (r156 + 1)
    incol0 = halo - (r156 + 1)
    bv = _fir_v(mf_pre, taps332, r332, inner_rows, inner0)
    mf_blur = (
        _fir_h(bv, taps332, r332, inner_cols, incol0)
        * recip332
    )  # (3, inner_rows, inner_cols)

    ctr = lambda p: p[..., r156 + 1 : r156 + 1 + tile, r156 + 1 : r156 + 1 + wp]

    mf_x = remove_range(ctr(mf_blur[0]), mf_x_remove)
    mf_y = amplify_range(ctr(mf_blur[1]), mf_y_amplify)
    mf_b = ctr(mf_blur[2])

    # hf0 = mf_pre - mf_blur for X/Y at the inner extent (stage-2 input).
    mfp_inner = mf_pre[:2, inner0 : inner0 + inner_rows, incol0 : incol0 + inner_cols]
    hf0 = mfp_inner - mf_blur[:2]
    # Red-green suppression by luminance change (pre-UHF split).
    hf0_x = hf0[0] * (
        suppress_s + (1.0 - suppress_s) * suppress_yw / (suppress_yw + hf0[1] * hf0[1])
    )
    hf = jnp.stack([hf0_x, hf0[1]], axis=0)

    # Stage 2: sigma-1.56 blur of hf at output extent.
    hv = _fir_v(hf, taps156, r156, tile, r156 + 1)
    hf_blur = _fir_h(hv, taps156, r156, wp, r156 + 1) * recip156

    hf_c = hf[:, r156 + 1 : r156 + 1 + tile, r156 + 1 : r156 + 1 + wp]
    uhf_x = remove_range(hf_c[0] - hf_blur[0], uhf_x_remove)
    hf_x_out = remove_range(hf_blur[0], hf_x_remove)
    hfc = maximum_clamp(hf_blur[1], maxclamp_hf)
    uhf_y = maximum_clamp(hf_c[1] - hfc, maxclamp_uhf) * uhf_y_mul
    hf_y_out = amplify_range(hfc * hf_y_mul, hf_y_amplify)

    write_out((uhf_x, uhf_y, hf_x_out, hf_y_out, mf_x, mf_y, mf_b))


def _bands_kernel(
    mfp_ref, recip332_ref, recip156_ref, out_ref,
    *, consts, taps332, taps156, tile, wp, halo,
):
    def write_out(bands):
        for i, b in enumerate(bands):
            out_ref[0, i, 0, 0] = b

    _bands_compute(
        mfp_ref[0, :, 0, 0], recip332_ref[0, 0], recip156_ref[0, 0],
        write_out, consts=consts, taps332=taps332, taps156=taps156,
        tile=tile, wp=wp, halo=halo,
    )


def _bands_kernel_dma(
    mfp_hbm, recip332_ref, recip156_ref, out_ref, slab2, sems,
    *, consts, taps332, taps156, tile, wp, halo, ctile_in, nt, nc,
):
    """DMA-input variant: reads its (tile + 2*halo, ctile_in) window
    straight from the zero-padded full plane in HBM, skipping the
    materialized overlap-slab restage (which alone measured 8.65 ms of the
    16.6 ms bands stage at 2048px/5 — tools session 2026-08-21), and
    writes output blocks directly in (B, 7, hp, wcp) layout (no moveaxis/
    reshape pass)."""
    mf_pre = _window_dma_db(
        mfp_hbm, slab2, sems, tile=tile, halo=halo, ctile=wp,
        ctile_in=ctile_in, nt=nt, nc=nc,
    )

    def write_out(bands):
        for i, b in enumerate(bands):
            out_ref[0, i] = b

    _bands_compute(
        mf_pre, recip332_ref[0, 0], recip156_ref[0, 0], write_out,
        consts=consts, taps332=taps332, taps156=taps156,
        tile=tile, wp=wp, halo=halo,
    )


@functools.partial(jax.jit, static_argnames=("consts", "interpret"))
def bands_batch_pallas(
    xyb: jnp.ndarray, lf: jnp.ndarray, consts, interpret: bool = False
) -> jnp.ndarray:
    """(B, 3, H, W) XYB + its LF blur -> (B, 7, H, W) band planes.

    Output channel order: uhf_x, uhf_y, hf_x, hf_y, mf_x, mf_y, mf_b.
    """
    b, c, h, w = xyb.shape
    s332, s156 = 3.2248991, 1.5641633
    taps332, taps156 = _taps(s332), _taps(s156)
    r332, r156 = len(taps332) // 2, len(taps156) // 2
    halo_needed = r332 + r156 + 1
    halo = ((halo_needed + 7) // 8) * 8  # 16 for (7, 3)

    # Column tiling bounds the per-step footprint independent of image
    # width (CLIC-class planes previously fell back to XLA).
    ctile, nc, ctile_in = _col_tile(w, halo)
    # Mosaic keeps ~70 (tile, ctile_in)-row f32 temporaries live on the
    # scoped-VMEM stack for the unrolled two-stage chain (23.1 MB measured
    # at tile=128, width 512).  Measured at 512px: tile=48 is fastest
    # (2.08 ms/dispatch for 25 candidates vs 2.78 at 32 and 2.57 at 64 —
    # larger tiles start spilling); pick the largest tile under a ~9.5 MB
    # model.
    tile = 8
    for cand_tile in (96, 64, 48, 32, 24, 16):
        if 70 * cand_tile * ctile_in * 4 <= 9.5 * 1024 * 1024:
            tile = cand_tile
            break
    tile = min(tile, ((h + 7) // 8) * 8)
    hp = ((h + tile - 1) // tile) * tile
    nt = hp // tile
    wcp = ctile * nc

    # Reciprocal-denominator tiles per blur stage, in each stage's local
    # coordinates.  Stage 1 (sigma 3.22) is evaluated on the inner extent
    # [halo - r156 - 1, halo + tile + r156 + 1) x same for cols; stage 2
    # (sigma 1.56) at the output extent.
    inner_rows = tile + 2 * (r156 + 1)
    inner_cols = ctile + 2 * (r156 + 1)

    m = r156 + 1
    r332_full = np.zeros((hp + 2 * m, wcp + 2 * m), np.float32)
    r332_full[m : m + h, m : m + w] = _recip_norm(h, w, s332)
    r332_tiles = np.stack(
        [
            np.stack(
                [
                    r332_full[
                        i * tile : i * tile + inner_rows,
                        j * ctile : j * ctile + inner_cols,
                    ]
                    for j in range(nc)
                ]
            )
            for i in range(nt)
        ]
    )
    r156_full = np.zeros((hp, wcp), np.float32)
    r156_full[:h, :w] = _recip_norm(h, w, s156)
    r156_tiles = np.ascontiguousarray(
        r156_full.reshape(nt, tile, nc, ctile).transpose(0, 2, 1, 3)
    )

    recip_specs = [
        pl.BlockSpec(
            (1, 1, inner_rows, inner_cols),
            lambda bi, ti, ci: (ti, ci, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, tile, ctile),
            lambda bi, ti, ci: (ti, ci, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]

    restage = __import__("os").environ.get("CODEC_EVAL_FREQSEP_RESTAGE", "auto")
    if (nc > 1 or restage == "dma") and not interpret and restage != "stack":
        # Wide (CLIC-class) planes: the materialized overlap-slab restage
        # alone measured 8.65 ms of the 16.6 ms bands stage at 2048px/5, so
        # the kernel DMAs its window straight from ONE zero-padded plane
        # and writes output blocks directly in (B, 7, hp, wcp) layout.
        pad = [(0, 0), (0, 0), (halo, hp - h + halo),
               (halo, wcp - w + (ctile_in - ctile - 2 * halo) + halo)]
        mfp_padded = jnp.pad(xyb - lf, pad)
        kernel = functools.partial(
            _bands_kernel_dma, consts=consts, taps332=taps332,
            taps156=taps156, tile=tile, wp=ctile, halo=halo,
            ctile_in=ctile_in, nt=nt, nc=nc,
        )
        out = pl.pallas_call(
            kernel,
            grid=(b, nt, nc),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                *recip_specs,
            ],
            out_specs=pl.BlockSpec(
                (1, 7, tile, ctile),
                lambda bi, ti, ci: (bi, 0, ti, ci),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, 7, hp, wcp), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, 3, tile + 2 * halo, ctile_in), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(mfp_padded, jnp.asarray(r332_tiles), jnp.asarray(r156_tiles))
        if hp != h or wcp != w:
            out = out[:, :, :h, :w]
        return out

    mfp_slabs = _overlap_tiles2d(
        xyb - lf, tile, halo, hp, ctile, nc, ctile_in, w
    )
    kernel = functools.partial(
        _bands_kernel, consts=consts, taps332=taps332, taps156=taps156,
        tile=tile, wp=ctile, halo=halo,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nt, nc),
        in_specs=[
            pl.BlockSpec(
                (1, 3, 1, 1, tile + 2 * halo, ctile_in),
                lambda bi, ti, ci: (bi, 0, ti, ci, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *recip_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, 7, 1, 1, tile, ctile),
            lambda bi, ti, ci: (bi, 0, ti, ci, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, 7, nt, nc, tile, ctile), jnp.float32
        ),
        interpret=interpret,
    )(mfp_slabs, jnp.asarray(r332_tiles), jnp.asarray(r156_tiles))
    out = jnp.moveaxis(out, 4, 3).reshape(b, 7, hp, wcp)
    if hp != h or wcp != w:
        out = out[:, :, :h, :w]
    return out
