"""Pallas TPU kernel: fused Butteraugli Malta directional sweeps.

The Malta stage evaluates, per band, ~12-16 oriented 5/9-sample line sums of
an asymmetric diff plane, squares them, and accumulates — six such calls per
resolution (reference wraps this inside the butteraugli crate,
src/metrics/butteraugli.rs:45-135; the recovered line patterns live in
``kernels/butteraugli.py``).

In pure XLA the big scoring program stops fusing these sweeps and
materializes hundreds of (batch, H, W) intermediates: measured 52 ms of the
64 ms butteraugli batch at 512px/25 candidates (tools/
profile_butteraugli_stages.py).  This kernel keeps the data in VMEM:

- The input is restaged host-side as *overlapping row slabs* (halo included)
  so plain BlockSpec indexing feeds the grid and Mosaic double-buffers the
  fetches — no manual DMA.
- Each grid step handles one (batch, row-tile, channel) cell.  The channel
  axis is innermost so the output block (the two Malta accumulators) stays
  resident in VMEM across all six channels and is written back once.
- All (dy, dx) offsets are realized as 9 lane-rotated copies up front;
  every line sample is then a cheap sublane slice, instead of one lane
  rotation per sample (~520 of them).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: (dest accumulator, pattern kind) per input channel, matching the call
#: sequence in kernels/butteraugli.py _diffmap_psycho.
_CHANNEL_SPEC = (
    (1, "full"),  # uhf_y
    (0, "full"),  # uhf_x
    (1, "lf"),    # hf_y
    (0, "lf"),    # hf_x
    (1, "lf"),    # mf_y
    (0, "lf"),    # mf_x
)

_RADIUS = 4  # max |dy|, |dx| over all line patterns


def _sweep_shifted(shifted, lines, tile: int):
    """shifted (9, tile+2r, wp) dx-rotated copies -> (tile, wp) sweep sum."""
    acc = None
    for weight, line in lines:
        s = None
        for dy, dx in line:
            piece = shifted[dx + _RADIUS, _RADIUS + dy : _RADIUS + dy + tile, :]
            s = piece if s is None else s + piece
        term = weight * (s * s)
        acc = term if acc is None else acc + term
    return acc


def _shift_slab(slab, shifted, *, wp, w, halo, slab_ref_slice=None):
    """Realize the 9 dx-rotated copies of one channel slab into scratch."""
    r = _RADIUS
    if halo == "slab":
        # One lane rotation per dx; all line samples below are sublane
        # slices.  The input block carries an explicit lane halo, padded up
        # to the next multiple of 128 (wp_in > wp).
        for dx in range(2 * r + 1):
            shifted[dx] = slab_ref_slice[:, dx : dx + wp]
    else:
        # "roll": the input block is exactly wp lanes (image at lane 0, no
        # lane halo).  Each dx shift is a lane rotation with wraparound;
        # wrapped lanes must read as the zero padding the sweep semantics
        # require, so they are masked off unless the zero-pad columns
        # (w..wp) already cover the wrap distance.
        rows = slab.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 1)
        for dx in range(2 * r + 1):
            rolled = pltpu.roll(slab, (r - dx) % wp, 1)
            if dx < r and w > wp - (r - dx):
                rolled = jnp.where(lane >= (r - dx), rolled, 0.0)
            elif dx > r and w > wp - (dx - r):
                rolled = jnp.where(lane < wp - (dx - r), rolled, 0.0)
            shifted[dx] = rolled


def _malta_kernel(
    slab_ref, out_ref, shifted, *, tile, wp, w, lines_full, lines_lf, halo
):
    ch = pl.program_id(2)

    _shift_slab(
        slab_ref[0, 0, 0] if halo == "roll" else None,
        shifted,
        wp=wp,
        w=w,
        halo=halo,
        slab_ref_slice=None if halo == "roll" else slab_ref[0, 0, 0],
    )

    @pl.when(ch == 0)
    def _():
        out_ref[0, 0] = jnp.zeros((tile, wp), jnp.float32)
        out_ref[0, 1] = jnp.zeros((tile, wp), jnp.float32)

    def add_sweep(lines):
        acc = _sweep_shifted(shifted, lines, tile)
        # Channel -> accumulator: even channels feed ac1 (luma), odd ac0
        # (X opponent) — see _CHANNEL_SPEC.
        is_ac1 = (ch % 2) == 0
        out_ref[0, 0] = out_ref[0, 0] + jnp.where(is_ac1, 0.0, 1.0) * acc
        out_ref[0, 1] = out_ref[0, 1] + jnp.where(is_ac1, 1.0, 0.0) * acc

    @pl.when(ch < 2)
    def _():
        add_sweep(lines_full)

    @pl.when(ch >= 2)
    def _():
        add_sweep(lines_lf)


def _malta_kernel_dma(
    diffs_hbm, out_ref, shifted, slab2, sems,
    *, tile, wp, w, lines_full, lines_lf, slab_rows, nt,
):
    """DMA-input channel-grid variant ("roll" halo only): reads its
    (slab_rows, wp) window straight from the zero-padded full diff array in
    HBM, skipping the materialized overlap-slab restage (~676 MB written +
    re-read at 2048px/5 — see malta_ac_batch_pallas).  Double-buffered:
    the next (batch, tile, channel) window's copy starts before this
    step's sweeps run."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    ch = pl.program_id(2)
    k = (bi * nt + ti) * 6 + ch
    total = pl.num_programs(0) * nt * 6
    slot = jax.lax.rem(k, 2)
    nxt = jax.lax.rem(k + 1, 2)

    def copy(kk, slot_idx):
        bb = jax.lax.div(kk, nt * 6)
        rest = jax.lax.rem(kk, nt * 6)
        tt = jax.lax.div(rest, 6)
        cc = jax.lax.rem(rest, 6)
        return pltpu.make_async_copy(
            diffs_hbm.at[bb, cc, pl.ds(tt * tile, slab_rows), :],
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

    _shift_slab(slab2[slot], shifted, wp=wp, w=w, halo="roll")

    @pl.when(ch == 0)
    def _():
        out_ref[0, 0] = jnp.zeros((tile, wp), jnp.float32)
        out_ref[0, 1] = jnp.zeros((tile, wp), jnp.float32)

    def add_sweep(lines):
        acc = _sweep_shifted(shifted, lines, tile)
        is_ac1 = (ch % 2) == 0
        out_ref[0, 0] = out_ref[0, 0] + jnp.where(is_ac1, 0.0, 1.0) * acc
        out_ref[0, 1] = out_ref[0, 1] + jnp.where(is_ac1, 1.0, 0.0) * acc

    @pl.when(ch < 2)
    def _():
        add_sweep(lines_full)

    @pl.when(ch >= 2)
    def _():
        add_sweep(lines_lf)


def _malta_kernel_fused_channels(
    slab_ref, out_ref, shifted, *, tile, wp, w, lines_full, lines_lf, halo
):
    """All six channels in one grid step: grid (B, nt) instead of
    (B, nt, 6).  Same DMA volume, 6x fewer grid steps — at sub-res sizes
    (256px) the per-step overhead was ~40% of the sweep's wall time."""
    acc0 = jnp.zeros((tile, wp), jnp.float32)
    acc1 = jnp.zeros((tile, wp), jnp.float32)
    for ci, (dest, kind) in enumerate(_CHANNEL_SPEC):
        _shift_slab(
            slab_ref[0, ci, 0] if halo == "roll" else None,
            shifted,
            wp=wp,
            w=w,
            halo=halo,
            slab_ref_slice=None if halo == "roll" else slab_ref[0, ci, 0],
        )
        acc = _sweep_shifted(
            shifted, lines_full if kind == "full" else lines_lf, tile
        )
        if dest == 0:
            acc0 = acc0 + acc
        else:
            acc1 = acc1 + acc
    out_ref[0, 0] = acc0
    out_ref[0, 1] = acc1


def _prologue_tile(l0, l1, n2g, n2l, n1):
    """In-kernel Malta prologue (kernels/butteraugli.py _malta_prologue) with
    the scalar weight algebra pre-resolved host-side: n2g/n2l are
    ``mulli*sqrt(W*w)/(2*len+1)*norm1`` for the >/< asymmetry branches."""
    diff = l0 - l1
    denom = n1 + 0.5 * (jnp.abs(l0) + jnp.abs(l1))
    diffs = (n2g / denom) * diff
    scaler2 = n2l / denom
    fabs0 = jnp.abs(l0)
    too_small = 0.55 * fabs0
    too_big = 1.05 * fabs0
    impact_pos = jnp.where(
        l1 < too_small,
        scaler2 * (too_small - l1),
        jnp.where(l1 > too_big, -scaler2 * (l1 - too_big), 0.0),
    )
    impact_neg = jnp.where(
        l1 > -too_small,
        -scaler2 * (l1 + too_small),
        jnp.where(l1 < -too_big, scaler2 * (-l1 - too_big), 0.0),
    )
    return diffs + jnp.where(l0 >= 0, impact_pos, impact_neg)


def _l2_tile(v0, v1, w_0gt1, w_0lt1):
    """In-kernel asymmetric L2 (kernels/butteraugli.py _l2_diff_asymmetric)."""
    d = v0 - v1
    total = 0.8 * w_0gt1 * d * d
    fabs0 = jnp.abs(v0)
    too_small = 0.4 * fabs0
    pos = jnp.where(
        v1 < too_small, too_small - v1, jnp.where(v1 > fabs0, v1 - fabs0, 0.0)
    )
    neg = jnp.where(
        v1 > -too_small, v1 + too_small, jnp.where(v1 < -fabs0, -v1 - fabs0, 0.0)
    )
    v = jnp.where(v0 < 0, neg, pos)
    return total + 0.8 * w_0lt1 * v * v


def _malta_kernel_fused_epilogue(
    cand_ref, ref_ref, crest_ref, rrest_ref, dac_ref, masks_ref, out_ref,
    shifted, *, tile, wp, w, lines_full, lines_lf, ch_consts, epi
):
    """Whole-diffmap grid step: prologue + six channel sweeps + L2/DC band
    diffs + mask combine + sqrt, per (batch, row-tile) cell.

    Replaces the three-pass flow (diff-stack pass, Malta kernel, XLA
    epilogue) of butteraugli's _diffmap_psycho: the asymmetric diff planes
    never touch HBM and the only output is the final diffmap plane.
    """
    r = _RADIUS
    acc0 = jnp.zeros((tile, wp), jnp.float32)
    acc1 = jnp.zeros((tile, wp), jnp.float32)
    for ci, (dest, kind) in enumerate(_CHANNEL_SPEC):
        n2g, n2l, n1 = ch_consts[ci]
        diffslab = _prologue_tile(
            ref_ref[0, ci, 0], cand_ref[0, ci, 0], n2g, n2l, n1
        )
        _shift_slab(diffslab, shifted, wp=wp, w=w, halo="roll")
        acc = _sweep_shifted(
            shifted, lines_full if kind == "full" else lines_lf, tile
        )
        if dest == 0:
            acc0 = acc0 + acc
        else:
            acc1 = acc1 + acc

    (l2x_g, l2x_l, l2y_g, l2y_l,
     wmul_mfx, wmul_mfy, wmul_mfb,
     wmul_lfx, wmul_lfy, wmul_lfb, xmul) = epi
    cc = slice(r, r + tile)
    # Slab channel order: uhf_y, uhf_x, hf_y, hf_x, mf_y, mf_x.
    ac0 = acc0 + _l2_tile(ref_ref[0, 3, 0][cc], cand_ref[0, 3, 0][cc], l2x_g, l2x_l)
    ac1 = acc1 + _l2_tile(ref_ref[0, 2, 0][cc], cand_ref[0, 2, 0][cc], l2y_g, l2y_l)
    d_mfx = ref_ref[0, 5, 0][cc] - cand_ref[0, 5, 0][cc]
    ac0 = ac0 + wmul_mfx * d_mfx * d_mfx
    d_mfy = ref_ref[0, 4, 0][cc] - cand_ref[0, 4, 0][cc]
    ac1 = ac1 + wmul_mfy * d_mfy * d_mfy
    # Rest channel order: mf_b, lf_x, lf_y, lf_b.
    d_mfb = rrest_ref[0] - crest_ref[0, 0]
    ac2 = wmul_mfb * d_mfb * d_mfb
    ac1 = ac1 + dac_ref[0]
    d_lfx = rrest_ref[1] - crest_ref[0, 1]
    d_lfy = rrest_ref[2] - crest_ref[0, 2]
    d_lfb = rrest_ref[3] - crest_ref[0, 3]
    dc = (
        xmul * (wmul_lfx * d_lfx * d_lfx)
        + wmul_lfy * d_lfy * d_lfy
        + wmul_lfb * d_lfb * d_lfb
    )
    total = masks_ref[1] * dc + masks_ref[0] * (
        xmul * ac0 + ac1 + ac2
    )
    out_ref[0] = jnp.sqrt(jnp.maximum(total, 0.0))


# Calibrated scoped-VMEM stack model for the fused-epilogue grid step.
# Mosaic measured the real high-water at 20.85 MB for (slab_rows 56, wp 1024)
# — the BENCH_r03 compile OOM — i.e. ~91 live f32 (row, lane) slab-planes
# once the double-buffered six-channel input blocks, the 9 shifted copies and
# the unrolled sweeps' line-sum temporaries are all counted.  The previous
# hand-derived 12-plane estimate was ~7x low and admitted wp=1024 at tile 48;
# this model is anchored on the measurement, keeps 2 MB of margin under the
# 16 MB scoped limit, and callers additionally confirm each geometry with a
# real compile probe (kernels/butteraugli.py _fused_diffmap_compiles) so a
# wrong estimate can never crash a bench run again.
_FUSED_EPI_PLANES = 91  # 20.85 MB / (56 rows * 1024 lanes * 4 B)
_FUSED_EPI_BUDGET = 14 * 1024 * 1024
_TILE_CANDIDATES = (48, 40, 32, 24, 16, 8)  # multiples of 8 (sublane dim)


def _fused_epi_tile(h: int, w: int) -> int | None:
    """Largest row tile whose modeled stack footprint fits, or None."""
    wp = ((w + 127) // 128) * 128
    for tile in _TILE_CANDIDATES:
        if _FUSED_EPI_PLANES * (tile + 2 * _RADIUS) * wp * 4 <= _FUSED_EPI_BUDGET:
            return min(tile, ((h + 7) // 8) * 8)
    return None


def fused_epilogue_supported(h: int, w: int) -> bool:
    """Whether the whole-diffmap fused kernel's modeled footprint fits.

    A static pre-filter only: callers on a real TPU backend must also pass
    the compile probe before enabling the kernel (see butteraugli.py
    ``_fused_diffmap_ok``).
    """
    return _fused_epi_tile(h, w) is not None


@functools.partial(
    jax.jit,
    static_argnames=("lines_full", "lines_lf", "ch_consts", "epi", "interpret"),
)
def malta_diffmap_batch_pallas(
    cand6: jnp.ndarray,
    ref6: jnp.ndarray,
    cand_rest: jnp.ndarray,
    ref_rest: jnp.ndarray,
    dac: jnp.ndarray,
    masks: jnp.ndarray,
    lines_full,
    lines_lf,
    ch_consts,
    epi,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused butteraugli diffmap: (B, 6, H, W) candidate sweep planes +
    reference planes + band/mask inputs -> (B, H, W) distance map.

    - ``cand6``/``ref6``: the six Malta band planes (uhf_y, uhf_x, hf_y,
      hf_x, mf_y, mf_x) of candidate / reference PsychoImages.
    - ``cand_rest``/``ref_rest``: (B, 4, H, W) / (4, H, W) mf_b + lf planes.
    - ``dac``: (B, H, W) candidate-side masking term.
    - ``masks``: (2, H, W) (MaskY, MaskDcY) response maps.
    - ``ch_consts``: per-channel static (norm2_gt, norm2_lt, norm1).
    - ``epi``: static epilogue weights (L2 hf x/y pairs, WMUL mf/lf, xmul).
    """
    b, c, h, w = cand6.shape
    assert c == 6, cand6.shape
    r = _RADIUS
    wp = ((w + 127) // 128) * 128

    import os

    forced = int(os.environ.get("CODEC_EVAL_MALTA_TILE", "0"))
    tile = min(forced, ((h + 7) // 8) * 8) if forced > 0 else _fused_epi_tile(h, w)
    if tile is None:
        raise ValueError(
            f"fused-epilogue Malta kernel does not fit at {h}x{w} "
            "(see fused_epilogue_supported)"
        )
    hp = ((h + tile - 1) // tile) * tile
    nt = hp // tile
    slab_rows = tile + 2 * r

    def slabs_of(x6):
        pad = ((0, 0), (0, 0), (r, (hp - h) + r), (0, wp - w))
        if x6.ndim == 3:
            x6 = x6[None]
        xp = jnp.pad(x6, pad)
        return jnp.stack(
            [xp[:, :, i * tile : i * tile + slab_rows, :] for i in range(nt)],
            axis=2,
        )

    cand_slabs = slabs_of(cand6)
    ref_slabs = slabs_of(ref6)
    pad2 = ((0, (hp - h)), (0, wp - w))
    crest = jnp.pad(cand_rest, ((0, 0),) * 2 + pad2)
    rrest = jnp.pad(ref_rest, ((0, 0),) + pad2)
    dac_p = jnp.pad(dac, ((0, 0),) + pad2)
    masks_p = jnp.pad(masks, ((0, 0),) + pad2)

    kernel = functools.partial(
        _malta_kernel_fused_epilogue,
        tile=tile,
        wp=wp,
        w=w,
        lines_full=lines_full,
        lines_lf=lines_lf,
        ch_consts=ch_consts,
        epi=epi,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(
                (1, 6, 1, slab_rows, wp),
                lambda bi, ti: (bi, 0, ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 6, 1, slab_rows, wp),
                lambda bi, ti: (0, 0, ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4, tile, wp),
                lambda bi, ti: (bi, 0, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, tile, wp),
                lambda bi, ti: (0, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile, wp),
                lambda bi, ti: (bi, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (2, tile, wp),
                lambda bi, ti: (0, ti, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, wp),
            lambda bi, ti: (bi, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * r + 1, slab_rows, wp), jnp.float32),
        ],
        interpret=interpret,
    )(cand_slabs, ref_slabs, crest, rrest, dac_p, masks_p)
    if hp != h or wp != w:
        out = out[:, :h, :w]
    return out


@functools.partial(
    jax.jit, static_argnames=("lines_full", "lines_lf", "interpret", "halo")
)
def malta_ac_batch_pallas(
    diffs: jnp.ndarray,
    lines_full,
    lines_lf,
    interpret: bool = False,
    halo: str | None = None,
) -> jnp.ndarray:
    """(B, 6, H, W) diff planes -> (B, 2, H, W) Malta accumulators.

    ``lines_full`` / ``lines_lf`` are the static line-pattern tuples from
    ``kernels/butteraugli.py`` (hashable, passed through for jit caching).
    """
    b, c, h, w = diffs.shape
    assert c == 6, diffs.shape
    r = _RADIUS

    import os

    # Lane-halo strategy: "roll" (default) keeps the input block exactly wp
    # lanes wide and realizes the dx shifts as in-kernel lane rotations with
    # wrap masking; "slab" pads an explicit lane halo, which 128-alignment
    # inflates to wp_in (640 for 512px, +25% input DMA; 384 for 256px, +50%).
    if halo is None:
        halo = os.environ.get("CODEC_EVAL_MALTA_HALO", "roll")

    # Output width is lane-aligned; under "slab" staging the input must also
    # cover the sweep halo on both sides so every in-kernel slice is in range.
    wp = ((w + 127) // 128) * 128
    wp_in = wp if halo == "roll" else ((wp + 2 * r + 127) // 128) * 128

    # Row tile: multiples of 8, sized so the per-step VMEM footprint
    # (shifted copies + in/out blocks + live line sums) stays well under
    # the 16 MB scoped budget.  Measured at 512px/50 candidates (BA-only
    # chunk slope, tools/experiment_malta_tile.py): 48 -> 27.4 ms,
    # 64 -> 27.6, 32 -> 27.9, 96 -> 28.5, 128 -> 29.5 — same small-tile
    # sweet spot as the bands kernel.  CODEC_EVAL_MALTA_TILE overrides
    # for A/B tuning.
    forced = int(os.environ.get("CODEC_EVAL_MALTA_TILE", "0"))
    tile = forced if forced > 0 else 48
    while tile > 8 and (2 * r + 13) * (tile + 2 * r) * wp * 4 > 8 * 1024 * 1024:
        tile //= 2
    tile = min(tile, ((h + 7) // 8) * 8)
    hp = ((h + tile - 1) // tile) * tile
    nt = hp // tile
    slab_rows = tile + 2 * r  # both are multiples of 8

    # Zero-pad (halo + alignment), then restage as overlapping row slabs
    # (B, 6, nt, slab_rows, wp_in) so the grid reads non-overlapping blocks.
    # Under "roll" the image sits at lane 0 (no lane halo).
    lane_pad = (0, wp - w) if halo == "roll" else (r, wp_in - w - r)
    pad = ((0, 0), (0, 0), (r, (hp - h) + r), lane_pad)
    diffs_p = jnp.pad(diffs, pad)

    # Channel handling: "grid" keeps the channel as the innermost grid axis
    # (out block resident across channels); "fused" loops all six channels
    # inside one grid step — 6x fewer steps, same DMA volume, a win where
    # the per-step overhead dominates (sub-res sweeps).  Auto: fused when
    # the 6-channel input block fits comfortably in VMEM.
    ch_mode = os.environ.get("CODEC_EVAL_MALTA_CHANNELS", "auto")
    if ch_mode == "auto":
        # The six unrolled channel sweeps keep their line-sum temporaries
        # live together: measured 16.7 MB scoped VMEM at wp 2048 / tile 24
        # (an OOM), comfortably under budget at wp <= 1024.  Fused wins
        # ~3.5% end-to-end at 512px (6x fewer grid steps); fall back to the
        # channel-grid form on CLIC-class widths.
        fits = 6 * slab_rows * wp_in * 4 <= 4 * 1024 * 1024 and wp_in <= 1024
        ch_mode = "fused" if fits else "grid"
    restage = os.environ.get("CODEC_EVAL_MALTA_RESTAGE", "auto")
    if (
        ch_mode == "grid"
        and halo == "roll"
        and not interpret
        and restage != "stack"
    ):
        # Wide (CLIC-class) widths run the channel-grid form; DMA the
        # window from the padded diff array instead of materializing the
        # overlap-slab restage (~676 MB written + re-read at 2048px/5).
        kernel = functools.partial(
            _malta_kernel_dma,
            tile=tile,
            wp=wp,
            w=w,
            lines_full=lines_full,
            lines_lf=lines_lf,
            slab_rows=slab_rows,
            nt=nt,
        )
        out = pl.pallas_call(
            kernel,
            grid=(b, nt, 6),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (1, 2, tile, wp),
                lambda bi, ti, ci: (bi, 0, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, 2, hp, wp), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2 * r + 1, slab_rows, wp), jnp.float32),
                pltpu.VMEM((2, slab_rows, wp), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(diffs_p)
        if hp != h or wp != w:
            out = out[:, :, :h, :w]
        return out

    slabs = jnp.stack(
        [diffs_p[:, :, i * tile : i * tile + slab_rows, :] for i in range(nt)],
        axis=2,
    )

    if ch_mode == "fused":
        kernel = functools.partial(
            _malta_kernel_fused_channels,
            tile=tile,
            wp=wp,
            w=w,
            lines_full=lines_full,
            lines_lf=lines_lf,
            halo=halo,
        )
        out = pl.pallas_call(
            kernel,
            grid=(b, nt),
            in_specs=[
                pl.BlockSpec(
                    (1, 6, 1, slab_rows, wp_in),
                    lambda bi, ti: (bi, 0, ti, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, 2, tile, wp),
                lambda bi, ti: (bi, 0, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, 2, hp, wp), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2 * r + 1, slab_rows, wp), jnp.float32),
            ],
            interpret=interpret,
        )(slabs)
        if hp != h or wp != w:
            out = out[:, :, :h, :w]
        return out

    kernel = functools.partial(
        _malta_kernel,
        tile=tile,
        wp=wp,
        w=w,
        lines_full=lines_full,
        lines_lf=lines_lf,
        halo=halo,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nt, 6),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, slab_rows, wp_in),
                lambda bi, ti, ci: (bi, ci, ti, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 2, tile, wp),
            lambda bi, ti, ci: (bi, 0, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 2, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * r + 1, slab_rows, wp), jnp.float32),
        ],
        interpret=interpret,
    )(slabs)
    if hp != h or wp != w:
        out = out[:, :, :h, :w]
    return out
