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
    slabs = jnp.stack(
        [diffs_p[:, :, i * tile : i * tile + slab_rows, :] for i in range(nt)],
        axis=2,
    )

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
