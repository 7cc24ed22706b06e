"""Pallas TPU kernel: batched border-renormalized Gaussian blur.

Replaces the block-banded MXU matmul form of ``butteraugli._blur`` for
BATCHED planes at CLIC-class sizes.  The banded matmul saves 81% of the
dense FLOPs at 2048px, but the blur was never FLOP-bound there: the three
einsums + two scatter-adds + two full-plane transposes materialize ~4x the
plane's bytes in HBM per direction, and the measured cost (12.0 ms for the
sigma-7.16 LF blur of 15 planes at 2048px, tools/profile_psycho_stages.py
2026-08-21) is pure bandwidth.  This kernel runs the blur as a separable
FIR over halo'd row/column tiles resident in VMEM: each input byte is read
~1.4x (tile halos) and written once — the speed-of-light for an
out-of-place blur.

Exactness: identical semantics to ``_blur``'s row-normalized banded
Toeplitz matmul — a zero-padded raw-tap FIR multiplied by the separable
border-renormalization plane (``_recip_norm``; the same recipe the opsin
kernel's sigma-1.2 surround blur uses, parity-proven in
tests/test_pallas_freqsep.py).  Differences vs the matmul path are float
summation order only (~1e-7 relative).

Reference behavior anchor: the reference's blur is libjxl's recursive
Gaussian on CPU (/root/reference delegates metrics to crates; butteraugli
spec per the public algorithm).  Border semantics follow the model's
renormalized truncated Gaussian exactly, as established for the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .freqsep import _col_tile, _fir_h, _fir_v, _overlap_tiles2d, _recip_norm, _taps


def _blur_kernel(slab_ref, recip_ref, out_ref, bv_ref, *, taps, tile, wp, halo, c):
    # The 33-tap unrolled-sum form (freqsep._fir_v style) makes Mosaic keep
    # every tap product live on the scoped-VMEM stack at once (measured
    # 33.6 MB at tile 128 — a compile OOM).  Accumulating through a VMEM
    # scratch ref instead bounds liveness to one tap's temporary: each
    # ``ref[...] = ref[...] + piece`` statement frees its operands.
    r = len(taps) // 2
    x = slab_ref[0, :, 0, 0]  # (C, tile + 2*halo, ctile_in)
    bv_ref[...] = taps[0] * x[:, halo - r : halo - r + tile, :]
    for i, t in enumerate(taps[1:], start=1):
        bv_ref[...] = bv_ref[...] + t * x[:, halo - r + i : halo - r + i + tile, :]
    bv = bv_ref[...]
    out_ref[0, :, 0, 0] = taps[0] * bv[:, :, halo - r : halo - r + wp]
    for i, t in enumerate(taps[1:], start=1):
        out_ref[0, :, 0, 0] = (
            out_ref[0, :, 0, 0] + t * bv[:, :, halo - r + i : halo - r + i + wp]
        )
    out_ref[0, :, 0, 0] = out_ref[0, :, 0, 0] * recip_ref[0, 0]


@functools.partial(jax.jit, static_argnames=("sigma", "interpret"))
def blur_batch_pallas(
    planes: jnp.ndarray, sigma: float, interpret: bool = False
) -> jnp.ndarray:
    """(B, C, H, W) planes -> (B, C, H, W) renormalized Gaussian blur.

    One grid step per (batch, row-tile, column-tile); the column tiling
    (freqsep._col_tile) bounds VMEM independent of image width.
    """
    b, c, h, w = planes.shape
    taps = _taps(sigma)
    r = len(taps) // 2
    halo = ((r + 7) // 8) * 8

    ctile, nc, ctile_in = _col_tile(w, halo)
    # Scoped-VMEM model, calibrated on-chip 2026-08-21 (v5e): even with
    # scratch-accumulated FIRs Mosaic's stack measures ~(ntaps + 15)
    # live (tile + 2*halo, ctile_in) f32 row planes (19.4 MB at tile 128 /
    # 33 taps / ctile_in 640 — i.e. ~48 planes; the naive unrolled-sum form
    # measured 33.6 MB).  Halve the row tile until the model fits in a
    # 12 MB budget (16 MB hardware scoped limit minus headroom).
    tile = min(128, ((h + 7) // 8) * 8)
    while (
        tile > 8
        and (len(taps) + 15) * (tile + 2 * halo) * ctile_in * 4
        > 12 * 1024 * 1024
    ):
        tile //= 2
    hp = ((h + tile - 1) // tile) * tile
    nt = hp // tile
    wcp = ctile * nc

    slabs = _overlap_tiles2d(planes, tile, halo, hp, ctile, nc, ctile_in, w)

    recip = np.zeros((hp, wcp), np.float32)
    recip[:h, :w] = _recip_norm(h, w, sigma)
    recip_tiles = np.ascontiguousarray(
        recip.reshape(nt, tile, nc, ctile).transpose(0, 2, 1, 3)
    )

    kernel = functools.partial(
        _blur_kernel, taps=taps, tile=tile, wp=ctile, halo=halo, c=c
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nt, nc),
        in_specs=[
            pl.BlockSpec(
                (1, c, 1, 1, tile + 2 * halo, ctile_in),
                lambda bi, ti, ci: (bi, 0, ti, ci, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile, ctile),
                lambda bi, ti, ci: (ti, ci, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, c, 1, 1, tile, ctile),
            lambda bi, ti, ci: (bi, 0, ti, ci, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, nt, nc, tile, ctile), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, tile, ctile_in), jnp.float32)],
        interpret=interpret,
    )(slabs, jnp.asarray(recip_tiles))
    out = jnp.moveaxis(out, 4, 3).reshape(b, c, hp, wcp)
    if hp != h or wcp != w:
        out = out[:, :, :h, :w]
    return out


__all__ = ["blur_batch_pallas"]
