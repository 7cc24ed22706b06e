"""Separable Gaussian blur + 2x2 box downsample as XLA-friendly JAX kernels.

These are the workhorse ops under every perceptual metric (SSIMULACRA2's
multi-scale moments, Butteraugli's frequency bands).  Layout convention is
planar ``(C, H, W)`` so the image width rides the TPU lane dimension; the
channel axis doubles as a fusion axis — callers stack every plane that needs
the same blur (mu/sigma moments of both images) into one ``C`` so a single
conv pass computes all windowed moments (SURVEY.md §7 step 8).

Equivalent behavior in the reference lives inside the external ``fast-ssim2``
/ ``butteraugli`` crates (reference: src/metrics/ssimulacra2.rs:96,
src/metrics/butteraugli.rs:70-80); there it is recursive-IIR SIMD code.  On
TPU a truncated FIR Gaussian maps better: it is a dense, static-shape conv
that XLA tiles onto the vector/matrix units, while an IIR scan would serialize
the sublane dimension.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def gaussian_taps(sigma: float, radius: int | None = None) -> np.ndarray:
    """Normalized 1-D Gaussian taps.

    Radius defaults to 4.5*sigma: truncated tail mass < 4e-6 per side,
    orders of magnitude below metric tolerance (the reference's recursive
    Gaussian is itself only a ~1e-3-accurate Gaussian approximation), while
    cutting ~20% of the blur work relative to a 6-sigma support.
    """
    if radius is None:
        radius = max(1, int(math.ceil(4.5 * sigma)))
    n = np.arange(-radius, radius + 1, dtype=np.float64)
    taps = np.exp(-0.5 * (n / sigma) ** 2)
    taps /= taps.sum()
    return taps.astype(np.float32)


import os

#: Blur implementation: "auto" (default — banded matmul on the TPU MXU,
#: shifted-slice accumulation elsewhere), or force "matmul" / "shifted" /
#: "conv" for A/B profiling.  All compute identical zero-padded FIR
#: Gaussians (verified to 2e-7).
BLUR_IMPL = os.environ.get("CODEC_EVAL_BLUR_IMPL", "auto")


def blur_separable(planes: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Gaussian-blur a stack of planes ``(C, H, W)`` with zero-padded borders.

    Zero boundary extension mirrors the reference kernels' recursive filters,
    which treat samples outside the image as zero.
    """
    impl = BLUR_IMPL
    if impl == "auto":
        # Lane-dim shifts lower to expensive shuffles on TPU; the banded
        # (N, N) contraction trades ~50x FLOPs for MXU throughput and wins
        # ~1.3x end-to-end.  Off-TPU the FIR formulation is far cheaper.
        impl = "matmul" if jax.default_backend() in ("tpu", "axon") else "shifted"
    if impl == "conv":
        return _blur_conv(planes, sigma)
    if impl == "matmul":
        return _blur_matmul(planes, sigma)
    return _blur_shifted(planes, sigma)


@functools.lru_cache(maxsize=None)
def _banded_matrix(n: int, sigma: float) -> np.ndarray:
    """(n, n) banded Toeplitz Gaussian operator (zero boundary)."""
    taps = gaussian_taps(sigma)
    r = len(taps) // 2
    m = np.zeros((n, n), np.float32)
    for k, t in enumerate(taps):
        d = k - r
        idx = np.arange(max(0, -d), min(n, n - d))
        m[idx, idx + d] = t
    return m


#: MXU accumulation precision for the matmul blur:
#:   "highest" (default) — 6-pass bf16 ~= true f32 (blur error ~2e-7);
#:   "high" — 3-pass bf16: ~28% faster sweeps, SSIMULACRA2 scores drift by
#:   up to ~0.02 points.  Set CODEC_EVAL_BLUR_PRECISION=high for iteration
#:   loops where raw throughput matters more than the last 0.02 points.
BLUR_PRECISION = os.environ.get("CODEC_EVAL_BLUR_PRECISION", "highest")


#: Minimum number of 128-blocks per axis before the matmul blur switches to
#: the block-tridiagonal gather-einsum form: the dense (n, n) contraction
#: costs n/384x more MXU FLOPs (5.3x at 2048px) for a band that is at most
#: ~2*ceil(4.5*sigma)+1 wide.  Below the threshold the dense form's single
#: big matmul wins on dispatch/layout overhead.
_MM_BANDED_MIN_BLOCKS = int(
    os.environ.get("CODEC_EVAL_BLUR_MM_BANDED_MIN_BLOCKS", "8")
)

#: Same switch for the pair-mean downscale's block form, in 256-column
#: input blocks (so the default matches the blur gate's >=1024px width).
_DOWNSCALE_BANDED_MIN_BLOCKS = int(
    os.environ.get("CODEC_EVAL_DOWNSCALE_BANDED_MIN_BLOCKS", "4")
)


@functools.lru_cache(maxsize=None)
def _block_banded_operator(n: int, sigma: float) -> np.ndarray:
    """(nb, 128, 384) block-tridiagonal operator of the (n, n) banded blur:
    output block i contracts [m_{i,i-1} | m_{i,i} | m_{i,i+1}] against the
    stacked [x_{i-1}; x_i; x_{i+1}] (zero blocks at the edges).  Valid while
    the band half-width fits in one 128 block."""
    m = _banded_matrix(n, sigma)
    nb = n // 128
    B = np.zeros((nb, 128, 384), np.float32)
    for i in range(nb):
        r = slice(i * 128, (i + 1) * 128)
        if i > 0:
            B[i, :, :128] = m[r, (i - 1) * 128 : i * 128]
        B[i, :, 128:256] = m[r, r]
        if i < nb - 1:
            B[i, :, 256:] = m[r, (i + 1) * 128 : (i + 2) * 128]
    return B


def _banded_neighbor_stack(xb: jnp.ndarray, axis: int):
    """Zero-padded shifted copies of the block axis (x_{i-1}, x_{i+1})."""
    zeros = jnp.zeros_like(jax.lax.slice_in_dim(xb, 0, 1, axis=axis))
    below = jnp.concatenate(
        [zeros, jax.lax.slice_in_dim(xb, 0, xb.shape[axis] - 1, axis=axis)],
        axis=axis,
    )
    above = jnp.concatenate(
        [jax.lax.slice_in_dim(xb, 1, xb.shape[axis], axis=axis), zeros],
        axis=axis,
    )
    return below, above


def _banded_rows_mm(planes: jnp.ndarray, n: int, sigma: float, prec) -> jnp.ndarray:
    """Row (sublane-axis) blur as ONE block-banded gather-einsum — a single
    output write, no scatter-adds (the 3-einsum + .at[].add form measured
    bandwidth-bound at 2048px in the butteraugli LF path)."""
    B = jnp.asarray(_block_banded_operator(n, sigma))
    nb = n // 128
    lead = planes.shape[:-2]
    w = planes.shape[-1]
    xb = planes.reshape(lead + (nb, 128, w))
    below, above = _banded_neighbor_stack(xb, axis=len(lead))
    xg = jnp.concatenate([below, xb, above], axis=-2)  # (..., nb, 384, w)
    out = jnp.einsum("bok,...bkw->...bow", B, xg, precision=prec)
    return out.reshape(lead + (n, w))


def _banded_cols_mm(planes: jnp.ndarray, n: int, sigma: float, prec) -> jnp.ndarray:
    """Column (lane-axis) blur applied from the right — no transposes."""
    B = jnp.asarray(_block_banded_operator(n, sigma))
    nb = n // 128
    lead = planes.shape[:-2]
    h = planes.shape[-2]
    xb = planes.reshape(lead + (h, nb, 128))
    below, above = _banded_neighbor_stack(xb, axis=len(lead) + 1)
    xg = jnp.concatenate([below, xb, above], axis=-1)  # (..., h, nb, 384)
    out = jnp.einsum("...hbk,bok->...hbo", xg, B, precision=prec)
    return out.reshape(lead + (h, n))


def _mm_banded_ok(n: int, sigma: float) -> bool:
    radius = len(gaussian_taps(sigma)) // 2
    return n % 128 == 0 and n // 128 >= _MM_BANDED_MIN_BLOCKS and radius <= 128


def _blur_matmul(planes: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable blur as two banded matmuls — rides the MXU.

    The FIR formulations shift along the lane dimension, which lowers to
    expensive lane shuffles; a banded (N, N) contraction trades ~50x more
    FLOPs for MXU throughput and no shuffles.  At CLIC-class sizes
    (>= _MM_BANDED_MIN_BLOCKS 128-blocks per axis) each direction drops to
    the block-tridiagonal gather-einsum form (5.3x fewer MXU FLOPs at
    2048px, one output write, no transposes).
    """
    prec = (
        jax.lax.Precision.HIGH
        if BLUR_PRECISION == "high"
        else jax.lax.Precision.HIGHEST
    )
    c, h, w = planes.shape
    if _mm_banded_ok(h, sigma):
        x = _banded_rows_mm(planes, h, sigma, prec)
    else:
        th = jnp.asarray(_banded_matrix(h, sigma))
        x = jnp.einsum("hk,ckw->chw", th, planes, precision=prec)
    if _mm_banded_ok(w, sigma):
        return _banded_cols_mm(x, w, sigma, prec)
    tw = jnp.asarray(_banded_matrix(w, sigma))
    return jnp.einsum("chw,kw->chk", x, tw, precision=prec)


def _blur_shifted(planes: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable FIR as unrolled shifted-slice accumulation.

    Each pass is K shifted multiply-adds over a zero-padded array — pure
    VPU elementwise work that XLA fuses with the surrounding metric math,
    avoiding the poorly-tiled single-feature conv lowering.
    """
    taps = gaussian_taps(sigma)
    k = len(taps)
    r = k // 2
    c, h, w = planes.shape
    xp = jnp.pad(planes, ((0, 0), (r, r), (0, 0)))
    out = taps[0] * xp[:, 0:h, :]
    for i in range(1, k):
        out = out + taps[i] * xp[:, i : i + h, :]
    xp = jnp.pad(out, ((0, 0), (0, 0), (r, r)))
    out = taps[0] * xp[:, :, 0:w]
    for i in range(1, k):
        out = out + taps[i] * xp[:, :, i : i + w]
    return out


def _blur_conv(planes: jnp.ndarray, sigma: float) -> jnp.ndarray:
    taps = jnp.asarray(gaussian_taps(sigma))
    k = taps.shape[0]
    c, h, w = planes.shape
    x = planes[:, None, :, :]  # (C, 1, H, W) — C as conv batch
    kern_h = taps.reshape(1, 1, k, 1)
    kern_w = taps.reshape(1, 1, 1, k)
    dn = jax.lax.conv_dimension_numbers(x.shape, kern_h.shape, ("NCHW", "OIHW", "NCHW"))
    pad = k // 2
    # Precision.HIGHEST keeps the conv in true f32 on the MXU (default would
    # drop inputs to bf16 — unacceptable for metric math).
    x = jax.lax.conv_general_dilated(
        x,
        kern_h,
        (1, 1),
        [(pad, pad), (0, 0)],
        dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x,
        kern_w,
        (1, 1),
        [(0, 0), (pad, pad)],
        dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
    )
    return x[:, 0, :, :]


#: 2x2 downscale implementation: "auto" (matmul column-pair averaging on
#: TPU, reshape-mean elsewhere), or force "matmul" / "reshape".  The
#: lane-dim pairwise mean in the reshape formulation lowers to expensive
#: shuffles on TPU: the 5-step 512px/25-candidate pyramid measured 1.42 ms
#: reshape vs 0.85 ms matmul (tools/experiment_downscale.py).
DOWNSCALE_IMPL = os.environ.get("CODEC_EVAL_DOWNSCALE_IMPL", "auto")


@functools.lru_cache(maxsize=None)
def pair_mean_matrix(n2: int) -> np.ndarray:
    """(2*n2, n2) column-pair averaging operator: out[:, j] = mean of
    columns 2j, 2j+1.  Rides the MXU; exact at HIGHEST precision (0.5 is
    exact in bf16, so the 6-pass split reconstructs f32 products)."""
    a = np.zeros((2 * n2, n2), np.float32)
    idx = np.arange(n2)
    a[2 * idx, idx] = 0.5
    a[2 * idx + 1, idx] = 0.5
    return a


def _use_matmul_downscale() -> bool:
    impl = DOWNSCALE_IMPL
    if impl == "auto":
        return jax.default_backend() in ("tpu", "axon")
    return impl == "matmul"


def downscale_by_2(planes: jnp.ndarray) -> jnp.ndarray:
    """2x2 box downscale with edge-clamped odd borders, on ``(C, H, W)``.

    Matches the reference metric's pyramid step: output size is ceil(n/2) and
    out-of-range source taps clamp to the last row/column (SURVEY.md §2.4 —
    fast-ssim2 half-res pyramid).
    """
    c, h, w = planes.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        planes = jnp.pad(planes, ((0, 0), (0, ph), (0, pw)), mode="edge")
    _, h2, w2 = planes.shape
    if DOWNSCALE_IMPL == "strided":
        rows = 0.5 * (planes[:, 0::2, :] + planes[:, 1::2, :])
        return 0.5 * (rows[:, :, 0::2] + rows[:, :, 1::2])
    if _use_matmul_downscale():
        if w2 % 256 == 0 and w2 // 256 >= _DOWNSCALE_BANDED_MIN_BLOCKS:
            # Block form: every 128-column output block draws only from its
            # own 256-column input block, so ONE fixed (256, 128) pair-mean
            # operator contracts per block — 16x fewer MXU FLOPs than the
            # dense (w, w/2) matrix at 2048px (A/B on-chip 2026-08-21:
            # 2.20 vs 5.86 ms for 15 planes per pyramid step).
            a = jnp.asarray(pair_mean_matrix(128))
            xg = planes.reshape(c, h2, w2 // 256, 256)
            cols = jnp.einsum(
                "chbk,ko->chbo", xg, a, precision=jax.lax.Precision.HIGHEST
            ).reshape(c, h2, w2 // 2)
        else:
            a = jnp.asarray(pair_mean_matrix(w2 // 2))
            cols = jnp.matmul(planes, a, precision=jax.lax.Precision.HIGHEST)
        return cols.reshape(c, h2 // 2, 2, w2 // 2).mean(axis=2)
    return (
        planes.reshape(c, h2 // 2, 2, w2 // 2, 2).mean(axis=(2, 4))
    )
