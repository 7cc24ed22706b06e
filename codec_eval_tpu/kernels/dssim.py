"""DSSIM (structural dissimilarity) as a fused JAX/XLA pipeline.

TPU-native replacement for the scoring path the reference delegates to the
SIMD ``dssim-core`` crate (reference: src/metrics/dssim.rs:40-70).  Returns
``1/ssim - 1`` (0 = identical, larger = worse) from a multi-scale SSIM over
a perceptually uniform Lab-like space on linear-light input, following the
same recipe dssim-core documents: D65 Lab channels, 2x2 pyramid with the
Wang et al. MS-SSIM scale weights, Gaussian-windowed SSIM statistics.

Input contract matches the reference wrapper: linear-light RGB(A) f32
(callers convert from sRGB u8 via ``rgb8_to_dssim_image`` semantics,
reference: src/metrics/dssim.rs:102-131).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .blur import blur_separable, downscale_by_2

# MS-SSIM per-scale weights (Wang et al. 2003), also used by dssim-core.
SCALE_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)

# SSIM stabilizers on [0, 1]-ranged channels.
C1 = 0.01**2
C2 = 0.03**2

# Channel weighting: luminance dominates, chroma contributes at reduced
# weight (dssim-core subsamples chroma to half resolution with half weight;
# we model that as a direct weight on full-res chroma SSIM).
CHANNEL_WEIGHTS = (1.0, 0.25, 0.25)

SIGMA = 1.5

# D65 reference white for Lab.
_XN, _YN, _ZN = 0.95047, 1.0, 1.08883


def _linear_rgb_to_lab_planes(rgb_planes: jnp.ndarray) -> jnp.ndarray:
    """Linear RGB (3, H, W) -> normalized Lab planes (3, H, W), L in [0,1]."""
    r, g, b = rgb_planes[0], rgb_planes[1], rgb_planes[2]
    # sRGB D65 matrix (elementwise FMAs — keep off the bf16 MXU path).
    x = 0.4124564 * r + 0.3575761 * g + 0.1804375 * b
    y = 0.2126729 * r + 0.7151522 * g + 0.0721750 * b
    z = 0.0193339 * r + 0.1191920 * g + 0.9503041 * b

    def f(t):
        delta = 6.0 / 29.0
        return jnp.where(
            t > delta**3,
            jnp.cbrt(jnp.maximum(t, 1e-12)),
            t / (3 * delta * delta) + 4.0 / 29.0,
        )

    fx, fy, fz = f(x / _XN), f(y / _YN), f(z / _ZN)
    l_chan = 1.16 * fy - 0.16  # L*/100 in [0, 1]
    a_chan = 5.0 * (fx - fy)  # a*/100
    b_chan = 2.0 * (fy - fz)  # b*/100
    return jnp.stack([l_chan, a_chan, b_chan], axis=0)


def _scale_ssim(ch1: jnp.ndarray, ch2: jnp.ndarray) -> jnp.ndarray:
    """Mean SSIM per channel for one scale: (3, H, W) x2 -> (3,)."""
    stacked = jnp.concatenate(
        [ch1, ch2, ch1 * ch1, ch2 * ch2, ch1 * ch2], axis=0
    )  # (15, H, W)
    blurred = blur_separable(stacked, SIGMA)
    mu1, mu2 = blurred[0:3], blurred[3:6]
    s11, s22, s12 = blurred[6:9], blurred[9:12], blurred[12:15]
    mu11, mu22, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    var1 = s11 - mu11
    var2 = s22 - mu22
    cov = s12 - mu12
    ssim_map = ((2.0 * mu12 + C1) * (2.0 * cov + C2)) / (
        (mu11 + mu22 + C1) * (var1 + var2 + C2)
    )
    return ssim_map.mean(axis=(1, 2))


from typing import NamedTuple


class DssimReference(NamedTuple):
    """Per-scale precomputed reference data (Lab pyramid + blurred moments),
    reused across candidates — the same amortization as
    ``Ssimulacra2Reference`` (crates/codec-iter/src/eval.rs:138)."""

    lab: tuple  # per scale: (3, h, w)
    mu: tuple  # blur(lab)
    sqblur: tuple  # blur(lab*lab)


def precompute_dssim_reference(ref_linear: jnp.ndarray) -> DssimReference:
    """ref_linear: (3, H, W) or (H, W, 3) linear-light RGB."""
    if ref_linear.shape[-1] == 3 and ref_linear.ndim == 3:
        ref_linear = jnp.moveaxis(ref_linear, -1, 0)
    lab = _linear_rgb_to_lab_planes(ref_linear)
    labs, mus, sqs = [], [], []
    for scale in range(len(SCALE_WEIGHTS)):
        if scale:
            lab = downscale_by_2(lab)
        blurred = blur_separable(jnp.concatenate([lab, lab * lab], axis=0), SIGMA)
        labs.append(lab)
        mus.append(blurred[:3])
        sqs.append(blurred[3:])
    return DssimReference(tuple(labs), tuple(mus), tuple(sqs))


def _scale_ssim_against(
    lab1: jnp.ndarray, mu1: jnp.ndarray, s11: jnp.ndarray, lab2: jnp.ndarray
) -> jnp.ndarray:
    """Mean SSIM per channel using precomputed reference moments."""
    stacked = jnp.concatenate([lab2, lab2 * lab2, lab1 * lab2], axis=0)
    blurred = blur_separable(stacked, SIGMA)
    mu2, s22, s12 = blurred[0:3], blurred[3:6], blurred[6:9]
    mu11, mu22, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    var1 = s11 - mu11
    var2 = s22 - mu22
    cov = s12 - mu12
    ssim_map = ((2.0 * mu12 + C1) * (2.0 * cov + C2)) / (
        (mu11 + mu22 + C1) * (var1 + var2 + C2)
    )
    return ssim_map.mean(axis=(1, 2))


def dssim_against_reference(
    ref: DssimReference, dist_linear: jnp.ndarray
) -> jnp.ndarray:
    """Raw->calibrated DSSIM of one candidate vs a precomputed reference."""
    if dist_linear.shape[-1] == 3 and dist_linear.ndim == 3:
        dist_linear = jnp.moveaxis(dist_linear, -1, 0)
    lab2 = _linear_rgb_to_lab_planes(dist_linear)
    cweights = jnp.asarray(CHANNEL_WEIGHTS)
    total = jnp.asarray(0.0, dtype=lab2.dtype)
    weight_sum = 0.0
    for scale, sweight in enumerate(SCALE_WEIGHTS):
        if scale:
            lab2 = downscale_by_2(lab2)
        per_channel = _scale_ssim_against(
            ref.lab[scale], ref.mu[scale], ref.sqblur[scale], lab2
        )
        combined = jnp.sum(per_channel * cweights) / jnp.sum(cweights)
        total = total + sweight * combined
        weight_sum += sweight
    ssim = jnp.clip(total / weight_sum, 1e-6, 1.0)
    return _calibrate_scale(1.0 / ssim - 1.0)


def dssim(ref_linear: jnp.ndarray, dist_linear: jnp.ndarray) -> jnp.ndarray:
    """DSSIM over linear-light RGB planes or HWC arrays.

    Accepts (3, H, W) planes or (H, W, 3); returns a scalar, 0 = identical.
    Jittable / vmappable.
    """
    if ref_linear.shape[-1] == 3 and ref_linear.ndim == 3:
        ref_linear = jnp.moveaxis(ref_linear, -1, 0)
        dist_linear = jnp.moveaxis(dist_linear, -1, 0)

    lab1 = _linear_rgb_to_lab_planes(ref_linear)
    lab2 = _linear_rgb_to_lab_planes(dist_linear)

    cweights = jnp.asarray(CHANNEL_WEIGHTS)
    total = jnp.asarray(0.0, dtype=lab1.dtype)
    weight_sum = 0.0
    for scale, sweight in enumerate(SCALE_WEIGHTS):
        if scale:
            lab1 = downscale_by_2(lab1)
            lab2 = downscale_by_2(lab2)
        per_channel = _scale_ssim(lab1, lab2)  # (3,)
        combined = jnp.sum(per_channel * cweights) / jnp.sum(cweights)
        total = total + sweight * combined
        weight_sum += sweight
    ssim = total / weight_sum
    ssim = jnp.clip(ssim, 1e-6, 1.0)
    raw = 1.0 / ssim - 1.0
    val = _calibrate_scale(raw)
    # Exact-zero guarantee for identical buffers (mirrors reference behavior).
    identical = jnp.all(ref_linear == dist_linear)
    return jnp.where(identical, jnp.asarray(0.0, val.dtype), val)


def _calibrate_scale(raw: jnp.ndarray) -> jnp.ndarray:
    """Map the raw dissimilarity onto the reference's DSSIM threshold scale.

    The monotone power map is fitted by tools/calibrate_dssim.py via the
    perception-band correspondence with canonical butteraugli (the DSSIM and
    Butteraugli threshold tables label the same bands,
    reference: src/metrics/mod.rs:17-27)."""
    try:
        from .dssim_calibrated import SCALE_A, SCALE_B
    except ImportError:
        return raw
    return SCALE_A * jnp.power(jnp.maximum(raw, 1e-12), SCALE_B)


def dssim_u8(ref_u8: jnp.ndarray, dist_u8: jnp.ndarray) -> jnp.ndarray:
    """Convenience: sRGB u8 (H, W, 3) pair -> DSSIM scalar.

    Applies the same sRGB->linear conversion as the reference's
    ``rgb8_to_dssim_image`` (src/metrics/dssim.rs:102).
    """
    from .color import srgb_u8_to_linear

    return dssim(srgb_u8_to_linear(ref_u8), srgb_u8_to_linear(dist_u8))
