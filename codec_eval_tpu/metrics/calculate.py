"""Flat metric entry points with the reference's calling conventions.

Name-level parity layer for migrating consumers (reference:
src/metrics/ssimulacra2.rs:59,135, src/metrics/dssim.rs:40,158,
src/metrics/butteraugli.rs:45,99,150, src/metrics/mod.rs:312): flat-buffer
or array inputs, explicit width/height, ICC-aware variants that transform
both images to sRGB before scoring, and the intensity-target butteraugli
knob.  All scoring runs through the device kernels.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..color import ColorProfile, prepare_for_comparison
from ..errors import DimensionMismatch


def _as_image(data, width: Optional[int], height: Optional[int]) -> np.ndarray:
    if isinstance(data, (bytes, bytearray, memoryview)):
        assert width is not None and height is not None
        return np.frombuffer(bytes(data), dtype=np.uint8).reshape(height, width, 3)
    arr = np.asarray(data)
    if arr.ndim == 1:
        assert width is not None and height is not None
        return arr.reshape(height, width, 3)
    return np.ascontiguousarray(arr[..., :3]).astype(np.uint8, copy=False)


def _check(ref: np.ndarray, test: np.ndarray) -> None:
    if ref.shape != test.shape:
        raise DimensionMismatch(
            (ref.shape[1], ref.shape[0]), (test.shape[1], test.shape[0])
        )


def calculate_ssimulacra2(
    reference, test, width: Optional[int] = None, height: Optional[int] = None
) -> float:
    """SSIMULACRA2 score in (-inf, 100].  reference: src/metrics/ssimulacra2.rs:59."""
    import jax.numpy as jnp

    from ..kernels.ssimulacra2 import ssimulacra2

    ref = _as_image(reference, width, height)
    tst = _as_image(test, width, height)
    _check(ref, tst)
    return float(ssimulacra2(jnp.asarray(ref), jnp.asarray(tst)))


def calculate_dssim(
    reference, test, width: Optional[int] = None, height: Optional[int] = None
) -> float:
    """DSSIM (0 = identical).  reference: src/metrics/dssim.rs:40."""
    import jax.numpy as jnp

    from ..kernels.dssim import dssim_u8

    ref = _as_image(reference, width, height)
    tst = _as_image(test, width, height)
    _check(ref, tst)
    return float(dssim_u8(jnp.asarray(ref), jnp.asarray(tst)))


def calculate_butteraugli(
    reference, test, width: Optional[int] = None, height: Optional[int] = None
) -> float:
    """Butteraugli max-norm distance.  reference: src/metrics/butteraugli.rs:45."""
    return calculate_butteraugli_with_intensity(
        reference, test, width, height, intensity_target=80.0
    )


def calculate_butteraugli_with_intensity(
    reference,
    test,
    width: Optional[int] = None,
    height: Optional[int] = None,
    intensity_target: float = 80.0,
) -> float:
    """Butteraugli at a display intensity target (nits).
    reference: src/metrics/butteraugli.rs:99."""
    import jax.numpy as jnp

    from ..kernels.butteraugli import butteraugli

    ref = _as_image(reference, width, height)
    tst = _as_image(test, width, height)
    _check(ref, tst)
    return float(
        butteraugli(
            jnp.asarray(ref), jnp.asarray(tst), intensity_target=intensity_target
        )
    )


def calculate_psnr(
    reference, test, width: Optional[int] = None, height: Optional[int] = None
) -> float:
    """PSNR in dB (inf for identical).  reference: src/metrics/mod.rs:312."""
    import jax.numpy as jnp

    from ..kernels.psnr import psnr

    ref = _as_image(reference, width, height)
    tst = _as_image(test, width, height)
    _check(ref, tst)
    return float(psnr(jnp.asarray(ref), jnp.asarray(tst)))


def _icc_pair(reference, test, width, height, ref_profile, test_profile):
    ref = _as_image(reference, width, height)
    tst = _as_image(test, width, height)
    _check(ref, tst)
    return prepare_for_comparison(
        ref, ref_profile or ColorProfile.srgb(), tst, test_profile or ColorProfile.srgb()
    )


def calculate_ssimulacra2_icc(
    reference, test, width=None, height=None,
    reference_profile: Optional[ColorProfile] = None,
    test_profile: Optional[ColorProfile] = None,
) -> float:
    """ICC-aware SSIMULACRA2: both images transformed to sRGB first.
    reference: src/metrics/ssimulacra2.rs:135."""
    ref, tst = _icc_pair(reference, test, width, height, reference_profile, test_profile)
    return calculate_ssimulacra2(ref, tst)


def calculate_dssim_icc(
    reference, test, width=None, height=None,
    reference_profile: Optional[ColorProfile] = None,
    test_profile: Optional[ColorProfile] = None,
) -> float:
    """reference: src/metrics/dssim.rs:158."""
    ref, tst = _icc_pair(reference, test, width, height, reference_profile, test_profile)
    return calculate_dssim(ref, tst)


def calculate_butteraugli_icc(
    reference, test, width=None, height=None,
    reference_profile: Optional[ColorProfile] = None,
    test_profile: Optional[ColorProfile] = None,
) -> float:
    """reference: src/metrics/butteraugli.rs:150."""
    ref, tst = _icc_pair(reference, test, width, height, reference_profile, test_profile)
    return calculate_butteraugli(ref, tst)


def rgb8_to_dssim_image(data, width: int, height: int) -> np.ndarray:
    """sRGB u8 RGB -> linear-light RGBA f32 (alpha=1), the pixel format
    dssim-core consumes.  reference: src/metrics/dssim.rs:102-115."""
    from ..utils.native import srgb_to_linear_host

    rgb = np.asarray(data, dtype=np.uint8).reshape(height, width, 3)
    out = np.empty((height, width, 4), np.float32)
    out[..., :3] = srgb_to_linear_host(rgb)
    out[..., 3] = 1.0
    return out


def rgba8_to_dssim_image(data, width: int, height: int) -> np.ndarray:
    """sRGB u8 RGBA -> linear-light RGBA f32 (alpha scaled 0-1 linearly).
    reference: src/metrics/dssim.rs:131-148."""
    from ..utils.native import srgb_to_linear_host

    rgba = np.asarray(data, dtype=np.uint8).reshape(height, width, 4)
    out = np.empty((height, width, 4), np.float32)
    out[..., :3] = srgb_to_linear_host(rgba[..., :3])
    out[..., 3] = rgba[..., 3].astype(np.float32) / 255.0
    return out


__all__ = [
    "calculate_ssimulacra2",
    "calculate_dssim",
    "rgb8_to_dssim_image",
    "rgba8_to_dssim_image",
    "calculate_butteraugli",
    "calculate_butteraugli_with_intensity",
    "calculate_psnr",
    "calculate_ssimulacra2_icc",
    "calculate_dssim_icc",
    "calculate_butteraugli_icc",
]
