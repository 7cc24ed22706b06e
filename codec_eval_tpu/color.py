"""Host-side ICC color management (lcms2 via PIL.ImageCms).

Behavioral port of the reference's ICC layer (reference:
src/metrics/icc.rs:33-130).  The reference uses moxcms with linear
interpolation specifically because it matches libjxl/skcms closely
(documented accuracy table at src/metrics/icc.rs:16-27); here we bind lcms2
(already battle-tested, present via PIL) with relative-colorimetric intent
and no black-point compensation, the closest-matching configuration.

The device kernels always receive sRGB: ICC transforms happen once per
decoded image on the host, before batch staging.
"""

from __future__ import annotations

import io
from dataclasses import dataclass
from typing import Optional

import numpy as np

from .errors import MetricCalculationError


@dataclass
class ColorProfile:
    """Either sRGB or an embedded ICC profile.
    reference: src/metrics/icc.rs:33."""

    icc_data: Optional[bytes] = None

    @classmethod
    def srgb(cls) -> "ColorProfile":
        return cls(None)

    @classmethod
    def icc(cls, data: bytes) -> "ColorProfile":
        return cls(bytes(data))

    @classmethod
    def from_icc_bytes(cls, icc: Optional[bytes]) -> "ColorProfile":
        """sRGB unless ``icc`` is non-empty bytes.
        reference: src/metrics/icc.rs:50-55."""
        if icc:
            return cls.icc(icc)
        return cls.srgb()

    @property
    def is_srgb(self) -> bool:
        return self.icc_data is None


def transform_to_srgb(rgb_u8: np.ndarray, icc_profile: bytes) -> np.ndarray:
    """Transform (H, W, 3) u8 pixels tagged with `icc_profile` into sRGB.

    reference: src/metrics/icc.rs:69-103 (``transform_to_srgb``).
    """
    try:
        from PIL import Image, ImageCms
    except ImportError as e:  # pragma: no cover
        raise MetricCalculationError("ICC", f"PIL/ImageCms unavailable: {e}") from e

    try:
        src = ImageCms.ImageCmsProfile(io.BytesIO(icc_profile))
        dst = ImageCms.createProfile("sRGB")
        im = Image.fromarray(rgb_u8, mode="RGB")
        transform = ImageCms.buildTransform(
            src,
            dst,
            "RGB",
            "RGB",
            renderingIntent=ImageCms.Intent.RELATIVE_COLORIMETRIC,
        )
        out = ImageCms.applyTransform(im, transform)
        return np.asarray(out)
    except Exception as e:  # noqa: BLE001
        raise MetricCalculationError("ICC", f"transform failed: {e}") from e


def prepare_for_comparison(
    reference_rgb: np.ndarray,
    reference_profile: ColorProfile,
    test_rgb: np.ndarray,
    test_profile: ColorProfile,
) -> tuple[np.ndarray, np.ndarray]:
    """Bring both images into sRGB for metric calculation.
    reference: src/metrics/icc.rs:121-130."""
    ref = (
        reference_rgb
        if reference_profile.is_srgb
        else transform_to_srgb(reference_rgb, reference_profile.icc_data)
    )
    test = (
        test_rgb
        if test_profile.is_srgb
        else transform_to_srgb(test_rgb, test_profile.icc_data)
    )
    return ref, test
