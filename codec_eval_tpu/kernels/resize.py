"""On-device viewing-simulation resampling.

The reference *prescribes* rescaling for viewing simulation but does not
implement resampling in-repo (SURVEY.md §5: "resampling itself isn't
implemented"); this closes that gap with an XLA resize so Accurate-mode
simulation (browser up/downscaling, src/viewing.rs:244-301) can actually be
applied to pixels before scoring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("target_h", "target_w", "method"))
def resize_u8(
    image_u8: jnp.ndarray, target_h: int, target_w: int, method: str = "linear"
) -> jnp.ndarray:
    """Resize (H, W, 3) u8 sRGB to the target size on device.

    Resampling happens in linear light (gamma-correct scaling, the behavior
    browsers approximate), then re-encodes to sRGB u8.
    """
    from .color import linear_to_srgb_u8, srgb_u8_to_linear

    linear = srgb_u8_to_linear(image_u8)
    resized = jax.image.resize(
        linear, (target_h, target_w, 3), method=method, antialias=True
    )
    return linear_to_srgb_u8(resized)


def simulate_viewing(image_u8, params, method: str = "linear"):
    """Apply a ``SimulationParams`` transform to pixels.

    Returns the image rescaled to (target_height, target_width) when the
    simulation requires scaling, otherwise the input unchanged.  Callers
    then score at the simulated size and judge with ``adjusted_ppd``-based
    thresholds.
    """
    import numpy as np

    if not params.requires_scaling():
        return image_u8
    out = resize_u8(
        jnp.asarray(image_u8), int(params.target_height), int(params.target_width),
        method=method,
    )
    return np.asarray(out) if isinstance(image_u8, np.ndarray) else out
