"""PSNR kernel.  reference: src/metrics/mod.rs:312-331."""

from __future__ import annotations

import jax.numpy as jnp


def psnr(reference_u8: jnp.ndarray, test_u8: jnp.ndarray) -> jnp.ndarray:
    """PSNR in dB over u8 RGB buffers of identical shape.

    Returns +inf for identical images, matching the reference.
    """
    diff = reference_u8.astype(jnp.float32) - test_u8.astype(jnp.float32)
    mse = jnp.mean(diff * diff)
    return jnp.where(
        mse == 0.0,
        jnp.inf,
        10.0 * jnp.log10(255.0 * 255.0 / jnp.maximum(mse, 1e-30)),
    )
