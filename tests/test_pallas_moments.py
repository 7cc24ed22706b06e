"""Pallas fused-moments kernel tests.

On the CPU test backend the dispatcher falls back to the XLA path; the
Pallas path itself is exercised (bit-exactly, verified against XLA) on TPU
via tools/perf_probe-style runs.
"""

import numpy as np
import jax
import jax.numpy as jnp

from codec_eval_tpu.kernels.blur import blur_separable
from codec_eval_tpu.kernels.pallas.moments import fused_candidate_moments


def test_fused_moments_fallback_matches_xla():
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.random((3, 64, 96)).astype(np.float32))
    x2 = jnp.asarray(rng.random((3, 64, 96)).astype(np.float32))

    mu2, s22, s12 = fused_candidate_moments(x1, x2, 1.5)

    stacked = jnp.concatenate([x2, x2 * x2, x1 * x2], axis=0)
    blurred = blur_separable(stacked, 1.5)
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(blurred[:3]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s22), np.asarray(blurred[3:6]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s12), np.asarray(blurred[6:9]), atol=1e-6)


def test_blur_shifted_matches_conv():
    """The default shifted-slice blur is numerically identical to the conv
    formulation (same taps, same zero padding)."""
    from codec_eval_tpu.kernels import blur as blur_mod

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((5, 40, 56)).astype(np.float32))
    a = blur_mod._blur_shifted(x, 1.5)
    b = blur_mod._blur_conv(x, 1.5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
