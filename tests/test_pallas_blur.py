"""Batched renormalized-blur Pallas kernel tests (interpreter mode on the
CPU test backend; the compiled path is gated on-chip by the preflight
parity/oracle gates — see kernels/pallas/blur.py notes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from codec_eval_tpu.kernels import butteraugli as ba
from codec_eval_tpu.kernels.pallas.blur import blur_batch_pallas


@pytest.mark.parametrize(
    "shape,sigma",
    [
        ((2, 3, 32, 48), ba.SIGMA_LF),
        ((1, 3, 27, 41), ba.SIGMA_LF),
        ((2, 1, 37, 53), ba.SIGMA_MASK),
    ],
)
def test_blur_pallas_matches_xla(shape, sigma):
    b, c, h, w = shape
    rng = np.random.default_rng(11)
    planes = jnp.asarray(rng.random(shape).astype(np.float32)) * 80.0
    want = np.asarray(jax.vmap(lambda p: ba._blur(p, sigma))(planes))
    got = np.asarray(blur_batch_pallas(planes, sigma, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("shape", [(1, 3, 24, 1030), (1, 1, 17, 653)])
def test_blur_pallas_column_tiled_matches_xla(shape):
    """Wide (CLIC-class) planes take the 2-D tiled path (nc > 1): column
    halos + per-tile border renormalization must reproduce the XLA matmul
    blur, including at interior tile seams and odd right edges."""
    b, c, h, w = shape
    rng = np.random.default_rng(12)
    planes = jnp.asarray(rng.random(shape).astype(np.float32)) * 80.0
    want = np.asarray(
        jax.vmap(lambda p: ba._blur(p, ba.SIGMA_LF))(planes)
    )
    got = np.asarray(blur_batch_pallas(planes, ba.SIGMA_LF, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


def test_blur_batch_router_matches_vmapped_blur():
    """_blur_batch's batched-XLA route (the default off-TPU) must be
    numerically identical to the historical vmapped _blur composition —
    the goldens pin through this path."""
    rng = np.random.default_rng(13)
    planes = jnp.asarray(rng.random((2, 3, 33, 47)).astype(np.float32))
    want = np.asarray(jax.vmap(lambda p: ba._blur(p, ba.SIGMA_MASK))(planes))
    got = np.asarray(ba._blur_batch(planes, ba.SIGMA_MASK))
    np.testing.assert_array_equal(got, want)
