"""SSIMULACRA2 kernel tests: identity, brackets, monotonicity, batching.

Mirrors the reference's test brackets (src/metrics/ssimulacra2.rs:153-174):
identical images ~ perfect, heavy distortion ~ bad, and quality monotonicity
over a real JPEG sweep.
"""

import io

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from codec_eval_tpu.kernels.ssimulacra2 import ssimulacra2, ssimulacra2_batch


def _photo_like(w=128, h=128, seed=3):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = (
        110
        + 60 * np.sin(x / 9.0)
        + 50 * np.cos(y / 13.0)
        + rng.normal(0, 12, size=(h, w))
    )
    img = np.stack([base, base * 0.9 + 10, base * 0.8 + 20], axis=-1)
    return np.clip(img, 0, 255).astype(np.uint8)


def _jpeg(img, q):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=q)
    return np.array(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))


def test_identical_is_100():
    img = _photo_like()
    score = float(ssimulacra2(jnp.asarray(img), jnp.asarray(img)))
    assert score == pytest.approx(100.0, abs=1e-3)


def test_heavy_distortion_is_bad():
    img = _photo_like()
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, size=img.shape).astype(np.uint8)
    score = float(ssimulacra2(jnp.asarray(img), jnp.asarray(noise)))
    assert score < 20.0


def test_small_noise_is_mid():
    img = _photo_like()
    rng = np.random.default_rng(8)
    distorted = np.clip(
        img.astype(np.int16) + rng.integers(-6, 7, size=img.shape), 0, 255
    ).astype(np.uint8)
    score = float(ssimulacra2(jnp.asarray(img), jnp.asarray(distorted)))
    assert 20.0 < score < 99.0


def test_jpeg_quality_monotonicity():
    img = _photo_like(128, 128)
    qs = [30, 50, 70, 90]
    scores = [
        float(ssimulacra2(jnp.asarray(img), jnp.asarray(_jpeg(img, q)))) for q in qs
    ]
    assert scores == sorted(scores), scores
    assert scores[-1] > 55.0  # q90 should be decent
    assert scores[0] < scores[-1] - 3.0


def test_batch_matches_single():
    img = _photo_like()
    cands = np.stack([_jpeg(img, q) for q in (40, 80)])
    batch = np.asarray(ssimulacra2_batch(jnp.asarray(img), jnp.asarray(cands)))
    singles = [
        float(ssimulacra2(jnp.asarray(img), jnp.asarray(c))) for c in cands
    ]
    np.testing.assert_allclose(batch, singles, rtol=1e-5, atol=1e-4)


def test_odd_sizes():
    img = _photo_like(97, 61)
    score = float(ssimulacra2(jnp.asarray(img), jnp.asarray(img)))
    assert score == pytest.approx(100.0, abs=1e-3)


def test_jit_compiles_once_per_shape():
    img = _photo_like(64, 64)
    f = jax.jit(ssimulacra2)
    s1 = float(f(jnp.asarray(img), jnp.asarray(img)))
    s2 = float(f(jnp.asarray(img), jnp.asarray(255 - img)))
    assert s1 == pytest.approx(100.0, abs=1e-3)
    assert s2 < s1
