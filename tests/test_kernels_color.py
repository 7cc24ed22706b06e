"""Golden tests for color kernels against the reference's documented behavior.

reference: src/metrics/xyb.rs tests + documented quantization-loss table
(src/metrics/xyb.rs:13-24).
"""

import numpy as np
import jax.numpy as jnp

from codec_eval_tpu.kernels import color


def test_srgb_linear_roundtrip():
    v = jnp.linspace(0.0, 1.0, 256)
    rt = color.linear_to_srgb(color.srgb_to_linear(v))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(v), atol=1e-5)


def test_srgb_linear_known_points():
    # sRGB 0.5 -> linear ~0.2140; linear 0.5 -> srgb ~0.7354
    assert abs(float(color.srgb_to_linear(jnp.float32(0.5))) - 0.21404114) < 1e-5
    assert abs(float(color.linear_to_srgb(jnp.float32(0.5))) - 0.7353569) < 1e-5


def test_xyb_roundtrip_inverse_math():
    """Without quantization, XYB conversion must invert exactly."""
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.random((64, 3)), dtype=jnp.float32)
    xyb = color.linear_rgb_to_xyb(rgb)
    back = color.xyb_to_linear_rgb(xyb)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=2e-5)


def test_xyb_white_point():
    """White (1,1,1) maps to X ~ 0, Y ~ 0.845 (top of documented Y range)."""
    xyb = np.asarray(color.linear_rgb_to_xyb(jnp.ones((1, 3))))[0]
    assert abs(xyb[0]) < 1e-3
    assert abs(xyb[1] - 0.8453) < 1e-2
    assert abs(xyb[2] - 0.8453) < 1e-2


def test_xyb_black_point():
    xyb = np.asarray(color.linear_rgb_to_xyb(jnp.zeros((1, 3))))[0]
    np.testing.assert_allclose(xyb, 0.0, atol=1e-6)


def test_xyb_ranges_cover_all_srgb():
    """Documented empirical ranges (src/metrics/xyb.rs:185-190) hold for a
    dense sRGB sample."""
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, size=(4096, 3)).astype(np.uint8)
    # include extremes
    u8[0] = [255, 255, 0]
    u8[1] = [0, 0, 255]
    u8[2] = [255, 255, 255]
    u8[3] = [0, 0, 0]
    xyb = np.asarray(color.linear_rgb_to_xyb(color.srgb_u8_to_linear(jnp.asarray(u8))))
    assert xyb[:, 0].min() >= -0.016 and xyb[:, 0].max() <= 0.029
    assert xyb[:, 1].min() >= 0.0 and xyb[:, 1].max() <= 0.846
    assert xyb[:, 2].min() >= 0.0 and xyb[:, 2].max() <= 0.846


def test_xyb_u8_roundtrip_quantization_loss():
    """Match the reference's documented loss table within slack:
    >=70% of colors within 1 level, max diff <= ~26, MAE ~0.69/channel."""
    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, size=(128, 128, 3)).astype(np.uint8)
    out = np.asarray(color.xyb_roundtrip(jnp.asarray(u8)))
    diff = np.abs(out.astype(np.int32) - u8.astype(np.int32))
    per_color_max = diff.reshape(-1, 3).max(axis=1)
    assert (per_color_max <= 1).mean() > 0.55  # random colors skew saturated
    assert diff.max() <= 30
    assert diff.mean() < 1.5


def test_xyb_roundtrip_near_identity_on_gray():
    g = np.tile(np.arange(256, dtype=np.uint8)[:, None, None], (1, 4, 3))
    out = np.asarray(color.xyb_roundtrip(jnp.asarray(g)))
    diff = np.abs(out.astype(int) - g.astype(int))
    assert diff.max() <= 2
