"""Real encode/decode drives of every available codec adapter."""

import numpy as np
import pytest

from codec_eval_tpu.codecs import AvifCodec, JpegCodec, PngCodec, WebPCodec
from codec_eval_tpu.engine import EncodeRequest, ImageData


def _img(n=32):
    rng = np.random.default_rng(6)
    y, x = np.mgrid[0:n, 0:n]
    base = 120 + 50 * np.sin(x / 5.0) + 40 * np.cos(y / 7.0)
    return np.clip(
        np.stack([base, base * 0.9, base * 0.8], -1) + rng.normal(0, 5, (n, n, 3)),
        0, 255,
    ).astype(np.uint8)


@pytest.mark.parametrize(
    "codec",
    [
        JpegCodec("420", True),
        JpegCodec("444", False),
        WebPCodec(),
        AvifCodec(speed=8),
        PngCodec(),
    ],
    ids=lambda c: c.id(),
)
def test_adapter_roundtrip(codec):
    if not codec.is_available():
        pytest.skip(f"{codec.id()} unavailable")
    img = ImageData.rgb8(_img())
    data = codec.encode(img, EncodeRequest(quality=80.0))
    assert len(data) > 0
    decoded = codec.decode(data)
    assert decoded.width == 32 and decoded.height == 32
    # Lossy decode should still be in the neighborhood of the source.
    diff = np.abs(
        decoded.to_rgb8().astype(int) - img.to_rgb8().astype(int)
    ).mean()
    assert diff < 40.0, diff


def test_png_lossless():
    codec = PngCodec()
    img = ImageData.rgb8(_img())
    decoded = codec.decode(codec.encode(img, EncodeRequest(quality=100.0)))
    assert np.array_equal(decoded.to_rgb8(), img.to_rgb8())


def test_quality_affects_size():
    codec = JpegCodec("420", True)
    img = ImageData.rgb8(_img(64))
    low = codec.encode(img, EncodeRequest(quality=30.0))
    high = codec.encode(img, EncodeRequest(quality=95.0))
    assert len(low) < len(high)


def test_avif_presets_distinct():
    presets = AvifCodec.presets()
    ids = [c.id() for c in presets]
    assert len(set(ids)) == len(ids)
    assert any("444" in i for i in ids)
