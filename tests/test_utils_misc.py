"""Coverage for utility layers: native IO, profiling, resize, rd-plot,
decode, iter sources."""

import numpy as np
import pytest

from codec_eval_tpu.utils import native
from codec_eval_tpu.utils.profiling import EventLog, StageTimer


def test_ppm_roundtrip(tmp_path):
    img = np.random.default_rng(0).integers(0, 256, (21, 37, 3)).astype(np.uint8)
    p = tmp_path / "x.ppm"
    native.write_ppm(p, img)
    back = native.read_ppm(p)
    assert np.array_equal(back, img)


def test_ppm_bad_file(tmp_path):
    p = tmp_path / "bad.ppm"
    p.write_bytes(b"P3\nnot binary\n")
    with pytest.raises(IOError):
        native.read_ppm(p)


def test_srgb_lut_matches_formula():
    u8 = np.arange(256, dtype=np.uint8).reshape(16, 16)
    lin = native.srgb_to_linear_host(u8)
    v = np.arange(256) / 255.0
    expected = np.where(v <= 0.04045, v / 12.92, ((v + 0.055) / 1.055) ** 2.4)
    np.testing.assert_allclose(lin.reshape(-1), expected, atol=1e-6)


def test_pad_image():
    img = np.ones((5, 7, 3), np.uint8) * 9
    out = native.pad_image_u8(img, 8, 8)
    assert out.shape == (8, 8, 3)
    assert np.array_equal(out[:5, :7], img)
    assert out[5:].sum() == 0 and out[:, 7:].sum() == 0


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["total_ms"] >= 0


def test_event_log(tmp_path):
    import json

    log = EventLog(tmp_path / "e.jsonl")
    log.event("start", n=3)
    log.event("end", ok=True)
    log.close()
    lines = (tmp_path / "e.jsonl").read_text().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[0])["kind"] == "start"


def test_iter_source_ppm_cache(tmp_path):
    from PIL import Image

    from codec_eval_tpu.iter.source import load_image

    img = np.random.default_rng(1).integers(0, 256, (16, 20, 3)).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "a.png")
    s1 = load_image(tmp_path, "a.png")
    assert (tmp_path / ".codec-iter-cache" / "a.ppm").exists()
    s2 = load_image(tmp_path, "a.png")  # cache hit
    assert np.array_equal(s1.rgb, s2.rgb)
    assert np.array_equal(s1.rgb, img)


def test_rd_plot_svg():
    from codec_eval_tpu.stats import CorpusAggregate, WEB_FRAME
    from codec_eval_tpu.stats.rd_plot import plot_rd_svg

    curve = [(0.3 + 0.3 * i, 30.0 + 8.0 * i, 8.0 - i) for i in range(8)]
    agg = CorpusAggregate("c", "jpeg", curve, 3)
    cal = agg.calibrate(WEB_FRAME)
    svg = plot_rd_svg(curve, WEB_FRAME, cal, title="T")
    assert svg.startswith("<svg")
    assert "knee" in svg
    assert "45°" in svg or "45" in svg  # angle grid labels


def test_resize_invariants():
    """Constant images are exact under resize; gradients stay monotone."""
    import jax.numpy as jnp

    from codec_eval_tpu.kernels.resize import resize_u8

    flat = np.full((16, 16, 3), 77, np.uint8)
    out = np.asarray(resize_u8(jnp.asarray(flat), 8, 8))
    assert np.abs(out.astype(int) - 77).max() <= 1

    grad = np.tile(np.linspace(0, 255, 32, dtype=np.uint8)[None, :, None], (16, 1, 3))
    out = np.asarray(resize_u8(jnp.asarray(grad), 8, 16)).astype(int)
    row = out[4, :, 0]
    assert (np.diff(row) >= 0).all()
    assert row[0] < 30 and row[-1] > 225


def test_decode_grayscale_jpeg():
    import io

    from PIL import Image

    from codec_eval_tpu.decode import decode_jpeg_with_icc

    gray = np.random.default_rng(3).integers(0, 256, (16, 16)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(gray, mode="L").save(buf, "JPEG")
    img = decode_jpeg_with_icc(buf.getvalue())
    rgb = img.to_rgb8()
    assert rgb.shape == (16, 16, 3)
    # Grayscale expands to identical channels.
    assert np.array_equal(rgb[..., 0], rgb[..., 1])


def test_color_profile_from_icc_bytes():
    """reference: src/metrics/icc.rs:50-55 and its tests at :149-163."""
    from codec_eval_tpu.color import ColorProfile

    assert ColorProfile.from_icc_bytes(None).is_srgb
    assert ColorProfile.from_icc_bytes(b"").is_srgb
    assert not ColorProfile.from_icc_bytes(b"\x01\x02\x03\x04").is_srgb
