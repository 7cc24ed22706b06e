"""codec-iter layer tests (reference: crates/codec-iter/src/baseline.rs,
sweep.rs; baseline JSON schema-compatible with committed reference
baselines)."""

import json

import pytest

from codec_eval_tpu.iter import (
    Baseline,
    EvalPoint,
    compare_with_baseline,
    load_baseline,
    make_baseline,
    save_baseline,
)


def _points():
    return [
        EvalPoint("a.png", 75, 1.0, 80.0, 1000, 10),
        EvalPoint("b.png", 75, 1.2, 82.0, 1200, 12),
        EvalPoint("a.png", 95, 2.0, 95.0, 2000, 20),
        EvalPoint("b.png", 95, 2.2, 96.0, 2200, 22),
    ]


def test_eval_point_json_roundtrip():
    p = _points()[0]
    assert EvalPoint.from_json(p.to_json()) == p


def test_baseline_save_load(tmp_path):
    baseline = make_baseline("jpeg-420", "summary", "/corpus", _points())
    path = save_baseline(tmp_path, baseline)
    assert path.name == "jpeg-420.json"
    loaded = load_baseline(tmp_path, "jpeg-420")
    assert loaded is not None
    assert len(loaded.points) == 4
    assert loaded.points[0].ssim2 == 80.0
    assert load_baseline(tmp_path, "missing") is None


def test_baseline_schema_matches_reference_fixture(tmp_path):
    """The JSON schema must accept the reference's committed baseline shape
    (format/config_summary/corpus_path/created_at/points with
    image/quality/bpp/ssim2/size_bytes/encode_ms)."""
    fixture = {
        "format": "avif-qm",
        "config_summary": "ravif-s6-10bit-qm",
        "corpus_path": "/data/CID22-512",
        "created_at": "2026-02-03T22:56:01Z",
        "points": [
            {
                "image": "1001682.png",
                "quality": 75,
                "bpp": 1.501,
                "ssim2": 81.23,
                "size_bytes": 49182,
                "encode_ms": 62,
            }
        ],
    }
    p = tmp_path / "avif-qm.json"
    p.write_text(json.dumps(fixture))
    loaded = load_baseline(tmp_path, "avif-qm")
    assert loaded.points[0].bpp == 1.501
    assert loaded.points[0].ssim2 == 81.23


def test_compare_with_baseline():
    baseline = make_baseline("jpeg", "s", "/c", _points())
    # Current run: 10% smaller files, 1 point better ssim2.
    current = [
        EvalPoint(p.image, p.quality, p.bpp * 0.9, p.ssim2 + 1.0, p.size_bytes, p.encode_ms)
        for p in _points()
    ]
    rows = compare_with_baseline(current, baseline)
    assert len(rows) == 2  # per quality
    r75 = next(r for r in rows if r.quality == 75)
    assert r75.delta_bpp == pytest.approx(-0.11)
    assert r75.delta_ssim2 == pytest.approx(1.0)
    # pareto = dssim2 - 10*dbpp -> positive (improvement on both axes).
    assert r75.pareto == pytest.approx(1.0 + 1.1)


def test_compare_with_missing_quality():
    baseline = make_baseline("jpeg", "s", "/c", _points()[:2])  # only q75
    rows = compare_with_baseline(_points(), baseline)
    r95 = next(r for r in rows if r.quality == 95)
    assert r95.delta_bpp == 0.0 and r95.delta_ssim2 == 0.0


def test_run_eval_empty_images():
    """An empty corpus returns an empty result, not an IndexError."""
    from codec_eval_tpu.iter.codecs import build_codec
    from codec_eval_tpu.iter.eval import run_eval

    res = run_eval([], build_codec("jpeg"), [75, 85, 95])
    assert res.points == [] and res.total_ms == 0


def test_photo_sources_statistics_and_determinism():
    """Photo-statistics corpus (VERDICT r2 #6): 1/f spectral slope in the
    natural-image band, nonzero chroma, film grain, deterministic."""
    import numpy as np

    from codec_eval_tpu.iter.source import PHOTO_CORPUS_VERSION, photo_sources

    a = photo_sources(2, 128)
    b = photo_sources(2, 128)
    assert a[0].name.startswith(PHOTO_CORPUS_VERSION)
    np.testing.assert_array_equal(a[0].rgb, b[0].rgb)  # deterministic
    assert a[0].rgb.shape == (128, 128, 3) and a[0].rgb.dtype == np.uint8

    for s in a:
        im = s.rgb.astype(np.float64)
        luma = im.mean(-1)
        # Radial power-spectrum slope in the natural-image band (-1.4..-2.6).
        F = np.abs(np.fft.rfft2(luma - luma.mean())) ** 2
        fy = np.fft.fftfreq(128)[:, None]
        fx = np.fft.rfftfreq(128)[None, :]
        f = np.hypot(fy, fx).ravel()
        p = F.ravel()
        sel = (f > 0.02) & (f < 0.4)
        slope = np.polyfit(np.log(f[sel]), np.log(p[sel] + 1e-12), 1)[0]
        assert -2.8 < slope < -1.2, slope
        # Chroma present but lower-energy than luma.
        chroma_e = (im - luma[..., None]).std()
        assert 0.5 < chroma_e < luma.std(), (chroma_e, luma.std())
