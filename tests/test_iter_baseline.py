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
