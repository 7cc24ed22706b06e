"""Committed quality/size baselines (baselines/*.json).

The reference ships 9 committed per-codec baselines and diffs every run
against them (crates/codec-iter/src/main.rs:424-448, baseline.rs:54-86).
Here the committed fixtures are computed on the deterministic procedural
corpus (iter.source.synthetic_sources), so a fresh evaluation must
reproduce them: bpp byte-exactly (host codecs are deterministic), ssim2
within a small tolerance (scores drift ~1e-3 between XLA backends).
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from codec_eval_tpu.iter import (
    Baseline,
    build_codec,
    compare_with_baseline,
    load_baseline,
    run_eval,
)
from codec_eval_tpu.iter.source import (
    SYNTHETIC_CORPUS_VERSION,
    synthetic_sources,
)

BASELINES_DIR = Path(__file__).resolve().parent.parent / "baselines"
QUALITIES = (75, 85, 95)


def test_committed_baselines_present_and_schema():
    paths = sorted(BASELINES_DIR.glob("*.json"))
    assert len(paths) >= 9, f"expected >=9 committed baselines, found {paths}"
    for path in paths:
        with open(path) as f:
            raw = json.load(f)
        b = Baseline.from_json(raw)
        assert b.corpus_path == SYNTHETIC_CORPUS_VERSION, path
        assert b.created_at and b.config_summary, path
        # quick preset x 3 images
        assert len(b.points) == len(QUALITIES) * 3, path
        for p in b.points:
            assert p.bpp > 0 and p.size_bytes > 0, (path, p)
            assert -50.0 <= p.ssim2 <= 100.0, (path, p)
        # schema-compatibility with the reference's committed baselines:
        # the exact field names of baseline.rs:11-43 / eval.rs:21-29
        assert set(raw) == {
            "format", "config_summary", "corpus_path", "created_at", "points",
        }
        assert set(raw["points"][0]) == {
            "image", "quality", "bpp", "ssim2", "size_bytes", "encode_ms",
        }


@pytest.mark.parametrize("key", ["jpeg", "webp"])
def test_fresh_eval_reproduces_committed_baseline(key):
    baseline = load_baseline(BASELINES_DIR, key)
    assert baseline is not None
    cfg = {"jpeg": {"fmt": "jpeg"}, "webp": {"fmt": "webp"}}[key]
    result = run_eval(synthetic_sources(), build_codec(**cfg), QUALITIES)
    rows = compare_with_baseline(result.points, baseline)
    assert [r.quality for r in rows] == list(QUALITIES)
    for row in rows:
        # deterministic host encoder -> identical bytes -> identical bpp
        assert row.delta_bpp == pytest.approx(0.0, abs=1e-9), row
        # scoring backend drift tolerance
        assert row.delta_ssim2 == pytest.approx(0.0, abs=0.05), row
        assert row.pareto == pytest.approx(0.0, abs=0.05), row
