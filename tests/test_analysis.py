"""Analysis layer tests: heuristics semantics, quality predictor pins
(reference quality_predictor.rs tests), outliers, matched-bpp compare,
predictor rules."""

import numpy as np
import pytest

from codec_eval_tpu.analysis import (
    ComparisonRow,
    default_rules,
    determine_winners,
    evaluate_rules,
    find_outliers,
    fit_logistic_rule,
    heuristics_one,
    quality_predictor as qp,
    rd_compare,
)


# -- heuristics -----------------------------------------------------------


def test_heuristics_flat_image():
    flat = np.full((64, 64, 3), 128, np.uint8)
    f = heuristics_one(flat)
    assert f["mean_luminance"] == pytest.approx(128.0, abs=0.5)
    assert f["luminance_variance"] == pytest.approx(0.0, abs=1e-3)
    assert f["flat_block_pct"] == 100.0
    assert f["edge_strength_mean"] == pytest.approx(0.0, abs=1e-3)
    assert f["edge_density"] == 0.0
    assert f["saturation_mean"] == pytest.approx(0.0, abs=1e-6)
    assert f["high_freq_energy"] == 0.0
    assert f["low_freq_energy"] == 1.0


def test_heuristics_checkerboard():
    """1-px checkerboard: adjacent diffs max out (high_freq, local contrast,
    block variance) while *central*-difference edges are blind to it — the
    same central-difference semantics as the reference's Sobel-ish loop."""
    y, x = np.mgrid[0:64, 0:64]
    check = (((x + y) % 2) * 255).astype(np.uint8)
    img = np.stack([check] * 3, -1)
    f = heuristics_one(img)
    assert f["edge_strength_mean"] == pytest.approx(0.0, abs=1e-3)
    assert f["detail_block_pct"] == 100.0
    assert f["high_freq_energy"] > 0.9
    assert f["local_contrast_mean"] == pytest.approx(255.0, abs=1.0)


def test_heuristics_block_checkerboard_edges():
    """2-px blocks DO register on central differences."""
    y, x = np.mgrid[0:64, 0:64]
    check = ((((x // 2) + (y // 2)) % 2) * 255).astype(np.uint8)
    img = np.stack([check] * 3, -1)
    f = heuristics_one(img)
    assert f["edge_density"] > 0.5


def test_heuristics_gradient_low_freq():
    y, x = np.mgrid[0:64, 0:64]
    grad = (x * 4).astype(np.uint8)
    img = np.stack([grad] * 3, -1)
    f = heuristics_one(img)
    assert f["high_freq_energy"] < 0.05
    # Slope 4/px -> 8x8 block variance 84 (< 100): counts as flat.
    assert f["flat_block_pct"] == 100.0
    assert f["horizontal_complexity"] > f["vertical_complexity"]


# -- quality predictor (reference's own test pins) ------------------------


def test_quality_equivalence():
    assert abs(qp.mozjpeg_to_jpegli_quality(90) - 80) <= 5
    assert abs(qp.mozjpeg_to_jpegli_quality(85) - 70) <= 5
    assert qp.jpegli_to_mozjpeg_quality(80) == 90


def test_butteraugli_estimation():
    assert qp.estimate_butteraugli(75, "jpegli") < qp.estimate_butteraugli(75, "mozjpeg")
    assert qp.quality_for_butteraugli(2.0, "mozjpeg") > 90


def test_unified_quality():
    assert qp.unified_quality_to_butteraugli(75) == pytest.approx(2.0, abs=0.5)
    assert qp.unified_quality_to_butteraugli(50) == pytest.approx(4.0, abs=0.5)
    assert qp.unified_quality_to_butteraugli(100) == 0.0


def test_encoder_selection():
    enc, _ = qp.predict_encoder_for_quality(2.0, 50.0, 15.0, 15.0)
    assert enc == "jpegli"
    enc, _ = qp.predict_encoder_for_quality(5.0, 85.0, 5.0, 5.0)
    assert enc == "mozjpeg"


# -- comparison analytics -------------------------------------------------


def _rows():
    rows = []
    for image, bias in [("easy", -0.5), ("hard", 0.8), ("avg", 0.1)]:
        for q in (50, 70, 90):
            rows.append(ComparisonRow(image, "a", q, q / 40.0, 50 + q / 2,
                                      0.001, 6.0 - q / 20.0, 1))
            rows.append(ComparisonRow(image, "b", q, q / 45.0, 52 + q / 2,
                                      0.001, 6.0 - q / 20.0 + bias, 1))
    return rows


def test_find_outliers():
    report = find_outliers(_rows(), "a", "b", top_n=2)
    # advantage of b = BA_a - BA_b = -bias; corpus mean ~ -0.133.
    assert report.corpus_mean_advantage == pytest.approx(-0.4 / 3, abs=1e-6)
    assert len(report.images) == 2
    # 'hard' diverges most (bias 0.8 vs mean 0.13).
    assert report.images[0][0] == "hard"


def test_rd_compare():
    result = rd_compare(_rows(), "a", "b", targets=[1.5])
    assert 1.5 in result.by_target
    va, vb, n = result.by_target[1.5]
    assert n == 3
    assert vb > va  # b has higher s2 at same bpp (smaller files, +2 score)


def test_determine_winners_and_rules():
    rows = _rows()
    heur = {
        "easy": {"flat_block_pct": 90.0, "edge_density": 0.01,
                 "freq_ratio": 0.01, "local_contrast_mean": 5.0,
                 "block_variance_mean": 50.0},
        "hard": {"flat_block_pct": 10.0, "edge_density": 0.5,
                 "freq_ratio": 0.5, "local_contrast_mean": 60.0,
                 "block_variance_mean": 6000.0},
        "avg": {"flat_block_pct": 50.0, "edge_density": 0.1,
                "freq_ratio": 0.1, "local_contrast_mean": 20.0,
                "block_variance_mean": 800.0},
    }
    samples = determine_winners(rows, heur, "a", "b", buckets=[1.5])
    assert len(samples) == 3
    assert all(s.winner == "b" for s in samples)  # b always better on s2
    scores = evaluate_rules(samples, default_rules("a", "b"))
    best = scores[0]
    assert best.accuracy == 1.0  # "always_b" should win
    fitted = fit_logistic_rule(samples * 3, "a", "b")
    assert fitted is not None
    assert fitted.predict(heur["avg"], 1.5) == "b"
