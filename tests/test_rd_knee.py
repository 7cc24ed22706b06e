"""R-D knee / fixed-frame tests, pinning the reference's calibration
regression values (src/stats/rd_knee.rs:1091-1371, esp. the s2-knee-at-45°
assertion at :1256-1279)."""

import pytest

from codec_eval_tpu.stats import (
    BinScheme,
    CodecConfig,
    ConfiguredParetoFront,
    ConfiguredRDPoint,
    CorpusAggregate,
    FixedFrame,
    WEB_FRAME,
    defaults,
    interpolate_s2_at,
)


def test_web_frame_aspect():
    # aspect = (1 - 0.7274/4) / (65.10/100) = 1.2568 (reference calibration).
    assert WEB_FRAME.aspect == pytest.approx(1.2568, abs=1e-3)
    assert WEB_FRAME.bpp_max == 4.0
    assert WEB_FRAME.ba_max == 15.0


def test_cid22_s2_knee_is_45_degrees():
    """The calibration anchor: the mozjpeg/CID22 s2 knee sits at 45.0°."""
    angle = WEB_FRAME.s2_angle(0.7274, 65.10)
    assert angle == pytest.approx(45.0, abs=0.5)


def test_ba_angle_direction():
    # ba=0 (perfect) gives the max angle at a given bpp; ba=ba_max gives 0.
    assert WEB_FRAME.ba_angle(1.0, 0.0) > WEB_FRAME.ba_angle(1.0, 5.0)
    assert WEB_FRAME.ba_angle(1.0, 15.0) == pytest.approx(0.0, abs=1e-9)


def test_cid22_ba_knee_angle():
    # The reference's README states 47.2° for this knee (its code comment
    # says 40.7° — a documented discrepancy; the formula yields 47.2°).
    angle = WEB_FRAME.ba_angle(0.7048, 4.378)
    assert angle == pytest.approx(47.2, abs=0.6)


def test_position_dual_angles():
    pos = WEB_FRAME.position(0.7274, 65.10, 4.378)
    assert pos.theta_s2 == pytest.approx(45.0, abs=0.5)
    assert pos.bpp == 0.7274


def test_bin_scheme_default18():
    scheme = BinScheme.default_18()
    assert scheme.count == 18
    assert scheme.width == pytest.approx(5.0)
    bins = scheme.bins()
    assert bins[0].center == pytest.approx(2.5)
    assert bins[-1].center == pytest.approx(87.5)
    b = scheme.bin_for(45.0)
    assert b.contains(45.0)
    # Out-of-range clamps to first/last bins.
    assert scheme.bin_for(-10.0).index == 0
    assert scheme.bin_for(200.0).index == 17


def test_bin_scheme_fine36():
    scheme = BinScheme.fine_36()
    assert scheme.count == 36
    assert scheme.width == pytest.approx(2.5)


def test_codec_config_fingerprint():
    cfg = CodecConfig("mozjpeg", "4.1").with_param("subsampling", "420").with_param(
        "progressive", True
    )
    fp = cfg.fingerprint()
    assert fp.startswith("mozjpeg@4.1 [")
    assert "progressive=true" in fp
    assert "subsampling=420" in fp


def test_corpus_aggregate_knee():
    """Synthetic saturating curve: knee where normalized slope crosses 1."""
    curve = []
    for i in range(20):
        bpp = 0.2 + 0.18 * i
        s2 = 90.0 * (1.0 - 2.718 ** (-1.2 * bpp))  # saturating
        ba = 10.0 * 2.718 ** (-0.8 * bpp) + 1.0
        curve.append((bpp, s2, ba))
    agg = CorpusAggregate("synthetic", "test", curve, 10)
    cal = agg.calibrate(WEB_FRAME)
    assert cal is not None
    assert 0.2 < cal.ssimulacra2.bpp < 2.5
    assert 0.2 < cal.butteraugli.bpp < 2.5
    lo, hi = cal.disagreement_range()
    assert lo <= hi


def test_knee_requires_three_points():
    agg = CorpusAggregate("x", "y", [(0.5, 50.0, 5.0), (1.0, 70.0, 3.0)], 1)
    assert agg.ssimulacra2_knee(WEB_FRAME) is None


def test_interpolate_s2_at():
    curve = [(0.5, 50.0, 5.0), (1.0, 70.0, 3.0), (2.0, 80.0, 2.0)]
    assert interpolate_s2_at(curve, 0.75) == pytest.approx(60.0)
    assert interpolate_s2_at(curve, 1.5) == pytest.approx(75.0)
    assert interpolate_s2_at(curve, 3.0) is None


def test_configured_pareto_front():
    cal = defaults.mozjpeg_cid22()
    scheme = BinScheme.default_18()
    points = [
        ConfiguredRDPoint(
            position=WEB_FRAME.position(bpp, s2, ba),
            config=CodecConfig("test", "1.0"),
        )
        for bpp, s2, ba in [(0.5, 60.0, 5.0), (1.0, 75.0, 3.0), (1.5, 70.0, 4.0)]
    ]
    front = ConfiguredParetoFront.compute(points, cal, scheme)
    # (1.5, 70) is dominated by (1.0, 75).
    assert len(front.points) == 2
    assert front.best_config_for_s2(70.0).position.bpp == 1.0
    assert front.best_config_for_ba(3.5).position.bpp == 1.0
    assert front.best_config_for_bpp(0.7).position.ssimulacra2 == 60.0
    coverage = front.coverage()
    assert len(coverage) == 18
    assert sum(c for _, c in coverage) == 2
    assert len(front.empty_bins()) == 16


def test_defaults_pinned():
    """Shipped calibrations as regression data
    (reference: src/stats/rd_knee.rs:1018-1084)."""
    cid = defaults.mozjpeg_cid22()
    assert cid.ssimulacra2.bpp == pytest.approx(0.7274)
    assert cid.ssimulacra2.quality == pytest.approx(65.10)
    assert cid.butteraugli.quality == pytest.approx(4.378)
    assert cid.image_count == 209
    assert cid.codec == "mozjpeg-420-prog"

    clic = defaults.mozjpeg_clic2025()
    assert clic.ssimulacra2.bpp == pytest.approx(0.4623)
    assert clic.butteraugli.bpp == pytest.approx(0.3948)
    assert clic.image_count == 32


def test_param_value_display_and_fingerprint():
    """ParamValue formats like the reference's Display impl
    (reference: src/stats/rd_knee.rs:420-471)."""
    from codec_eval_tpu.stats import CodecConfig, ParamValue

    assert str(ParamValue.int(6)) == "6"
    assert str(ParamValue.float(1.0)) == "1"
    assert str(ParamValue.float(0.125)) == "0.125"
    assert str(ParamValue.bool(True)) == "true"
    assert str(ParamValue.bool(False)) == "false"
    assert str(ParamValue.text("qm")) == "qm"
    assert ParamValue.int(6).to_json() == 6

    cfg = (
        CodecConfig("ravif", "0.11")
        .with_param("speed", ParamValue.int(6))
        .with_param("qm", ParamValue.bool(True))
    )
    assert cfg.fingerprint() == "ravif@0.11 [qm=true, speed=6]"
