"""Engine tests with trivial codec closures — the reference's key testability
property (callback fakes instead of codec mocks, src/eval/session.rs:634)."""

import csv
import json

import numpy as np
import pytest

from codec_eval_tpu import (
    DimensionMismatch,
    EvalConfig,
    EvalSession,
    ImageData,
    MetricConfig,
    MetricResult,
    PerceptionLevel,
    QualityBelowThreshold,
    assert_perception_level,
    assert_quality,
    evaluate_single,
)
from codec_eval_tpu.engine.report import CSV_COLUMNS


def _image(w=32, h=32):
    rng = np.random.default_rng(11)
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


def test_metric_config_presets():
    all_ = MetricConfig.all()
    assert all_.dssim and all_.ssimulacra2 and all_.butteraugli and all_.psnr
    assert not all_.xyb_roundtrip
    fast = MetricConfig.fast()
    assert fast.psnr and not fast.dssim
    perc = MetricConfig.perceptual()
    assert perc.dssim and not perc.psnr
    pxyb = MetricConfig.perceptual_xyb()
    assert pxyb.xyb_roundtrip
    s2 = MetricConfig.ssimulacra2_only()
    assert s2.ssimulacra2 and not s2.butteraugli
    assert MetricConfig.fast().with_xyb_roundtrip().xyb_roundtrip


def test_perception_levels():
    assert PerceptionLevel.from_dssim(0.0001) == PerceptionLevel.IMPERCEPTIBLE
    assert PerceptionLevel.from_dssim(0.0005) == PerceptionLevel.MARGINAL
    assert PerceptionLevel.from_dssim(0.001) == PerceptionLevel.SUBTLE
    assert PerceptionLevel.from_dssim(0.002) == PerceptionLevel.NOTICEABLE
    assert PerceptionLevel.from_dssim(0.01) == PerceptionLevel.DEGRADED
    assert PerceptionLevel.from_ssimulacra2(95.0) == PerceptionLevel.IMPERCEPTIBLE
    assert PerceptionLevel.from_ssimulacra2(40.0) == PerceptionLevel.DEGRADED
    assert PerceptionLevel.from_butteraugli(0.5) == PerceptionLevel.IMPERCEPTIBLE
    assert PerceptionLevel.from_butteraugli(4.0) == PerceptionLevel.NOTICEABLE
    assert PerceptionLevel.IMPERCEPTIBLE.code() == "IMP"
    assert PerceptionLevel.DEGRADED.code() == "DEG"
    assert PerceptionLevel.IMPERCEPTIBLE.max_dssim() == 0.0003
    assert PerceptionLevel.MARGINAL.min_ssimulacra2() == 80.0
    assert PerceptionLevel.SUBTLE.max_butteraugli() == 3.0


def test_image_data_variants():
    arr = _image(8, 4)
    img = ImageData.rgb8(arr)
    assert img.width == 8 and img.height == 4
    assert np.array_equal(img.to_rgb8(), arr)

    rgba = np.concatenate([arr, np.full((4, 8, 1), 255, np.uint8)], axis=2)
    img = ImageData.rgba8(rgba)
    assert np.array_equal(img.to_rgb8(), arr)  # alpha dropped

    img = ImageData.rgb_slice(arr.tobytes(), 8, 4)
    assert np.array_equal(img.to_rgb8(), arr)

    img = ImageData.rgb_slice_with_icc(arr.tobytes(), 8, 4, b"fake-icc")
    assert img.icc_profile == b"fake-icc"
    assert not img.color_profile().is_srgb


def test_session_encode_only_codec(tmp_path):
    """Codec without decoder records size only (no metrics, no perception)."""
    config = (
        EvalConfig.builder()
        .report_dir(tmp_path)
        .metrics(MetricConfig.fast())
        .quality_levels([50, 80])
        .build()
    )
    session = EvalSession(config)
    session.add_codec("fake", "1.0", lambda img, req: b"\x00" * 100)
    assert session.codec_count == 1

    report = session.evaluate_image("test", ImageData.rgb8(_image()))
    assert len(report.results) == 2
    r = report.results[0]
    assert r.file_size == 100
    assert r.bits_per_pixel == pytest.approx(100 * 8 / (32 * 32))
    assert r.metrics.psnr is None
    assert r.perception is None


def test_session_identity_codec_json_csv(tmp_path):
    """Identity codec -> perfect metrics; JSON + CSV schema validation."""
    config = (
        EvalConfig.builder()
        .report_dir(tmp_path)
        .metrics(MetricConfig.fast())
        .quality_levels([80])
        .build()
    )
    session = EvalSession(config)
    arr = _image()

    session.add_codec_with_decode(
        "identity",
        "1.0",
        lambda img, req: img.to_rgb8().tobytes(),
        lambda data: ImageData.rgb_slice(data, 32, 32),
    )
    report = session.evaluate_image("demo", ImageData.rgb8(arr))
    assert report.results[0].metrics.psnr > 1e6  # inf clamped later in JSON

    session.write_image_report(report)
    with open(tmp_path / "demo.json") as f:
        d = json.load(f)
    assert set(d) == {
        "name", "source_path", "width", "height", "uncompressed_size",
        "results", "timestamp",
    }
    r0 = d["results"][0]
    assert set(r0) == {
        "codec_id", "codec_version", "quality", "file_size", "bits_per_pixel",
        "encode_time", "decode_time", "metrics", "perception", "cached_path",
        "codec_params",
    }
    assert set(r0["metrics"]) == {"dssim", "ssimulacra2", "butteraugli", "psnr"}

    from codec_eval_tpu.engine.report import CorpusReport

    corpus = CorpusReport(name="corpus_demo")
    corpus.images.append(report)
    session.write_corpus_report(corpus)
    with open(tmp_path / "corpus_demo.csv") as f:
        rows = list(csv.reader(f))
    assert rows[0] == CSV_COLUMNS
    assert len(rows) == 2
    assert rows[1][0] == "demo" and rows[1][1] == "identity"
    assert rows[1][3] == "80"  # integral quality rendered without decimals

    assert corpus.total_results() == 1
    assert corpus.codec_ids() == ["identity"]


def test_report_queries():
    from codec_eval_tpu.engine.report import CodecResult, ImageReport

    report = ImageReport(name="x", width=10, height=10)
    for size, dssim in [(1000, 0.001), (500, 0.005), (2000, 0.0005)]:
        report.results.append(
            CodecResult(
                codec_id="c",
                codec_version="1",
                quality=80.0,
                file_size=size,
                bits_per_pixel=size * 8 / 100,
                encode_time_ms=1,
                decode_time_ms=1,
                metrics=MetricResult(dssim=dssim),
                perception=None,
            )
        )
    assert report.best_at_size(1500).file_size == 1000  # lowest dssim <= 1500
    assert report.smallest_at_quality(0.002).file_size == 1000
    assert report.smallest_at_quality(0.0001) is None
    assert report.uncompressed_size == 300


def test_evaluate_single_and_gates():
    arr = _image(24, 24)
    result = evaluate_single(arr, arr, MetricConfig.fast())
    assert result.psnr == float("inf") or result.psnr > 1e6
    assert result.dssim is None  # only requested metrics computed

    # Gates on identical images pass trivially.
    assert_quality(arr, arr, min_ssimulacra2=99.0)
    assert_perception_level(arr, arr, PerceptionLevel.IMPERCEPTIBLE)

    # Heavy distortion trips the gate.
    noise = np.random.default_rng(1).integers(0, 256, arr.shape).astype(np.uint8)
    with pytest.raises(QualityBelowThreshold):
        assert_quality(arr, noise, min_ssimulacra2=90.0)


def test_json_inf_clamped(tmp_path):
    """Infinity PSNR must serialize as a finite JSON number."""
    from codec_eval_tpu.engine.report import CodecResult, ImageReport, write_json

    report = ImageReport(name="inf", width=4, height=4)
    report.results.append(
        CodecResult(
            codec_id="c", codec_version="1", quality=80.0, file_size=10,
            bits_per_pixel=5.0, encode_time_ms=0, decode_time_ms=None,
            metrics=MetricResult(psnr=float("inf")), perception=None,
        )
    )
    write_json(report, tmp_path / "inf.json")
    d = json.loads((tmp_path / "inf.json").read_text())
    assert d["results"][0]["metrics"]["psnr"] == 1e308


def test_calculate_entry_points():
    """Flat calculate_* API parity (buffers + width/height signatures)."""
    from codec_eval_tpu.metrics import (
        calculate_butteraugli_with_intensity,
        calculate_psnr,
        calculate_ssimulacra2,
        calculate_ssimulacra2_icc,
    )

    img = _image(24, 24)
    noisy = np.clip(
        img.astype(np.int16) + np.random.default_rng(0).integers(-8, 9, img.shape),
        0, 255,
    ).astype(np.uint8)

    # Flat-buffer + dims signature, as the reference takes &[u8].
    s2 = calculate_ssimulacra2(img.tobytes(), noisy.tobytes(), 24, 24)
    assert 0 < s2 < 100
    assert calculate_psnr(img, img) == float("inf")
    ba = calculate_butteraugli_with_intensity(img, noisy, intensity_target=250.0)
    assert ba > 0
    # ICC variant with sRGB profiles is a passthrough.
    assert calculate_ssimulacra2_icc(img, noisy) == pytest.approx(s2, abs=1e-3)

    with pytest.raises(DimensionMismatch):
        calculate_psnr(img, _image(12, 12))


def test_sweep_scorer_matches_chunked():
    """_build_sweep_scorer (one dispatch: precompute + lax.scan over chunk
    slices) must reproduce the split precompute + per-chunk pipeline to
    f32 rounding (XLA may fuse differently across the two program shapes,
    so bit-exactness is not guaranteed); also validates n_cand % chunk
    enforcement."""
    import jax.numpy as jnp

    from codec_eval_tpu.engine.scoring import (
        _build_chunk_scorer,
        _build_precompute,
        _build_sweep_scorer,
    )

    h = w = 40
    rng = np.random.default_rng(3)
    ref = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    cands = np.clip(
        ref.astype(np.int16) + rng.integers(-12, 13, (8,) + ref.shape),
        0,
        255,
    ).astype(np.uint8)

    sweep = _build_sweep_scorer(h, w, 8, 4, True, True, True, True, False)
    got = {k: np.asarray(v) for k, v in sweep(
        jnp.asarray(ref), jnp.asarray(cands)
    ).items()}

    pre = _build_precompute(h, w, True, True, True, False)(jnp.asarray(ref))
    chunked = _build_chunk_scorer(h, w, 4, True, True, True, True)
    want = {}
    for c in range(2):
        out = chunked(pre, jnp.asarray(cands[c * 4 : (c + 1) * 4]))
        for k, v in out.items():
            want.setdefault(k, []).append(np.asarray(v))
    want = {k: np.concatenate(v) for k, v in want.items()}

    assert set(got) == {"psnr", "dssim", "ssimulacra2", "butteraugli"}
    for k in got:
        np.testing.assert_allclose(
            got[k], want[k], rtol=1e-5, atol=1e-6, err_msg=k
        )

    with pytest.raises(ValueError):
        _build_sweep_scorer(h, w, 10, 4, True, True, True, True, False)


def test_evaluate_single_with_viewing_simulation():
    """viewing_simulation resamples both images on device before scoring —
    the pixel-transform half of the viewing model the reference only
    prescribes (src/viewing.rs:244-301)."""
    import numpy as np

    from codec_eval_tpu.engine.helpers import evaluate_single
    from codec_eval_tpu.metrics import MetricConfig
    from codec_eval_tpu.viewing import SimulationMode, ViewingCondition

    rng = np.random.default_rng(2)
    y, x = np.mgrid[0:128, 0:128]
    base = 120 + 70 * np.sin(x / 3.0) + 40 * np.cos(y / 2.5)
    ref = np.clip(np.stack([base] * 3, -1), 0, 255).astype(np.uint8)
    enc = np.clip(ref + rng.normal(0, 8, ref.shape), 0, 255).astype(np.uint8)

    vc = ViewingCondition.desktop().with_image_intrinsic_dppx(0.5)
    params = vc.simulation_params(128, 128, SimulationMode.ACCURATE)
    assert params.scale_factor == 0.5
    plain = evaluate_single(ref, enc, MetricConfig(ssimulacra2=True))
    sim = evaluate_single(
        ref, enc, MetricConfig(ssimulacra2=True), viewing_simulation=params
    )
    # Shrinking to the displayed size hides high-frequency noise.
    assert sim.ssimulacra2 > plain.ssimulacra2 + 1.0


def test_batch_scorer_detects_reference_mutation(rng):
    """The reference precompute is cached by content, not identity: a
    caller that decodes into a reused buffer must not be scored against
    the stale reference pyramids."""
    from codec_eval_tpu.engine.scoring import BatchScorer
    from codec_eval_tpu.metrics import MetricConfig

    scorer = BatchScorer(MetricConfig.fast())
    ref = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    cand = ref[None].copy()
    r1 = scorer.score_batch(ref, cand)
    assert r1[0].psnr == float("inf")  # candidate == reference
    ref[:] = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)  # in place
    r2 = scorer.score_batch(ref, cand)
    assert r2[0].psnr < 30.0  # re-precomputed against the NEW content


def test_arbitrary_codec_exception_becomes_codec_error_and_skips():
    """Third-party codec callbacks raise arbitrary exceptions; the callback
    boundary wraps them into CodecError (the reference's EncodeFn signature
    forces failures into Error::Codec, src/eval/session.rs:181-186) so the
    per-cell skip policy applies."""
    import numpy as np

    import codec_eval_tpu as ce
    from codec_eval_tpu.errors import CodecError

    img = ce.ImageData.rgb8(
        np.full((32, 32, 3), 128, np.uint8)
    )

    def bad_encode(image, request):
        raise ValueError("third-party blowup")

    cfg = (
        ce.EvalConfig.builder()
        .report_dir("/tmp/codec-eval-test-reports")
        .metrics(ce.MetricConfig.fast())
        .quality_levels([50.0])
        .build()
    )
    session = ce.EvalSession(cfg)
    session.add_codec("bad", "1", bad_encode)

    import pytest as _pytest

    with _pytest.raises(CodecError, match="third-party blowup"):
        session.evaluate_image("x", img)

    report = session.evaluate_corpus([("x", img)], on_error="skip")
    rows = [r for ir in report.images for r in ir.results]
    assert len(rows) == 1 and rows[0].metrics.ssimulacra2 is None
