"""EvalSession corpus pipeline + cache_dir tests."""

import numpy as np
import pytest

from codec_eval_tpu import EvalConfig, EvalSession, ImageData, MetricConfig
from codec_eval_tpu.errors import CodecError


def _img(seed=0, n=24):
    return np.random.default_rng(seed).integers(0, 256, (n, n, 3)).astype(np.uint8)


def _identity_session(tmp_path, cache=False):
    b = (
        EvalConfig.builder()
        .report_dir(tmp_path)
        .metrics(MetricConfig.fast())
        .quality_levels([80])
    )
    if cache:
        b = b.cache_dir(tmp_path / "cache")
    session = EvalSession(b.build())
    session.add_codec_with_decode(
        "identity", "1.0",
        lambda img, req: img.to_rgb8().tobytes(),
        lambda data: ImageData.rgb_slice(data, 24, 24),
    )
    return session


def test_evaluate_corpus_pipeline(tmp_path):
    session = _identity_session(tmp_path)
    items = [(f"img{i}", ImageData.rgb8(_img(i))) for i in range(3)]
    seen = []
    report = session.evaluate_corpus(items, name="demo", progress=seen.append)
    assert len(report.images) == 3
    assert report.codec_ids() == ["identity"]
    assert any("3/3" in s for s in seen)


def test_evaluate_corpus_skip_and_continue(tmp_path):
    """Failing cells become unscored rows; the image itself stays in the
    report (reference policy: crates/codec-compare/src/main.rs:374-376
    continues per-eval and metrics are Option-valued per cell)."""
    session = _identity_session(tmp_path)

    def flaky_encode(img, req):
        if img.to_rgb8()[0, 0, 0] % 2 == 1:
            raise CodecError("identity", "simulated failure")
        return img.to_rgb8().tobytes()

    session._codecs[0].encode = flaky_encode
    items = [(f"img{i}", ImageData.rgb8(_img(i))) for i in range(4)]
    failing = [im.to_rgb8()[0, 0, 0] % 2 == 1 for _, im in items]
    report = session.evaluate_corpus(items, on_error="skip")
    assert len(report.images) == len(items)
    for img_report, failed in zip(report.images, failing):
        assert len(img_report.results) == 1
        scored = img_report.results[0].metrics.psnr is not None
        assert scored == (not failed)

    with pytest.raises(CodecError):
        session.evaluate_corpus(items, on_error="raise")


def test_per_cell_failure_keeps_other_codec(tmp_path):
    """One codec's decode failure must not discard the other codec's cells
    for the same image (reference: per-(codec, quality) Option metrics)."""
    session = _identity_session(tmp_path)

    def broken_decode(data):
        raise CodecError("broken", "decode exploded")

    session.add_codec_with_decode(
        "broken", "0.0",
        lambda img, req: img.to_rgb8().tobytes(),
        broken_decode,
    )
    report = session.evaluate_image(
        "img0", ImageData.rgb8(_img(0)), on_error="skip"
    )
    by_codec = {r.codec_id: r for r in report.results}
    assert set(by_codec) == {"identity", "broken"}
    assert by_codec["identity"].metrics.psnr is not None
    assert by_codec["broken"].metrics.psnr is None
    assert by_codec["broken"].file_size == 0

    with pytest.raises(CodecError):
        session.evaluate_image("img0", ImageData.rgb8(_img(0)))


def test_cache_dir_writes_artifacts(tmp_path):
    session = _identity_session(tmp_path, cache=True)
    report = session.evaluate_image("x", ImageData.rgb8(_img()))
    r = report.results[0]
    assert r.cached_path is not None
    from pathlib import Path

    p = Path(r.cached_path)
    assert p.exists()
    assert p.stat().st_size == r.file_size


def test_xyb_roundtrip_config_path(tmp_path):
    """perceptual_xyb roundtrips the reference before scoring: scores differ
    from the plain config on the same pair (reference: session.rs:447-455)."""
    import numpy as np

    from codec_eval_tpu import evaluate_single

    rng = np.random.default_rng(9)
    ref = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    dist = np.clip(ref.astype(np.int16) + rng.integers(-6, 7, ref.shape), 0, 255
                   ).astype(np.uint8)
    plain = evaluate_single(ref, dist, MetricConfig(ssimulacra2=True))
    xyb = evaluate_single(
        ref, dist, MetricConfig(ssimulacra2=True, xyb_roundtrip=True)
    )
    assert plain.ssimulacra2 != xyb.ssimulacra2
    assert abs(plain.ssimulacra2 - xyb.ssimulacra2) < 20.0
