"""HTML report layer: self-contained report.html from a CorpusReport.

The reference leaves HTML assembly to downstream consumers (its
ReportGenerator stops at SVG/JSON, crates/codec-compare/src/report.rs:82-117);
this pins the in-house layer that closes that gap.
"""

import math

import pytest

from codec_eval_tpu.codecs import Metric, ReportGenerator, generate_html
from codec_eval_tpu.codecs.html_report import _metrics_with_data
from codec_eval_tpu.engine.report import CodecResult, CorpusReport, ImageReport
from codec_eval_tpu.metrics import MetricResult, PerceptionLevel


def _result(codec, q, bpp, s2, dssim=None, ba=None, psnr=None, level=None):
    return CodecResult(
        codec_id=codec,
        codec_version="1.0",
        quality=q,
        file_size=int(bpp * 512 * 512 / 8),
        bits_per_pixel=bpp,
        encode_time_ms=12,
        decode_time_ms=3,
        metrics=MetricResult(dssim=dssim, ssimulacra2=s2, butteraugli=ba, psnr=psnr),
        perception=level,
    )


@pytest.fixture
def report():
    # Two codecs x 4 qualities (>=4 overlapping points so BD-rate computes),
    # two images; image names exercise HTML escaping and subdir sanitization.
    qs = [50.0, 70.0, 85.0, 95.0]
    images = []
    for name, off in [("kodim<01> & co", 0.0), ("cat-photo", 0.15)]:
        results = []
        for i, q in enumerate(qs):
            s2 = 55 + 10 * i + off
            results.append(
                _result("aaa-jpeg", q, 0.5 + 0.4 * i + off, s2,
                        dssim=0.004 / (i + 1), ba=4.0 - i,
                        psnr=30.0 + 3 * i,
                        level=PerceptionLevel.NOTICEABLE)
            )
            results.append(
                _result("zzz-avif", q, 0.4 + 0.3 * i + off, s2 + 4,
                        dssim=0.003 / (i + 1), ba=3.5 - i,
                        psnr=31.0 + 3 * i,
                        level=PerceptionLevel.SUBTLE)
            )
        images.append(
            ImageReport(name=name, width=512, height=512,
                        uncompressed_size=512 * 512 * 3, results=results)
        )
    return CorpusReport(name="synthetic & <corpus>", images=images,
                        config_summary="q50-95, 2 codecs")


def test_generate_html_content(report):
    html_doc = generate_html(report)
    # Self-contained document with escaped strings everywhere.
    assert html_doc.startswith("<!DOCTYPE html>")
    assert "synthetic &amp; &lt;corpus&gt;" in html_doc
    assert "kodim&lt;01&gt; &amp; co" in html_doc
    assert "<b>" not in html_doc
    # Stat tiles reflect the corpus shape.
    assert ">2</div>" in html_doc  # 2 images / 2 codecs tiles
    assert ">16</div>" in html_doc  # 16 results
    # All four metrics have data -> four metric sections with inline SVG.
    for metric in Metric:
        assert f"<h2>{metric.value.upper()}</h2>" in html_doc
    assert html_doc.count("<svg") >= 4
    # BD-rate renders for the non-baseline codec; baseline labeled.
    assert "baseline" in html_doc
    assert "%" in html_doc
    # Perception badges use the 3-letter codes.
    assert ">NOT</span>" in html_doc and ">SUB</span>" in html_doc
    # Per-image drilldown exists for both images.
    assert html_doc.count("<details>") == 2


def test_metric_sections_omitted_without_data(report):
    for img in report.images:
        for r in img.results:
            r.metrics.psnr = None
            r.metrics.butteraugli = None
    metrics = _metrics_with_data(report)
    assert Metric.PSNR not in metrics and Metric.BUTTERAUGLI not in metrics
    html_doc = generate_html(report)
    assert "<h2>PSNR</h2>" not in html_doc
    assert "<h2>BUTTERAUGLI</h2>" not in html_doc
    assert "<h2>SSIMULACRA2</h2>" in html_doc


def test_report_generator_writes_html(report, tmp_path):
    out = ReportGenerator(tmp_path).generate(report)
    html_path = tmp_path / "report.html"
    assert html_path.exists()
    html_doc = html_path.read_text()
    # The stats table in the HTML matches compute_statistics output.
    stats = out["stats"]
    for c in stats.codecs:
        assert f"{c.avg_bpp:.3f}" in html_doc
        if c.bd_rate_vs_baseline is not None:
            assert math.isfinite(c.bd_rate_vs_baseline)
            assert f"{c.bd_rate_vs_baseline:+.1f}%" in html_doc
    # Pareto points surface with their de-negated metric values.
    front = out["pareto"]
    assert len(front.points) >= 1
    for p in front.points[:3]:
        assert f"{p.bpp:.3f}" in html_doc


def test_empty_report_renders():
    html_doc = generate_html(CorpusReport(name="empty"))
    assert "<h1>empty</h1>" in html_doc
    assert "<svg" not in html_doc
