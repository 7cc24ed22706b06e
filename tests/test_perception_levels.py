"""DSSIM perception-level semantics lock (VERDICT r3 #7).

The DSSIM recipe's structural choices (1 blur pass, ceil downsample —
docs/dssim_decision_matrix.md) were chosen on rank agreement with the two
oracle-verified metrics; this test additionally pins the USER-VISIBLE
semantics: the `PerceptionLevel` band a JPEG ladder lands in at each quality,
on the committed photo-statistics corpus (deterministic pixels,
iter/source.photo_sources).  A drift in the DSSIM pipeline that moves scores
across the reference's four thresholds (.0003/.0007/.0015/.003 —
reference: src/metrics/mod.rs:17-27, src/eval/helpers.rs:291-317) flips a
band here and fails CI, even if rank correlation stays intact.

Pinned values measured 2026-08-20 on the CPU XLA path (the platform the
suite runs on); level assertions skip points within 15% of a band boundary
so a libjpeg encoder update cannot flip them spuriously.
"""

import io

import numpy as np
import pytest
from PIL import Image

from codec_eval_tpu.engine.helpers import (
    assert_perception_level,
    evaluate_single,
)
from codec_eval_tpu.errors import QualityBelowThreshold
from codec_eval_tpu.iter.source import photo_sources
from codec_eval_tpu.metrics import MetricConfig, PerceptionLevel

QUALITIES = (55, 75, 88, 92, 95, 97, 98)

#: (image index in photo_sources(3, 256, 2026)) -> per-quality DSSIM pins.
PINS = {
    0: (0.01345, 0.00732, 0.00304, 0.00195, 0.00129, 0.00087, 0.00069),
    1: (0.01834, 0.00956, 0.00443, 0.00328, 0.00243, 0.00158, 0.00108),
}

THRESHOLDS = (0.0003, 0.0007, 0.0015, 0.003)


def _near_boundary(v: float, margin: float = 0.15) -> bool:
    return any(abs(v - t) / t < margin for t in THRESHOLDS)


@pytest.fixture(scope="module")
def ladders():
    srcs = photo_sources(n=2, size=256, seed=2026)
    out = {}
    for i, s in enumerate(srcs):
        rows = []
        for q in QUALITIES:
            buf = io.BytesIO()
            Image.fromarray(s.rgb).save(buf, "JPEG", quality=q, subsampling=2)
            dec = np.array(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
            r = evaluate_single(s.rgb, dec, MetricConfig(dssim=True))
            rows.append((q, dec, r.dssim))
        out[i] = (s.rgb, rows)
    return out


def test_dssim_values_and_levels_pinned(ladders):
    for i, pins in PINS.items():
        _, rows = ladders[i]
        for (q, _dec, got), pin in zip(rows, pins):
            assert got == pytest.approx(pin, rel=0.10), (i, q, got, pin)
            if not _near_boundary(pin):
                assert (
                    PerceptionLevel.from_dssim(got)
                    is PerceptionLevel.from_dssim(pin)
                ), (i, q, got, pin)


def test_levels_monotonic_in_quality(ladders):
    """Higher quality must never land in a worse perception band."""
    for _i, (_ref, rows) in ladders.items():
        ranks = [PerceptionLevel.from_dssim(d).rank() for _q, _dec, d in rows]
        assert ranks == sorted(ranks, reverse=True), ranks


def test_assert_perception_level_bands(ladders):
    """The CI gate itself: passes at the band each quality reaches, raises
    one band stricter (skipping near-boundary points)."""
    order = [
        PerceptionLevel.IMPERCEPTIBLE,
        PerceptionLevel.MARGINAL,
        PerceptionLevel.SUBTLE,
        PerceptionLevel.NOTICEABLE,
        PerceptionLevel.DEGRADED,
    ]
    checked = 0
    for _i, (ref, rows) in ladders.items():
        for q, dec, d in rows:
            if _near_boundary(d):
                continue
            level = PerceptionLevel.from_dssim(d)
            assert_perception_level(ref, dec, level)  # must pass
            k = order.index(level)
            if k > 0:
                with pytest.raises(QualityBelowThreshold):
                    assert_perception_level(ref, dec, order[k - 1])
                checked += 1
    assert checked >= 6  # the fixture must actually exercise multiple bands


def test_identical_is_imperceptible(ladders):
    ref, _rows = ladders[0]
    assert_perception_level(ref, ref, PerceptionLevel.IMPERCEPTIBLE)
