"""Multihost partition logic + error-model coverage."""

import pytest

from codec_eval_tpu.errors import (
    CacheError,
    CodecError,
    CodecEvalError,
    CorpusError,
    CsvImportError,
    DimensionMismatch,
    ImageLoadError,
    InvalidQuality,
    MetricCalculationError,
    QualityBelowThreshold,
    ReportError,
    UnsupportedFormat,
)
from codec_eval_tpu.parallel.multihost import partition_corpus


def test_partition_corpus_balanced_and_disjoint():
    items = list(range(11))
    shares = [partition_corpus(items, process_id=i, num_processes=3) for i in range(3)]
    # Disjoint, complete, balanced within 1.
    flat = sorted(x for s in shares for x in s)
    assert flat == items
    sizes = [len(s) for s in shares]
    assert max(sizes) - min(sizes) <= 1
    # Strided: host 0 gets 0, 3, 6, 9.
    assert shares[0] == [0, 3, 6, 9]


def test_error_hierarchy():
    """Every typed error is a CodecEvalError and formats its context
    (reference error enum: src/error.rs:12-100)."""
    cases = [
        (ImageLoadError("bad file"), "bad file"),
        (CodecError("avif", "boom"), "avif"),
        (DimensionMismatch((2, 2), (3, 3)), "(3, 3)"),
        (MetricCalculationError("DSSIM", "nan"), "DSSIM"),
        (CorpusError("missing"), "missing"),
        (CsvImportError("no column"), "no column"),
        (InvalidQuality(120.0), "120"),
        (QualityBelowThreshold("SSIMULACRA2", 70.0, 80.0), "80"),
        (UnsupportedFormat("jp2"), "jp2"),
        (ReportError("io"), "io"),
        (CacheError("disk"), "disk"),
    ]
    for err, fragment in cases:
        assert isinstance(err, CodecEvalError)
        assert fragment in str(err)


def test_quality_below_threshold_fields():
    e = QualityBelowThreshold("DSSIM", 0.005, 0.003)
    assert e.metric == "DSSIM"
    assert e.value == 0.005
    assert e.threshold == 0.003
