"""EvalSession: the core callback-based evaluation engine.

Behavioral port of the reference's engine (reference:
src/eval/session.rs:280-585) with a TPU-first inner loop: codecs remain
opaque host-side callbacks (the reference's key architectural contract,
src/eval/session.rs:181-186), but metric scoring is *batched* — all decoded
candidates of an image are staged into one padded device batch and scored in
a single fused dispatch (see ``scoring.BatchScorer``) instead of pair-by-pair
native calls.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, List, Optional

import numpy as np

from ..errors import CodecError, DimensionMismatch
from ..metrics import MetricConfig
from ..viewing import ViewingCondition
from .image import ImageData
from .report import CodecResult, CorpusReport, ImageReport, write_csv_summary, write_json
from .scoring import BatchScorer

#: Encode callback: (ImageData, EncodeRequest) -> bytes
EncodeFn = Callable[["ImageData", "EncodeRequest"], bytes]
#: Decode callback: bytes -> ImageData
DecodeFn = Callable[[bytes], "ImageData"]

DEFAULT_QUALITY_LEVELS = [50.0, 60.0, 70.0, 80.0, 85.0, 90.0, 95.0]


@dataclass
class EncodeRequest:
    """Quality + codec-specific params.  reference: src/eval/session.rs:150-178."""

    quality: float
    params: Dict[str, str] = field(default_factory=dict)

    def with_param(self, key: str, value: str) -> "EncodeRequest":
        self.params[key] = value
        return self


@dataclass
class EvalConfig:
    """Session configuration.  reference: src/eval/session.rs:188-278."""

    report_dir: Path
    cache_dir: Optional[Path] = None
    viewing: ViewingCondition = field(default_factory=ViewingCondition.desktop)
    metrics: MetricConfig = field(default_factory=MetricConfig.all)
    quality_levels: List[float] = field(default_factory=lambda: list(DEFAULT_QUALITY_LEVELS))

    @classmethod
    def builder(cls) -> "EvalConfigBuilder":
        return EvalConfigBuilder()


class EvalConfigBuilder:
    """Builder with the reference's defaulting rules (report_dir required)."""

    def __init__(self) -> None:
        self._report_dir: Optional[Path] = None
        self._cache_dir: Optional[Path] = None
        self._viewing: Optional[ViewingCondition] = None
        self._metrics: Optional[MetricConfig] = None
        self._quality_levels: Optional[List[float]] = None

    def report_dir(self, path) -> "EvalConfigBuilder":
        self._report_dir = Path(path)
        return self

    def cache_dir(self, path) -> "EvalConfigBuilder":
        self._cache_dir = Path(path)
        return self

    def viewing(self, viewing: ViewingCondition) -> "EvalConfigBuilder":
        self._viewing = viewing
        return self

    def metrics(self, metrics: MetricConfig) -> "EvalConfigBuilder":
        self._metrics = metrics
        return self

    def quality_levels(self, levels: List[float]) -> "EvalConfigBuilder":
        self._quality_levels = [float(q) for q in levels]
        return self

    def build(self) -> EvalConfig:
        if self._report_dir is None:
            raise ValueError("report_dir is required")
        return EvalConfig(
            report_dir=self._report_dir,
            cache_dir=self._cache_dir,
            viewing=self._viewing or ViewingCondition.desktop(),
            metrics=self._metrics or MetricConfig.all(),
            quality_levels=self._quality_levels or list(DEFAULT_QUALITY_LEVELS),
        )


@dataclass
class _CodecEntry:
    id: str
    version: str
    encode: EncodeFn
    decode: Optional[DecodeFn]


class EvalSession:
    """The main evaluation engine.  reference: src/eval/session.rs:309-497.

    Codecs are registered as plain callables, making tests trivial (the
    reference's key testability property — closures instead of codec mocks,
    SURVEY.md §4.4).
    """

    def __init__(self, config: EvalConfig):
        self.config = config
        self._codecs: List[_CodecEntry] = []
        self._scorer = BatchScorer(config.metrics)

    def add_codec(self, codec_id: str, version: str, encode: EncodeFn) -> "EvalSession":
        self._codecs.append(_CodecEntry(codec_id, version, encode, None))
        return self

    def add_codec_with_decode(
        self, codec_id: str, version: str, encode: EncodeFn, decode: DecodeFn
    ) -> "EvalSession":
        self._codecs.append(_CodecEntry(codec_id, version, encode, decode))
        return self

    @property
    def codec_count(self) -> int:
        return len(self._codecs)

    def evaluate_image(self, name: str, image: ImageData) -> ImageReport:
        """Evaluate one image across all codecs x quality levels.

        Host codecs run serially (timed individually, like the reference's
        Instant timers, src/eval/session.rs:380-389); all decoded candidates
        are then scored in one batched device dispatch per image.
        """
        width, height = image.width, image.height
        report = ImageReport(name=name, width=width, height=height)
        reference_rgb = image.to_rgb8()

        # Phase 1 (host): encode/decode every candidate, timed.
        staged: List[dict] = []
        for codec in self._codecs:
            for quality in self.config.quality_levels:
                request = EncodeRequest(quality=quality)
                t0 = time.perf_counter()
                encoded = codec.encode(image, request)
                encode_ms = int((time.perf_counter() - t0) * 1000)

                entry = {
                    "codec": codec,
                    "quality": quality,
                    "params": request.params,
                    "file_size": len(encoded),
                    "encode_ms": encode_ms,
                    "decode_ms": None,
                    "decoded": None,
                }
                if codec.decode is not None:
                    t0 = time.perf_counter()
                    decoded = codec.decode(encoded)
                    entry["decode_ms"] = int((time.perf_counter() - t0) * 1000)
                    decoded_rgb = decoded.to_rgb8_srgb()
                    if decoded_rgb.shape[:2] != (height, width):
                        raise DimensionMismatch(
                            (width, height),
                            (decoded_rgb.shape[1], decoded_rgb.shape[0]),
                        )
                    entry["decoded"] = decoded_rgb
                staged.append(entry)

        # Phase 2 (device): one fused batch per image for all decodable pairs.
        decodable = [e for e in staged if e["decoded"] is not None]
        if decodable and self._scorer.enabled():
            batch = np.stack([e["decoded"] for e in decodable])
            results = self._scorer.score_batch(reference_rgb, batch)
            for e, m in zip(decodable, results):
                e["metrics"] = m

        from ..metrics import MetricResult

        for e in staged:
            metrics = e.get("metrics", MetricResult())
            report.results.append(
                CodecResult(
                    codec_id=e["codec"].id,
                    codec_version=e["codec"].version,
                    quality=e["quality"],
                    file_size=e["file_size"],
                    bits_per_pixel=e["file_size"] * 8 / (width * height),
                    encode_time_ms=e["encode_ms"],
                    decode_time_ms=e["decode_ms"],
                    metrics=metrics,
                    perception=metrics.perception_level() if e["decoded"] is not None else None,
                    cached_path=None,
                    codec_params=e["params"],
                )
            )
        return report

    def write_image_report(self, report: ImageReport) -> None:
        """JSON report at <report_dir>/<name>.json.
        reference: src/eval/session.rs:500-508."""
        self.config.report_dir.mkdir(parents=True, exist_ok=True)
        write_json(report, self.config.report_dir / f"{report.name}.json")

    def write_corpus_report(self, report: CorpusReport) -> None:
        """JSON + 13-column CSV summary.  reference: src/eval/session.rs:511-584."""
        self.config.report_dir.mkdir(parents=True, exist_ok=True)
        write_json(report, self.config.report_dir / f"{report.name}.json")
        write_csv_summary(report, self.config.report_dir / f"{report.name}.csv")
