"""L2 evaluation engine: sessions, reports, batched device scoring."""

from .helpers import assert_perception_level, assert_quality, evaluate_single
from .image import ImageData
from .report import CodecResult, CorpusReport, ImageReport
from .scoring import BatchScorer
from .tpu_sweep import TpuSweepPoint, encode_to_target, evaluate_tpujpeg_sweep
from .session import (
    DEFAULT_QUALITY_LEVELS,
    EncodeRequest,
    EvalConfig,
    EvalConfigBuilder,
    EvalSession,
)

__all__ = [
    "assert_perception_level",
    "assert_quality",
    "evaluate_single",
    "ImageData",
    "CodecResult",
    "CorpusReport",
    "ImageReport",
    "BatchScorer",
    "TpuSweepPoint",
    "evaluate_tpujpeg_sweep",
    "encode_to_target",
    "DEFAULT_QUALITY_LEVELS",
    "EncodeRequest",
    "EvalConfig",
    "EvalConfigBuilder",
    "EvalSession",
]
