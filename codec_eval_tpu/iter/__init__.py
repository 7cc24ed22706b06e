"""codec-iter: fast encoder-iteration layer (eval loop, sources, baselines,
sweeps)."""

from .baseline import (
    Baseline,
    ComparisonRow,
    compare_with_baseline,
    load_baseline,
    make_baseline,
    save_baseline,
)
from .codecs import AVIF_PRESETS, AvifIterConfig, JpegIterConfig, TpuJpegIterConfig, WebpIterConfig, build_codec
from .eval import Codec, EvalPoint, EvalResult, SourceImage, run_eval
from .source import MEDIUM, SMALL, TINY, load_image, load_sources
from .sweep import SweepResult, print_sweep, run_sweep
