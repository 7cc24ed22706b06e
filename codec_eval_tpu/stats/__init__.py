"""L3 stats / R-D analytics layer."""

from .chart import ChartConfig, ChartPoint, ChartSeries, generate_svg
from .interpolation import (
    GapPolynomial,
    InterpolationConfig,
    InterpolationTable,
    compute_gap_polynomials,
    fit_gap_polynomial,
    fit_power_law,
    linear_interpolate,
)
from .pareto import ParetoFront, RDPoint
from .rd_knee import (
    AngleBin,
    AxisRange,
    BinScheme,
    CodecConfig,
    ConfiguredParetoFront,
    ConfiguredRDPoint,
    CorpusAggregate,
    DualAngleBin,
    EncodeResult,
    FixedFrame,
    NormalizationContext,
    QualityDirection,
    RDCalibration,
    RDKnee,
    RDPosition,
    WEB_FRAME,
    defaults,
    find_knee,
    interpolate_s2_at,
)
from .summary import (
    Summary,
    bd_rate,
    iqr,
    mean,
    median,
    percentile,
    percentile_u32,
    std_dev,
    trimmed_mean,
)
