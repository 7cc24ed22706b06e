"""Stats layer tests, mirroring the reference's inline unit tests
(src/stats/mod.rs, src/stats/pareto.rs)."""

import pytest

from codec_eval_tpu.stats import (
    ParetoFront,
    RDPoint,
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


def test_summary_compute():
    s = Summary.compute([1.0, 2.0, 3.0, 4.0, 5.0])
    assert s.count == 5
    assert s.mean == pytest.approx(3.0)
    assert s.median == pytest.approx(3.0)
    assert s.min == 1.0 and s.max == 5.0
    assert s.p25 == pytest.approx(2.0)
    assert s.p75 == pytest.approx(4.0)
    # Population std-dev (N denominator), as in the reference's Summary.
    assert s.std_dev == pytest.approx(1.4142135, abs=1e-5)


def test_summary_empty():
    assert Summary.compute([]) is None


def test_median():
    assert median([1.0, 2.0, 3.0, 4.0, 5.0]) == 3.0
    assert median([1.0, 2.0, 3.0, 4.0]) == 2.5
    assert median([]) == 0.0


def test_std_dev_sample():
    # Reference doctest: [2,4,4,4,5,5,7,9] -> ~2.138 (N-1).
    assert std_dev([2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0]) == pytest.approx(
        2.138, abs=1e-3
    )
    assert std_dev([1.0]) == 0.0


def test_percentile_r7():
    values = [1.0, 2.0, 3.0, 4.0, 5.0]
    assert percentile(values, 0.5) == pytest.approx(3.0)
    assert percentile(values, 0.25) == pytest.approx(2.0)
    assert percentile(values, 0.75) == pytest.approx(4.0)
    # Accepts 0-100 range too (reference's percentile_sorted normalization).
    assert percentile(values, 50) == pytest.approx(3.0)


def test_percentile_u32():
    assert percentile_u32([10, 20, 30, 40, 50], 0.5) == 30


def test_trimmed_mean():
    values = [1.0, 10.0, 11.0, 12.0, 13.0, 100.0]
    assert trimmed_mean(values, 0.2) == pytest.approx(11.5, abs=1e-3)


def test_iqr():
    assert iqr([1.0, 2.0, 3.0, 4.0, 5.0]) == pytest.approx(2.0, abs=1e-3)


def test_bd_rate_better_codec_negative():
    # Test codec uses half the rate at the same quality -> strongly negative.
    ref = [(1.0, 60.0), (2.0, 70.0), (4.0, 80.0), (8.0, 90.0)]
    test = [(0.5, 60.0), (1.0, 70.0), (2.0, 80.0), (4.0, 90.0)]
    bd = bd_rate(ref, test)
    assert bd is not None and bd < -40.0


def test_bd_rate_identical_zero():
    curve = [(1.0, 60.0), (2.0, 70.0), (4.0, 80.0), (8.0, 90.0)]
    assert bd_rate(curve, curve) == pytest.approx(0.0, abs=1e-9)


def test_bd_rate_requires_four_points():
    short = [(1.0, 60.0), (2.0, 70.0), (4.0, 80.0)]
    full = [(1.0, 60.0), (2.0, 70.0), (4.0, 80.0), (8.0, 90.0)]
    assert bd_rate(short, full) is None


def test_bd_rate_no_overlap():
    a = [(1.0, 10.0), (2.0, 20.0), (3.0, 30.0), (4.0, 40.0)]
    b = [(1.0, 50.0), (2.0, 60.0), (3.0, 70.0), (4.0, 80.0)]
    assert bd_rate(a, b) is None


# -- Pareto ---------------------------------------------------------------


def test_dominates():
    p1 = RDPoint("a", 80.0, 1.0, 90.0)
    p2 = RDPoint("b", 80.0, 2.0, 85.0)
    assert p1.dominates(p2)
    assert not p2.dominates(p1)
    # Equal points don't dominate each other.
    p3 = RDPoint("c", 80.0, 1.0, 90.0)
    assert not p1.dominates(p3)


def test_pareto_compute():
    points = [
        RDPoint("a", 50.0, 0.5, 60.0),
        RDPoint("a", 80.0, 1.0, 80.0),
        RDPoint("b", 80.0, 1.5, 75.0),  # dominated by a@1.0
        RDPoint("b", 95.0, 2.0, 90.0),
    ]
    front = ParetoFront.compute(points)
    assert len(front) == 3
    assert [p.bpp for p in front.points] == sorted(p.bpp for p in front.points)
    assert all(p.codec != "b" or p.quality == 90.0 for p in front.points)


def test_pareto_queries():
    points = [
        RDPoint("a", 50.0, 0.5, 60.0),
        RDPoint("a", 80.0, 1.0, 80.0),
        RDPoint("b", 95.0, 2.0, 90.0),
    ]
    front = ParetoFront.compute(points)
    assert front.best_at_bpp(1.2).quality == 80.0
    assert front.best_at_quality(70.0).bpp == 1.0
    assert front.codecs() == ["a", "b"]
    assert len(front.at_quality(80.0)) == 2
    assert len(front.at_bpp(1.0)) == 2
    per = ParetoFront.per_codec(points)
    assert set(per) == {"a", "b"}


def test_pareto_empty():
    front = ParetoFront.compute([])
    assert front.is_empty()
    assert front.best_at_bpp(1.0) is None
