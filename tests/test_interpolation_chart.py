"""Interpolation + chart tests (reference: src/interpolation/mod.rs tests,
src/stats/chart.rs doctest)."""

import numpy as np
import pytest

from codec_eval_tpu.stats import (
    ChartConfig,
    ChartPoint,
    ChartSeries,
    GapPolynomial,
    InterpolationConfig,
    InterpolationTable,
    compute_gap_polynomials,
    fit_gap_polynomial,
    fit_power_law,
    generate_svg,
    linear_interpolate,
)


def test_fit_power_law_recovers():
    # y = 2 * x^1.5 + 3 exactly.
    pts = [(x, 2.0 * x**1.5 + 3.0) for x in (1.0, 2.0, 4.0, 8.0, 16.0)]
    fit = fit_power_law(pts, InterpolationConfig())
    assert fit is not None
    a, b, c, r2 = fit
    assert b == pytest.approx(1.5, abs=0.051)  # grid step 0.1
    assert r2 > 0.999


def test_fit_power_law_too_few():
    assert fit_power_law([(1.0, 1.0), (2.0, 2.0)], InterpolationConfig()) is None


def test_gap_polynomial():
    poly = GapPolynomial(q_low=50, q_high=90, a=0.001, b=2.0, c=0.5,
                         r_squared=0.98, validation_error=0.001)
    assert poly.covers(70) and not poly.covers(95)
    v = poly.interpolate(70.0)
    assert 0.0 < v <= 100.0
    # Clamped at 100.
    big = GapPolynomial(0, 100, 1000.0, 2.0, 0.0, 1.0, 0.0)
    assert big.interpolate(50.0) == 100.0


def test_fit_gap_polynomial_validation():
    pts = [(30, 0.010), (50, 0.005), (70, 0.002), (80, 0.001), (90, 0.0005)]
    poly = fit_gap_polynomial(pts, 2, InterpolationConfig())
    assert poly is not None
    assert poly.q_low == 30 and poly.q_high == 90
    assert poly.validation_error < 0.01


def test_compute_gap_polynomials():
    pts = [(30, 0.010), (50, 0.005), (70, 0.002), (80, 0.001), (90, 0.0005)]
    polys = compute_gap_polynomials(pts, InterpolationConfig())
    assert polys
    assert compute_gap_polynomials(pts[:3], InterpolationConfig()) == []


def test_interpolation_table():
    table = InterpolationTable("mozjpeg", "desktop-1x")
    table.polynomials.append(
        GapPolynomial(50, 90, 0.5, 1.0, 10.0, 0.99, 0.0)
    )
    assert table.find_polynomial(70) is not None
    assert table.find_polynomial(95) is None
    assert table.interpolate(70.0) == pytest.approx(45.0)
    assert table.interpolate(95.0) == 95.0  # identity fallback


def test_linear_interpolate():
    pts = [(50, 0.010), (70, 0.005), (90, 0.001)]
    assert linear_interpolate(0.0075, pts) == pytest.approx(60.0)
    assert linear_interpolate(0.003, pts) == pytest.approx(80.0)
    # Outside range -> closest point's x.
    assert linear_interpolate(0.1, pts) == 50.0
    assert linear_interpolate(0.005, [(70, 0.005)]) == 70.0
    assert linear_interpolate(0.005, []) is None


# -- chart ----------------------------------------------------------------


def test_generate_svg():
    series = [
        ChartSeries(
            name="Codec A",
            color="#e74c3c",
            points=[ChartPoint(0.5, 80.0), ChartPoint(1.0, 90.0, "q90")],
        )
    ]
    svg = generate_svg(series, ChartConfig.new("Quality vs Size"))
    assert svg.startswith("<svg")
    assert "Codec A" in svg
    assert "prefers-color-scheme: dark" in svg
    assert "polyline" in svg


def test_generate_svg_empty():
    assert generate_svg([], ChartConfig()) == ""
    assert generate_svg([ChartSeries("x", "#fff", [])], ChartConfig()) == ""


def test_generate_svg_lower_is_better_flips_axis():
    pts = [ChartPoint(0.5, 1.0), ChartPoint(1.0, 5.0)]
    up = generate_svg([ChartSeries("s", "#000", pts)], ChartConfig())
    down = generate_svg(
        [ChartSeries("s", "#000", pts)],
        ChartConfig(lower_is_better=True),
    )
    assert up != down
