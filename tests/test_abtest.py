"""Subjective-study statistics (stats/abtest.py) — the executable form of
the reference's human-testing methodology (reference: README.md:521-660)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from codec_eval_tpu.stats import (
    ParticipantRecord,
    ScreeningCriteria,
    benjamini_hochberg,
    binomial_test_two_sided,
    bootstrap_ci,
    cohens_d,
    fatigue_check,
    holm_bonferroni,
    mos_summary,
    position_bias,
    recommended_sample_size,
    required_sample_size,
    scale_usage,
    screen_participants,
    two_afc_test,
    wilcoxon_signed_rank,
)


def _binom_two_sided_exact(k: int, n: int) -> float:
    """Independent oracle: exact integer arithmetic over math.comb."""
    pmfs = [math.comb(n, i) for i in range(n + 1)]  # / 2**n implied
    total = sum(p for p in pmfs if p <= pmfs[k])
    return total / 2**n


@pytest.mark.parametrize("k,n", [(60, 100), (50, 100), (0, 10), (10, 10), (7, 9)])
def test_binomial_test_matches_exact_oracle(k, n):
    assert binomial_test_two_sided(k, n) == pytest.approx(
        _binom_two_sided_exact(k, n), rel=1e-9
    )


def test_binomial_test_edges():
    assert binomial_test_two_sided(5, 10, 0.5) == pytest.approx(1.0)
    with pytest.raises(ValueError):
        binomial_test_two_sided(11, 10)


def test_two_afc_report_format():
    res = two_afc_test(67, 100)
    assert res.preference == pytest.approx(0.67)
    # the reference's reporting style: README.md:645
    assert res.report("Codec A").startswith("Codec A preferred 67% of time")
    assert res.p_value == pytest.approx(_binom_two_sided_exact(67, 100), rel=1e-9)


def test_holm_bonferroni_hand_computed():
    adj = holm_bonferroni([0.01, 0.04, 0.03, 0.005])
    assert adj == pytest.approx([0.03, 0.06, 0.06, 0.02])


def test_benjamini_hochberg_hand_computed():
    adj = benjamini_hochberg([0.01, 0.04, 0.03, 0.005])
    assert adj == pytest.approx([0.02, 0.04, 0.04, 0.02])


def test_corrections_empty_and_clipping():
    assert holm_bonferroni([]) == []
    assert benjamini_hochberg([]) == []
    assert holm_bonferroni([0.9, 0.8]) == pytest.approx([1.0, 1.0])


def test_bootstrap_ci_deterministic_and_brackets_mean():
    rng = np.random.default_rng(3)
    data = rng.normal(3.2, 1.0, 200)
    lo1, hi1 = bootstrap_ci(data, seed=7)
    lo2, hi2 = bootstrap_ci(data, seed=7)
    assert (lo1, hi1) == (lo2, hi2)
    assert lo1 < data.mean() < hi1
    # ~95% CI half-width for N=200, sd=1 is ~0.14
    assert 0.05 < (hi1 - lo1) / 2 < 0.3


def test_mos_summary_fields():
    ratings = [4, 4, 5, 3, 4, 4, 5, 4, 3, 4]
    s = mos_summary(ratings)
    assert s.n == 10
    assert s.mean == pytest.approx(4.0)
    assert s.median == pytest.approx(4.0)
    assert s.ci_low <= s.mean <= s.ci_high
    assert s.std == pytest.approx(np.std(ratings, ddof=1))


def test_cohens_d_pinned():
    a = [5.0, 6.0, 7.0, 8.0]
    b = [3.0, 4.0, 5.0, 6.0]
    # means differ by 2, pooled sd = sqrt(5/3)
    assert cohens_d(a, b) == pytest.approx(2.0 / math.sqrt(5.0 / 3.0))
    assert cohens_d([1.0, 1.0, 1.0], [1.0, 1.0, 1.0]) == 0.0


def test_wilcoxon_all_positive_differences():
    a = [2.0, 3.0, 4.0, 5.0, 6.0]
    b = [1.0, 1.0, 1.0, 1.0, 1.0]
    w, p = wilcoxon_signed_rank(a, b)
    assert w == pytest.approx(15.0)  # all ranks positive
    # z = (15 - 7.5) / sqrt(13.75)
    z = 7.5 / math.sqrt(13.75)
    assert p == pytest.approx(2 * (1 - 0.5 * (1 + math.erf(z / math.sqrt(2)))), rel=1e-9)


def test_wilcoxon_no_difference():
    a = [1.0, 2.0, 3.0]
    w, p = wilcoxon_signed_rank(a, a)
    assert p == 1.0


def test_position_bias_rule():
    # 80% left at N=100: significant AND beyond the 70% exclusion rule
    b = position_bias(80, 100)
    assert b.biased and b.p_value < 0.01
    # 55% left at N=100: neither
    assert not position_bias(55, 100).biased
    # 75% at tiny N: over 70% but not significant -> not excluded
    assert not position_bias(3, 4).biased


def test_screening_each_rule_trips():
    records = [
        ParticipantRecord("ok", 10, 1, 10, 8, [500.0] * 20, 100, 100),
        ParticipantRecord("attn", 10, 3, 10, 8, [500.0] * 20, 100, 100),
        ParticipantRecord("dupe", 10, 0, 10, 5, [500.0] * 20, 100, 100),
        ParticipantRecord("fast", 10, 0, 10, 8, [150.0] * 5 + [500.0] * 15, 100, 100),
        ParticipantRecord("quit", 10, 0, 10, 8, [500.0] * 20, 70, 100),
    ]
    results = {r.participant_id: r for r in screen_participants(records)}
    assert results["ok"].included
    assert not results["attn"].included and "attention" in results["attn"].reasons[0]
    assert not results["dupe"].included and "agreement" in results["dupe"].reasons[0]
    assert not results["fast"].included and "ms" in results["fast"].reasons[0]
    assert not results["quit"].included and "completion" in results["quit"].reasons[0]


def test_screening_custom_criteria():
    rec = ParticipantRecord("p", 10, 2, 0, 0, [], 100, 100)
    strict = ScreeningCriteria(max_attention_failure_rate=0.10)
    assert not screen_participants([rec], strict)[0].included
    assert screen_participants([rec])[0].included  # default allows 20%


def test_required_sample_size_reference_example():
    # reference README.md:580: "~64 participants per condition" for a
    # 0.5 MOS difference at SD=1.0, 80% power (Lehr's rule rounds to 64;
    # the exact normal-approximation formula gives 63).
    n = required_sample_size(0.5, 1.0)
    assert 62 <= n <= 64
    # scaling sanity: halving the effect quadruples N
    assert required_sample_size(0.25, 1.0) == pytest.approx(4 * n, abs=3)
    with pytest.raises(ValueError):
        required_sample_size(0.0, 1.0)


def test_recommended_sample_size_table():
    # reference README.md:572-578 sample-size table
    assert recommended_sample_size("large") == (15, (20, 30))
    assert recommended_sample_size("Medium") == (30, (50, 80))
    assert recommended_sample_size("small")[0] == 80
    with pytest.raises(ValueError):
        recommended_sample_size("huge")


def test_fatigue_check_detects_drop():
    # 95% early vs 60% late on attention checks at N=40 each: fatigued
    f = fatigue_check(38, 40, 24, 40)
    assert f.fatigued and f.p_value < 0.01
    assert f.early_accuracy == pytest.approx(0.95)
    # symmetric improvement is NOT fatigue
    assert not fatigue_check(24, 40, 38, 40).fatigued
    # small insignificant drop is NOT fatigue
    assert not fatigue_check(38, 40, 36, 40).fatigued
    with pytest.raises(ValueError):
        fatigue_check(1, 0, 1, 1)


def test_scale_usage_central_tendency():
    # raters glued to 3-4: central tendency flagged
    u = scale_usage([3, 4, 3, 4, 3, 4, 3, 3, 4, 3] * 5)
    assert u.central_tendency and u.extremes_rate == 0.0
    assert u.histogram[3] == 30 and u.histogram[1] == 0
    # full-scale usage: fine
    v = scale_usage([1, 2, 3, 4, 5, 1, 5, 3, 2, 4])
    assert not v.central_tendency
    assert v.extremes_rate == pytest.approx(0.4)
    with pytest.raises(ValueError):
        scale_usage([])
