"""Viewing-condition tests, mirroring the reference's densest test module
(src/viewing.rs:658-1005, 20 tests)."""

import pytest

from codec_eval_tpu.viewing import (
    REFERENCE_PPD,
    SimulationMode,
    ViewingCondition,
    presets,
)


def test_constructors():
    assert ViewingCondition.desktop().acuity_ppd == 40.0
    assert ViewingCondition.laptop().acuity_ppd == 60.0
    assert ViewingCondition.smartphone().acuity_ppd == 90.0


def test_effective_ppd_srcset():
    c = ViewingCondition.desktop().with_browser_dppx(2.0).with_image_intrinsic_dppx(2.0)
    assert c.effective_ppd() == pytest.approx(40.0)
    c = ViewingCondition.desktop().with_browser_dppx(2.0).with_image_intrinsic_dppx(1.0)
    assert c.effective_ppd() == pytest.approx(20.0)  # undersized: stricter
    c = ViewingCondition.desktop().with_browser_dppx(1.0).with_image_intrinsic_dppx(2.0)
    assert c.effective_ppd() == pytest.approx(80.0)  # oversized: lenient


def test_ppd_override():
    c = ViewingCondition.desktop().with_ppd_override(55.0)
    assert c.effective_ppd() == 55.0


def test_srcset_ratio():
    c = ViewingCondition.desktop().with_browser_dppx(3.0).with_image_intrinsic_dppx(1.0)
    assert c.srcset_ratio() == pytest.approx(1.0 / 3.0)


def test_simulation_accurate_oversized():
    c = ViewingCondition.desktop().with_browser_dppx(1.0).with_image_intrinsic_dppx(2.0)
    p = c.simulation_params(1000, 800, SimulationMode.ACCURATE)
    assert p.scale_factor == 2.0
    assert p.target_width == 2000 and p.target_height == 1600
    assert p.requires_downscale and not p.requires_upscale


def test_simulation_accurate_undersized():
    c = ViewingCondition.desktop().with_browser_dppx(2.0).with_image_intrinsic_dppx(1.0)
    p = c.simulation_params(1000, 800, SimulationMode.ACCURATE)
    assert p.scale_factor == 0.5
    assert p.requires_upscale


def test_simulation_downsample_only_undersized():
    """Undersized images keep their size; PPD is reduced instead.
    reference doctest at src/viewing.rs:231-238."""
    c = ViewingCondition.desktop().with_browser_dppx(2.0).with_image_intrinsic_dppx(1.0)
    p = c.simulation_params(1000, 800, SimulationMode.DOWNSAMPLE_ONLY)
    assert p.scale_factor == 1.0
    assert p.target_width == 1000
    assert p.adjusted_ppd < 40.0
    assert not p.requires_upscale and not p.requires_downscale


def test_threshold_multiplier():
    p = ViewingCondition(40.0).simulation_params(100, 100, SimulationMode.ACCURATE)
    assert p.threshold_multiplier() == pytest.approx(1.0, abs=0.01)
    p = ViewingCondition(70.0).simulation_params(100, 100, SimulationMode.ACCURATE)
    assert p.threshold_multiplier() == pytest.approx(1.75, abs=0.01)


def test_adjust_dssim_threshold():
    p = ViewingCondition(70.0).simulation_params(100, 100, SimulationMode.ACCURATE)
    assert p.adjust_dssim_threshold(0.0003) > 0.0003
    p = ViewingCondition(20.0).simulation_params(100, 100, SimulationMode.ACCURATE)
    assert p.adjust_dssim_threshold(0.0003) == pytest.approx(0.00015)


def test_adjust_ssimulacra2_threshold():
    """Nonlinear remap toward 100 (reference: src/viewing.rs:432-445)."""
    p70 = ViewingCondition(70.0).simulation_params(100, 100, SimulationMode.ACCURATE)
    adj = p70.adjust_ssimulacra2_threshold(90.0)
    assert adj < 90.0  # more lenient at higher PPD
    # 90 - (100-90)*(1 - 1/1.75) ~ 85.7
    assert adj == pytest.approx(90.0 - 10.0 * (1.0 - 1.0 / 1.75), abs=0.1)
    p20 = ViewingCondition(20.0).simulation_params(100, 100, SimulationMode.ACCURATE)
    adj = p20.adjust_ssimulacra2_threshold(90.0)
    assert 90.0 < adj <= 100.0


def test_acceptability():
    p = ViewingCondition(40.0).simulation_params(100, 100, SimulationMode.ACCURATE)
    assert p.dssim_acceptable(0.0002, 0.0003)
    assert not p.dssim_acceptable(0.0004, 0.0003)
    assert p.butteraugli_acceptable(0.9, 1.0)
    assert p.ssimulacra2_acceptable(95.0, 90.0)
    assert not p.ssimulacra2_acceptable(85.0, 90.0)


def test_presets_ordering():
    """All presets ordered most to least demanding (by effective PPD).
    reference: src/viewing.rs:573-600."""
    all_presets = presets.all()
    assert len(all_presets) == 8
    ppds = [c.effective_ppd() for c in all_presets]
    assert ppds == sorted(ppds)
    assert ppds[0] == pytest.approx(95.0 / 3.0, abs=0.5)  # 1x on phone ~32
    assert ppds[-1] == pytest.approx(95.0)


def test_preset_values():
    assert presets.native_desktop().effective_ppd() == pytest.approx(40.0)
    assert presets.native_laptop().effective_ppd() == pytest.approx(70.0)
    assert presets.native_phone().effective_ppd() == pytest.approx(95.0)
    assert presets.srcset_1x_on_laptop().effective_ppd() == pytest.approx(35.0)
    assert presets.srcset_2x_on_desktop().effective_ppd() == pytest.approx(80.0)
    assert len(presets.key()) == 3
    assert presets.baseline().effective_ppd() == pytest.approx(70.0)
    assert presets.demanding().effective_ppd() == pytest.approx(40.0)


def test_json_roundtrip():
    c = presets.srcset_2x_on_phone()
    c2 = ViewingCondition.from_json(c.to_json())
    assert c2 == c


def test_simulate_viewing_resizes():
    import numpy as np

    from codec_eval_tpu.viewing import simulate_viewing

    img = np.random.default_rng(0).integers(0, 256, (40, 60, 3)).astype(np.uint8)
    c = ViewingCondition.desktop().with_browser_dppx(1.0).with_image_intrinsic_dppx(2.0)
    p = c.simulation_params(60, 40, SimulationMode.ACCURATE)
    out = simulate_viewing(img, p)
    assert out.shape == (80, 120, 3)
    assert out.dtype == np.uint8

    # No scaling required -> unchanged object.
    p1 = ViewingCondition.desktop().simulation_params(60, 40, SimulationMode.ACCURATE)
    assert simulate_viewing(img, p1) is img


def test_simulate_viewing_downscale_antialiased():
    import numpy as np

    from codec_eval_tpu.viewing import simulate_viewing

    # 1px checkerboard downscaled 2x must average toward mid-gray, not alias.
    y, x = np.mgrid[0:64, 0:64]
    img = np.stack([(((x + y) % 2) * 255).astype(np.uint8)] * 3, -1)
    c = ViewingCondition.desktop().with_browser_dppx(2.0).with_image_intrinsic_dppx(1.0)
    # oversized simulation: ratio 2 means downscale... use intrinsic 1 browser 2 -> 0.5
    p = c.simulation_params(64, 64, SimulationMode.ACCURATE)
    out = simulate_viewing(img, p)
    assert out.shape == (32, 32, 3)
    mean = out.astype(np.float64).mean()
    assert 150 < mean < 210  # linear-light average of 0/255 checker ~ 188
