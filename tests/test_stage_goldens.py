"""Per-stage SSIMULACRA2 golden-tensor regression (SURVEY.md §7 step 1).

Every intermediate of the scoring pipeline is pinned at 1e-5; the end score
at 1e-3.  A refactor (blur implementation, layout change, fusion rewrite)
that drifts any stage by more than ~1e-4 fails here even if the end-score
golden would still pass — the tripwire the reference gets for free from its
"bit-identical" crate contract (src/metrics/ssimulacra2.rs:16-18).

Regenerate after an INTENTIONAL algorithm change with
``python tools/gen_stage_goldens.py``.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from codec_eval_tpu.kernels.color import srgb_u8_to_linear
from codec_eval_tpu.kernels.ssimulacra2 import (
    NUM_SCALES,
    features_against_reference,
    precompute_reference,
    score_from_features,
)

GOLDEN = Path(__file__).parent / "goldens" / "ssim2_stages.npz"

STAGE_ATOL = 1e-5
SCORE_ATOL = 1e-3


@pytest.fixture(scope="module")
def golden():
    assert GOLDEN.exists(), "run tools/gen_stage_goldens.py"
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def computed(golden):
    ref_u8 = jnp.asarray(golden["ref_u8"])
    dist_u8 = jnp.asarray(golden["dist_u8"])
    ref = precompute_reference(ref_u8)
    feats = features_against_reference(ref, dist_u8)
    return ref_u8, ref, feats


def test_linear_rgb_stage(golden, computed):
    ref_u8, _, _ = computed
    lin = np.asarray(srgb_u8_to_linear(ref_u8))
    np.testing.assert_allclose(lin, golden["linear_ref"], atol=STAGE_ATOL, rtol=0)


@pytest.mark.parametrize("scale", range(NUM_SCALES))
def test_xyb_and_moment_stages(golden, computed, scale):
    _, ref, _ = computed
    np.testing.assert_allclose(
        np.asarray(ref.xyb[scale]), golden[f"xyb_s{scale}"], atol=STAGE_ATOL, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(ref.mu[scale]), golden[f"mu_s{scale}"], atol=STAGE_ATOL, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(ref.sqblur[scale]),
        golden[f"sqblur_s{scale}"],
        atol=STAGE_ATOL,
        rtol=0,
    )


def test_feature_vector_stage(golden, computed):
    _, _, feats = computed
    np.testing.assert_allclose(
        np.asarray(feats), golden["features"], atol=STAGE_ATOL, rtol=0
    )


def test_final_score(golden, computed):
    _, _, feats = computed
    score = float(score_from_features(feats))
    assert score == pytest.approx(float(golden["score"]), abs=SCORE_ATOL)


# ---------------------------------------------------------------------------
# Butteraugli per-stage goldens (round 3, VERDICT r2 #1): opsin XYB, psycho
# bands, Malta AC maps, mask responses, distmap, score.  Values are O(1-100)
# so stages are pinned with a small rtol on top of the absolute floor.
# ---------------------------------------------------------------------------

BA_GOLDEN = Path(__file__).parent / "goldens" / "ba_stages.npz"


@pytest.fixture(scope="module")
def ba_golden():
    assert BA_GOLDEN.exists(), "run tools/gen_stage_goldens.py ba"
    return np.load(BA_GOLDEN)


@pytest.fixture(scope="module")
def ba_computed(ba_golden):
    import jax.numpy as jnp2

    from codec_eval_tpu.kernels import butteraugli as ba
    from codec_eval_tpu.kernels.color import srgb_u8_to_linear as to_lin

    ref_u8 = jnp2.asarray(ba_golden["ref_u8"])
    dist_u8 = jnp2.asarray(ba_golden["dist_u8"])
    it = jnp2.float32(80.0)
    lin0 = jnp2.moveaxis(to_lin(ref_u8), -1, 0)
    lin1 = jnp2.moveaxis(to_lin(dist_u8), -1, 0)
    xyb0 = ba._opsin_dynamics(lin0 * it)
    xyb1 = ba._opsin_dynamics(lin1 * it)
    pi0 = ba._separate_frequencies(xyb0)
    pi1 = ba._separate_frequencies(xyb1)
    return dict(
        xyb0=xyb0,
        xyb1=xyb1,
        pi0=pi0,
        pi1=pi1,
        dmap=ba.butteraugli_distmap(ref_u8, dist_u8),
    )


def _ba_close(actual, expected):
    np.testing.assert_allclose(
        np.asarray(actual), expected, atol=1e-4, rtol=1e-5
    )


@pytest.mark.parametrize("stage", ["xyb0", "xyb1"])
def test_ba_opsin_stage(ba_golden, ba_computed, stage):
    _ba_close(ba_computed[stage], ba_golden[stage])


@pytest.mark.parametrize("band", ["uhf", "hf", "mf", "lf"])
def test_ba_band_stages(ba_golden, ba_computed, band):
    _ba_close(getattr(ba_computed["pi0"], band), ba_golden[f"pi0_{band}"])


def test_ba_malta_stage(ba_golden, ba_computed):
    from codec_eval_tpu.kernels import butteraugli as ba

    malta_ac = ba._malta_ac_stack_xla(
        ba._malta_diffs_stack(ba_computed["pi0"], ba_computed["pi1"], 0.8)
    )
    _ba_close(malta_ac, ba_golden["malta_ac"])


def test_ba_mask_stages(ba_golden, ba_computed):
    from codec_eval_tpu.kernels import butteraugli as ba

    mask, diff_ac = ba._mask_psycho_image(ba_computed["pi0"], ba_computed["pi1"])
    _ba_close(ba._mask_y(mask), ba_golden["mask_y"])
    _ba_close(ba._mask_dc_y(mask), ba_golden["mask_dc_y"])
    _ba_close(diff_ac, ba_golden["mask_diff_ac"])


def test_ba_distmap_and_score(ba_golden, ba_computed):
    _ba_close(ba_computed["dmap"], ba_golden["distmap"])
    assert float(np.max(np.asarray(ba_computed["dmap"]))) == pytest.approx(
        float(ba_golden["score"]), abs=1e-4
    )


# ---------------------------------------------------------------------------
# DSSIM per-stage goldens: scaled-Lab planes, per-scale pyramid levels,
# per-scale SSIM means, score — pinned under the round-3 structural decision
# (kernels/dssim.py module header).
# ---------------------------------------------------------------------------

DSSIM_GOLDEN = Path(__file__).parent / "goldens" / "dssim_stages.npz"


@pytest.fixture(scope="module")
def ds_golden():
    assert DSSIM_GOLDEN.exists(), "run tools/gen_stage_goldens.py dssim"
    return np.load(DSSIM_GOLDEN)


def test_dssim_structural_decision_unchanged(ds_golden):
    """The flags must match what the goldens were generated under."""
    from codec_eval_tpu.kernels import dssim as dk

    assert int(ds_golden["blur_passes"]) == dk.DEFAULT_BLUR_PASSES
    assert str(ds_golden["downscale"]) == dk.DEFAULT_DOWNSCALE


def test_dssim_stages(ds_golden):
    import jax.numpy as jnp2

    from codec_eval_tpu.kernels import dssim as dk
    from codec_eval_tpu.kernels.color import srgb_u8_to_linear as to_lin

    lin0 = jnp2.moveaxis(to_lin(jnp2.asarray(ds_golden["ref_u8"])), -1, 0)
    lin1 = jnp2.moveaxis(to_lin(jnp2.asarray(ds_golden["dist_u8"])), -1, 0)
    lab0 = dk._linear_rgb_to_lab_planes(lin0)
    lab1 = dk._linear_rgb_to_lab_planes(lin1)
    np.testing.assert_allclose(
        np.asarray(lab0), ds_golden["lab_ref"], atol=STAGE_ATOL, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(lab1), ds_golden["lab_dist"], atol=STAGE_ATOL, rtol=0
    )

    ref = dk.precompute_dssim_reference(lin0)
    luma_means, chroma_means = [], []
    for s, (luma2, chroma2) in enumerate(dk._lab_channel_pyramids(lab1)):
        np.testing.assert_allclose(
            np.asarray(ref.planes[s][0]),
            ds_golden[f"ref_luma_s{s}"],
            atol=STAGE_ATOL,
            rtol=0,
        )
        np.testing.assert_allclose(
            np.asarray(ref.planes[s][1]),
            ds_golden[f"ref_chroma_s{s}"],
            atol=STAGE_ATOL,
            rtol=0,
        )
        luma_means.append(
            np.asarray(
                dk._ssim_means(ref.planes[s][0], ref.mu[s][0], ref.sqblur[s][0], luma2)
            )
        )
        chroma_means.append(
            np.asarray(
                dk._ssim_means(ref.planes[s][1], ref.mu[s][1], ref.sqblur[s][1], chroma2)
            )
        )
    np.testing.assert_allclose(
        np.stack(luma_means), ds_golden["luma_means"], atol=STAGE_ATOL, rtol=0
    )
    np.testing.assert_allclose(
        np.stack(chroma_means), ds_golden["chroma_means"], atol=STAGE_ATOL, rtol=0
    )


def test_dssim_score_golden(ds_golden):
    import jax.numpy as jnp2

    from codec_eval_tpu.kernels import dssim as dk
    from codec_eval_tpu.kernels.color import srgb_u8_to_linear as to_lin

    lin0 = jnp2.moveaxis(to_lin(jnp2.asarray(ds_golden["ref_u8"])), -1, 0)
    lin1 = jnp2.moveaxis(to_lin(jnp2.asarray(ds_golden["dist_u8"])), -1, 0)
    score = float(dk.dssim(lin0, lin1))
    assert score == pytest.approx(float(ds_golden["score"]), rel=1e-4)
