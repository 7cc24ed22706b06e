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
