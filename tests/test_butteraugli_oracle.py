"""Oracle-backed Butteraugli fidelity lock (VERDICT r2 #1).

The committed fixture ``goldens/butteraugli_oracle.npz`` holds 24 diverse
(reference, distorted) u8 pairs — 8 synthetic bases x jpeg/webp/noise/blur/
banding/sharpen/rescale/color-cast families — together with the system
libjxl butteraugli oracle's scores, captured at generation time by
``tools/gen_butteraugli_goldens.py``.

This test scores every pair with the TPU kernel and asserts the relative
error DISTRIBUTION against the stored oracle values, so the round-2 parity
achievement (median 0.006% / max ~1% on this fixture) cannot silently
regress: no libjxl is needed at test time, and no human has to remember to
re-run tools/butteraugli_parity.py after a refactor.

Mirrors the guarantee the reference inherits from its bit-identical crate
contract (reference: src/metrics/ssimulacra2.rs:16-18) and its
pinned-number test style (reference: src/stats/rd_knee.rs:1256-1279).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codec_eval_tpu.kernels.butteraugli import butteraugli
from codec_eval_tpu.utils import jxl_golden

FIXTURE = Path(__file__).parent / "goldens" / "butteraugli_oracle.npz"

# CI gates (measured at generation: median 0.006% / p90 0.60% / max 1.00%).
MEDIAN_MAX = 0.005  # 0.5%
P90_MAX = 0.02  # 2%
WORST_MAX = 0.08  # 8%


@pytest.fixture(scope="module")
def fixture():
    assert FIXTURE.exists(), "run tools/gen_butteraugli_goldens.py"
    return np.load(FIXTURE)


def _kernel_scores(fixture) -> np.ndarray:
    bases = fixture["bases"]
    ridx = fixture["ref_index"]
    dists = fixture["dists"]
    fn = jax.jit(butteraugli)
    return np.array(
        [
            float(fn(jnp.asarray(bases[ridx[i]]), jnp.asarray(dists[i])))
            for i in range(len(ridx))
        ]
    )


def test_kernel_matches_committed_oracle(fixture):
    gold = fixture["gold"]
    ours = _kernel_scores(fixture)
    rel = np.abs(ours - gold) / np.maximum(gold, 1e-9)
    worst = fixture["names"][int(np.argmax(rel))]
    msg = (
        f"median {100 * np.median(rel):.3f}% p90 {100 * np.quantile(rel, 0.9):.3f}% "
        f"max {100 * rel.max():.3f}% (worst: {worst})"
    )
    assert np.median(rel) <= MEDIAN_MAX, msg
    assert np.quantile(rel, 0.9) <= P90_MAX, msg
    assert rel.max() <= WORST_MAX, msg


@pytest.mark.skipif(not jxl_golden.is_available(), reason="libjxl unavailable")
def test_committed_oracle_matches_live_oracle(fixture):
    """The stored gold scores ARE what the system libjxl says (guards the
    fixture itself against accidental edits / stale regeneration)."""
    bases = fixture["bases"]
    ridx = fixture["ref_index"]
    dists = fixture["dists"]
    gold = fixture["gold"]
    for i in range(0, len(gold), 5):  # spot-check a fifth of the pairs
        live = jxl_golden.butteraugli_golden(bases[ridx[i]], dists[i])
        assert live == pytest.approx(gold[i], rel=1e-6), fixture["names"][i]
