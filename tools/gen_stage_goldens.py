"""Generate per-stage SSIMULACRA2 golden tensors (SURVEY.md §7 step 1).

Pins every intermediate of the scoring pipeline — linear RGB, per-scale
positive XYB, per-scale reference moments (mu, blur(x*x)), the 108-feature
vector, and the final score — on a fixed synthetic pair, so that a refactor
that drifts ANY stage by more than 1e-4 fails CI (tests/test_stage_goldens.py)
rather than hiding inside a loose end-score tolerance.

Regenerate ONLY with an intentional algorithm change:
    python tools/gen_stage_goldens.py
and explain the change in the commit message.

reference contract being protected: src/metrics/ssimulacra2.rs:16-18
("bit-identical" scoring across releases).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def fixture_pair():
    """Deterministic synthetic pair; 96x80 exercises odd pyramid dims
    (96 -> 48 -> 24 -> 12 -> 6 -> 3; 80 -> 40 -> 20 -> 10 -> 5 -> 3)."""
    rng = np.random.default_rng(20260816)
    y, x = np.mgrid[0:96, 0:80]
    base = 128 + 55 * np.sin(x / 9.0) + 40 * np.cos(y / 13.0)
    ref = np.clip(
        np.stack([base, base * 0.92 + 8, base * 0.78 + 24], -1)
        + rng.normal(0, 6, (96, 80, 3)),
        0,
        255,
    ).astype(np.uint8)
    dist = np.clip(
        ref.astype(np.int16) + rng.integers(-9, 10, ref.shape), 0, 255
    ).astype(np.uint8)
    return ref, dist


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from codec_eval_tpu.kernels.color import srgb_u8_to_linear
    from codec_eval_tpu.kernels.ssimulacra2 import (
        features_against_reference,
        precompute_reference,
        score_from_features,
    )

    ref_u8, dist_u8 = fixture_pair()
    ref = precompute_reference(jnp.asarray(ref_u8))
    feats = features_against_reference(ref, jnp.asarray(dist_u8))
    score = score_from_features(feats)

    out = {
        "ref_u8": ref_u8,
        "dist_u8": dist_u8,
        "linear_ref": np.asarray(srgb_u8_to_linear(jnp.asarray(ref_u8))),
        "features": np.asarray(feats),
        "score": np.asarray(score),
    }
    for s in range(len(ref.xyb)):
        out[f"xyb_s{s}"] = np.asarray(ref.xyb[s])
        out[f"mu_s{s}"] = np.asarray(ref.mu[s])
        out[f"sqblur_s{s}"] = np.asarray(ref.sqblur[s])

    path = REPO / "tests" / "goldens" / "ssim2_stages.npz"
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {path} (score={float(score):.6f}, {len(out)} arrays)")


if __name__ == "__main__":
    main()
