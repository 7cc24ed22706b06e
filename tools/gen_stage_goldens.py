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


def gen_ssim2() -> None:
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


def gen_butteraugli() -> None:
    """Pin the butteraugli pipeline's intermediates (VERDICT r2 #1): opsin
    XYB, the four psycho bands, Malta AC maps, mask response maps, distmap,
    and score — so a refactor that drifts any stage fails pytest instead of
    relying on a human re-running tools/butteraugli_parity.py."""
    import jax.numpy as jnp

    from codec_eval_tpu.kernels import butteraugli as ba
    from codec_eval_tpu.kernels.color import srgb_u8_to_linear

    ref_u8, dist_u8 = fixture_pair()
    it = jnp.float32(80.0)
    lin0 = jnp.moveaxis(srgb_u8_to_linear(jnp.asarray(ref_u8)), -1, 0)
    lin1 = jnp.moveaxis(srgb_u8_to_linear(jnp.asarray(dist_u8)), -1, 0)
    xyb0 = ba._opsin_dynamics(lin0 * it)
    xyb1 = ba._opsin_dynamics(lin1 * it)
    pi0 = ba._separate_frequencies(xyb0)
    pi1 = ba._separate_frequencies(xyb1)
    malta_ac = ba._malta_ac_stack_xla(ba._malta_diffs_stack(pi0, pi1, 0.8))
    mask, mask_diff_ac = ba._mask_psycho_image(pi0, pi1)
    dmap = ba.butteraugli_distmap(jnp.asarray(ref_u8), jnp.asarray(dist_u8))

    out = {
        "ref_u8": ref_u8,
        "dist_u8": dist_u8,
        "xyb0": np.asarray(xyb0),
        "xyb1": np.asarray(xyb1),
        "malta_ac": np.asarray(malta_ac),
        "mask_y": np.asarray(ba._mask_y(mask)),
        "mask_dc_y": np.asarray(ba._mask_dc_y(mask)),
        "mask_diff_ac": np.asarray(mask_diff_ac),
        "distmap": np.asarray(dmap),
        "score": np.asarray(jnp.max(dmap)),
    }
    for band in ("uhf", "hf", "mf", "lf"):
        out[f"pi0_{band}"] = np.asarray(getattr(pi0, band))

    path = REPO / "tests" / "goldens" / "ba_stages.npz"
    np.savez_compressed(path, **out)
    print(f"wrote {path} (score={float(out['score']):.6f}, {len(out)} arrays)")


def gen_dssim() -> None:
    """Pin the DSSIM pipeline's intermediates: scaled-Lab planes, per-scale
    (luma, chroma) pyramid levels, per-scale SSIM means, and the score —
    under the round-3 structural decision (module header of kernels/dssim.py)."""
    import jax.numpy as jnp

    from codec_eval_tpu.kernels import dssim as dk
    from codec_eval_tpu.kernels.color import srgb_u8_to_linear

    ref_u8, dist_u8 = fixture_pair()
    lin0 = jnp.moveaxis(srgb_u8_to_linear(jnp.asarray(ref_u8)), -1, 0)
    lin1 = jnp.moveaxis(srgb_u8_to_linear(jnp.asarray(dist_u8)), -1, 0)
    lab0 = dk._linear_rgb_to_lab_planes(lin0)
    ref = dk.precompute_dssim_reference(lin0)

    lab1 = dk._linear_rgb_to_lab_planes(lin1)
    out = {
        "ref_u8": ref_u8,
        "dist_u8": dist_u8,
        "lab_ref": np.asarray(lab0),
        "lab_dist": np.asarray(lab1),
        "score": np.asarray(dk.dssim(lin0, lin1)),
        "blur_passes": np.asarray(dk.DEFAULT_BLUR_PASSES),
        "downscale": np.asarray(dk.DEFAULT_DOWNSCALE),
    }
    luma_means, chroma_means = [], []
    for s, (luma2, chroma2) in enumerate(dk._lab_channel_pyramids(lab1)):
        out[f"ref_luma_s{s}"] = np.asarray(ref.planes[s][0])
        out[f"ref_chroma_s{s}"] = np.asarray(ref.planes[s][1])
        luma_means.append(
            np.asarray(dk._ssim_means(ref.planes[s][0], ref.mu[s][0],
                                      ref.sqblur[s][0], luma2))
        )
        chroma_means.append(
            np.asarray(dk._ssim_means(ref.planes[s][1], ref.mu[s][1],
                                      ref.sqblur[s][1], chroma2))
        )
    out["luma_means"] = np.stack(luma_means)
    out["chroma_means"] = np.stack(chroma_means)

    path = REPO / "tests" / "goldens" / "dssim_stages.npz"
    np.savez_compressed(path, **out)
    print(f"wrote {path} (score={float(out['score']):.6f}, {len(out)} arrays)")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "ssim2"):
        gen_ssim2()
    if which in ("all", "ba"):
        gen_butteraugli()
    if which in ("all", "dssim"):
        gen_dssim()


if __name__ == "__main__":
    main()
