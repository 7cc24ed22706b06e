"""Masked mixed-size scoring must reproduce exact-shape scores.

The claim in kernels/masked.py is that zero padding + masked XYB planes +
odd-dim downscale correction is EXACT (to float round-off) relative to
running the kernel at the image's true shape.  These tests check that claim
at awkward sizes (odd dims, far-from-bucket dims) and that one compiled
program really does serve many sizes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codec_eval_tpu.kernels.masked import (
    bucket_shapes,
    butteraugli_masked,
    dssim_masked,
    pad_to_bucket,
    psnr_masked,
    score_mixed_sizes,
    ssimulacra2_masked,
)
from codec_eval_tpu.kernels.butteraugli import butteraugli
from codec_eval_tpu.kernels.dssim import dssim_u8
from codec_eval_tpu.kernels.psnr import psnr
from codec_eval_tpu.kernels.ssimulacra2 import ssimulacra2


def _pair(h, w, seed=0, amp=10):
    r = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = 120 + 70 * np.sin(x / 11.0) + 50 * np.cos(y / 7.0)
    ref = np.clip(
        np.stack([base, base * 0.85, base * 0.7], -1) + r.normal(0, 8, (h, w, 3)),
        0,
        255,
    ).astype(np.uint8)
    dist = np.clip(
        ref.astype(np.int16) + r.integers(-amp, amp + 1, ref.shape), 0, 255
    ).astype(np.uint8)
    return ref, dist


@pytest.mark.parametrize("h,w", [(96, 128), (97, 111), (130, 190), (64, 64)])
def test_masked_matches_exact_shape(h, w):
    ref, dist = _pair(h, w, seed=h * 1000 + w)
    exact = float(jax.jit(ssimulacra2)(jnp.asarray(ref), jnp.asarray(dist)))
    hp, wp = bucket_shapes([(h, w)], granularity=128)[0]
    masked = float(
        jax.jit(ssimulacra2_masked)(
            jnp.asarray(pad_to_bucket(ref, hp, wp)),
            jnp.asarray(pad_to_bucket(dist, hp, wp)),
            h,
            w,
        )
    )
    assert masked == pytest.approx(exact, abs=5e-3), (exact, masked)


def test_one_program_serves_many_sizes():
    """Different valid dims inside one bucket shape must not retrigger
    tracing/compilation: the valid dims are traced operands."""
    traces = []

    @jax.jit
    def fn(r, d, h, w):
        traces.append(1)
        return ssimulacra2_masked(r, d, h, w)

    sizes = [(100, 120), (128, 128), (77, 99)]
    scores = []
    for h, w in sizes:
        ref, dist = _pair(h, w, seed=h + w)
        scores.append(
            float(
                fn(
                    jnp.asarray(pad_to_bucket(ref, 128, 128)),
                    jnp.asarray(pad_to_bucket(dist, 128, 128)),
                    h,
                    w,
                )
            )
        )
    assert len(traces) == 1
    assert all(0 < s < 100 for s in scores)


def test_identical_padded_pair_scores_100():
    ref, _ = _pair(90, 90, seed=3)
    p = jnp.asarray(pad_to_bucket(ref, 128, 128))
    assert float(ssimulacra2_masked(p, p, 90, 90)) == 100.0


def test_dssim_masked_matches_exact():
    ref, dist = _pair(130, 190, seed=21)
    exact = float(jax.jit(dssim_u8)(jnp.asarray(ref), jnp.asarray(dist)))
    masked = float(
        jax.jit(dssim_masked)(
            jnp.asarray(pad_to_bucket(ref, 256, 256)),
            jnp.asarray(pad_to_bucket(dist, 256, 256)),
            130,
            190,
        )
    )
    assert masked == pytest.approx(exact, rel=1e-3), (exact, masked)
    p = jnp.asarray(pad_to_bucket(ref, 256, 256))
    assert float(dssim_masked(p, p, 130, 190)) == 0.0


def test_butteraugli_masked_matches_exact():
    ref, dist = _pair(97, 131, seed=22)
    exact = float(jax.jit(butteraugli)(jnp.asarray(ref), jnp.asarray(dist)))
    masked = float(
        jax.jit(butteraugli_masked)(
            jnp.asarray(pad_to_bucket(ref, 128, 160)),
            jnp.asarray(pad_to_bucket(dist, 128, 160)),
            97,
            131,
        )
    )
    # Max-norm: the maximizing valid pixel is identical, so this is typically
    # bit-equal; allow float round-off.
    assert masked == pytest.approx(exact, rel=1e-4), (exact, masked)
    p = jnp.asarray(pad_to_bucket(ref, 128, 160))
    assert float(butteraugli_masked(p, p, 97, 131)) == 0.0


def test_psnr_masked_matches_exact():
    ref, dist = _pair(97, 130, seed=9)
    exact = float(psnr(jnp.asarray(ref), jnp.asarray(dist)))
    masked = float(
        psnr_masked(
            jnp.asarray(pad_to_bucket(ref, 128, 256)),
            jnp.asarray(pad_to_bucket(dist, 128, 256)),
            97,
            130,
        )
    )
    assert masked == pytest.approx(exact, abs=1e-3)


def test_score_mixed_sizes_end_to_end():
    pairs = [_pair(h, w, seed=i) for i, (h, w) in
             enumerate([(96, 128), (97, 111), (200, 150), (64, 64), (128, 128)])]
    got = score_mixed_sizes(pairs, granularity=128, batch=2)
    want = np.array(
        [float(ssimulacra2(jnp.asarray(r), jnp.asarray(d))) for r, d in pairs]
    )
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_score_mixed_sizes_all_four_metrics():
    from codec_eval_tpu.kernels.masked import score_mixed_sizes_all

    pairs = [_pair(h, w, seed=40 + i) for i, (h, w) in
             enumerate([(97, 111), (128, 128)])]
    got = score_mixed_sizes_all(pairs, granularity=128, batch=2)
    assert set(got) == {"ssimulacra2", "dssim", "butteraugli", "psnr"}
    for i, (r, d) in enumerate(pairs):
        assert got["ssimulacra2"][i] == pytest.approx(
            float(ssimulacra2(jnp.asarray(r), jnp.asarray(d))), abs=5e-3
        )
        assert got["dssim"][i] == pytest.approx(
            float(dssim_u8(jnp.asarray(r), jnp.asarray(d))), rel=1e-3
        )
        assert got["butteraugli"][i] == pytest.approx(
            float(butteraugli(jnp.asarray(r), jnp.asarray(d))), rel=1e-3
        )
        assert got["psnr"][i] == pytest.approx(
            float(psnr(jnp.asarray(r), jnp.asarray(d))), abs=1e-3
        )


def test_bucket_shapes_rounding():
    assert bucket_shapes([(97, 111), (128, 128), (129, 1)], granularity=128) == [
        (128, 128),
        (128, 128),
        (256, 128),
    ]
    with pytest.raises(ValueError):
        bucket_shapes([(10, 10)], granularity=100)


def test_pad_to_bucket_rejects_oversize():
    with pytest.raises(ValueError):
        pad_to_bucket(np.zeros((200, 10, 3), np.uint8), 128, 128)
