"""Calibrate the TPU Butteraugli kernel against the canonical libjxl
implementation by gradient descent.

The TPU kernel (codec_eval_tpu/kernels/butteraugli.py) reproduces the public
butteraugli *structure*; its free constants (band weights, masking, opsin
bias) are fitted here so the max-norm score numerically tracks the canonical
C++ scorer.  The whole metric pipeline is differentiable in JAX, so the fit
is simply adam on a log-score L2 loss over a diverse distortion corpus —
a TPU-native alternative to hand-transcribing ~2000 lines of scalar C++.

Writes codec_eval_tpu/kernels/butteraugli_calibrated.py and prints fit
quality (Pearson r on log scores, median relative error) on a held-out set.

Usage: python tools/calibrate_butteraugli.py [--steps 600] [--size 192]
"""

from __future__ import annotations

import argparse
import io
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def make_base_images(size: int):
    """Diverse synthetic bases: smooth, textured, edged, colorful, dark."""
    h = w = size
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    rng = np.random.default_rng(42)
    images = []

    # 1. smooth gradient + soft blobs (sky-like)
    base = 140 + 60 * (x / w) + 30 * np.sin(y / 37.0)
    img = np.stack([base * 0.8 + 40, base * 0.9 + 20, base], -1)
    images.append(img)

    # 2. fine texture (grass/fabric)
    tex = 110 + 35 * np.sin(x / 2.3) * np.cos(y / 3.1) + rng.normal(0, 18, (h, w))
    img = np.stack([tex * 0.7 + 20, tex, tex * 0.5 + 15], -1)
    images.append(img)

    # 3. strong edges (architecture/text-like)
    edges = 60 + 160 * ((np.floor(x / 17) + np.floor(y / 23)) % 2)
    edges = edges + 20 * np.sin(x / 5.0)
    img = np.stack([edges, edges * 0.95, edges * 0.9], -1)
    images.append(img)

    # 4. saturated color patches
    px = (np.floor(x / 31) * 53 + np.floor(y / 29) * 97) % 255
    img = np.stack([px, (px * 3) % 255, (px * 7) % 255], -1)
    images.append(img)

    # 5. dark low-contrast scene
    dark = 28 + 20 * np.sin(x / 19.0) + 12 * np.cos(y / 11.0) + rng.normal(0, 4, (h, w))
    img = np.stack([dark, dark * 1.1 + 4, dark * 1.3 + 8], -1)
    images.append(img)

    # 6. photo-like mix
    mix = (
        120
        + 68 * np.sin(x / 13.0)
        + 52 * np.cos(y / 9.0)
        + 24 * np.sin((x + y) / 31.0)
        + rng.normal(0, 7, (h, w))
    )
    img = np.stack([mix, mix * 0.88 + 12, mix * 0.74 + 26], -1)
    images.append(img)

    # 7. smooth portrait-like blobs (skin tones, slow gradients)
    cx, cy = w * 0.55, h * 0.45
    rr = np.sqrt((x - cx) ** 2 + (y - cy) ** 2)
    skin = 190 - 0.35 * rr + 6 * np.sin(rr / 9.0)
    img = np.stack([skin, skin * 0.8 + 8, skin * 0.66 + 10], -1)
    images.append(img)

    # 8. text-like strokes on light background
    text = np.full((h, w), 235.0)
    stroke = ((np.sin(x / 2.1) > 0.4) & (np.sin(y / 5.3) > -0.2)) & (
        ((x // 24) + (y // 16)) % 3 != 0
    )
    text[stroke] = 25.0
    img = np.stack([text, text, text], -1)
    images.append(img)

    return [np.clip(i, 0, 255).astype(np.uint8) for i in images]


def make_distortions(img: np.ndarray, rng: np.random.Generator):
    """JPEG / WebP sweeps, noise, blur — the artifact families that matter."""
    from PIL import Image, ImageFilter

    out = []

    def jpeg(q):
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=q)
        return np.array(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))

    def webp(q):
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "WEBP", quality=q)
        return np.array(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))

    for q in (25, 40, 55, 70, 85, 95):
        out.append((f"jpeg{q}", jpeg(q)))
    for q in (30, 60, 90):
        out.append((f"webp{q}", webp(q)))
    for sigma in (1.5, 4.0, 9.0):
        noisy = np.clip(
            img.astype(np.float64) + rng.normal(0, sigma, img.shape), 0, 255
        ).astype(np.uint8)
        out.append((f"noise{sigma}", noisy))
    for radius in (0.6, 1.5):
        blurred = np.array(
            Image.fromarray(img).filter(ImageFilter.GaussianBlur(radius))
        )
        out.append((f"blur{radius}", blurred))
    # Banding: coarse quantization of smooth regions (posterization).
    for levels in (16, 32):
        q = 255 // (levels - 1)
        banded = (np.round(img.astype(np.int32) / q) * q).clip(0, 255)
        out.append((f"band{levels}", banded.astype(np.uint8)))
    # Ringing-like oversharpening.
    sharp = np.array(
        Image.fromarray(img).filter(
            ImageFilter.UnsharpMask(radius=2, percent=220, threshold=0)
        )
    )
    out.append(("sharpen", sharp))
    # Resampling softness: downscale-upscale round trip.
    h2, w2 = img.shape[0], img.shape[1]
    small = Image.fromarray(img).resize((w2 // 2, h2 // 2), Image.BILINEAR)
    out.append(("rescale", np.array(small.resize((w2, h2), Image.BILINEAR))))
    # Chroma-only error (color cast), luma preserved.
    cast = img.astype(np.int16).copy()
    cast[..., 0] += 6
    cast[..., 2] -= 6
    out.append(("cast", np.clip(cast, 0, 255).astype(np.uint8)))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--size", type=int, default=192)
    ap.add_argument("--lr", type=float, default=0.03)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from codec_eval_tpu.kernels.butteraugli import (
        ButteraugliParams,
        butteraugli_distmap,
    )
    from codec_eval_tpu.utils import jxl_golden

    assert jxl_golden.is_available(), "libjxl golden oracle unavailable"

    rng = np.random.default_rng(7)
    bases = make_base_images(args.size)
    pairs, golds, tags = [], [], []
    for bi, base in enumerate(bases):
        for tag, dist in make_distortions(base, rng):
            if np.array_equal(base, dist):
                continue
            gold = jxl_golden.butteraugli_golden(base, dist)
            if not np.isfinite(gold) or gold <= 0:
                continue
            pairs.append((base, dist))
            golds.append(gold)
            tags.append(f"img{bi}-{tag}")

    n = len(pairs)
    print(
        f"calibration corpus: {n} pairs, gold range "
        f"[{min(golds):.3f}, {max(golds):.3f}]",
        flush=True,
    )

    refs = jnp.asarray(np.stack([p[0] for p in pairs]))
    dists = jnp.asarray(np.stack([p[1] for p in pairs]))
    gold = jnp.asarray(np.array(golds), dtype=jnp.float32)

    # Held-out split: every 5th pair.
    idx = np.arange(n)
    val_mask = np.zeros(n, bool)
    val_mask[::5] = True
    train_ids = idx[~val_mask]
    val_idx = jnp.asarray(idx[val_mask])

    # Optimize in log-parameter space to keep weights positive.
    init = ButteraugliParams.default()
    log_params = jax.tree.map(lambda v: jnp.log(jnp.asarray(v, jnp.float32)), init)

    def predict(lp, ref, dist):
        p = jax.tree.map(jnp.exp, lp)
        dmap = butteraugli_distmap(ref, dist, params=ButteraugliParams(*p))
        return jnp.max(dmap)

    # Minibatch SGD: the compiled step is vmapped over a small fixed batch,
    # keeping the XLA program compact (a full-corpus batch compiles for
    # minutes through the remote-compile tunnel).
    BATCH = 8

    def loss_fn(lp, sel):
        preds = jax.vmap(lambda r, d: predict(lp, r, d))(refs[sel], dists[sel])
        g = gold[sel]
        preds = jnp.clip(preds, 1e-4, 1e4)  # keep the log finite if a
        # parameter excursion blows a prediction up mid-optimization
        sq = (jnp.log(preds + 0.25) - jnp.log(g + 0.25)) ** 2
        # Tail-aware: the mean alone lets a few distortion families sit far
        # off (p90 rel err); upweighting the batch's worst residual pulls
        # the tail in without destabilizing the bulk fit.
        return jnp.mean(sq) + 0.5 * jnp.max(sq)

    import optax

    # Clipped adam in log-param space: the Malta/masking terms can produce
    # spiky gradients; unclipped runs diverge to NaN.
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(args.lr))
    state = opt.init(log_params)

    @jax.jit
    def step(lp, st, sel):
        l, grads = jax.value_and_grad(loss_fn)(lp, sel)
        updates, st = opt.update(grads, st)
        lp = optax.apply_updates(lp, updates)
        return lp, st, l

    eval_loss = jax.jit(loss_fn)

    predict_batch = jax.jit(
        lambda lp, r, d: jax.vmap(lambda rr, dd: predict(lp, rr, dd))(r, d)
    )

    def heldout_stats(lp):
        val_np = np.asarray(val_idx)
        chunks = []
        for s in range(0, len(val_np), BATCH):
            sel = val_np[s : s + BATCH]
            padded = np.concatenate([sel, np.repeat(sel[-1:], BATCH - len(sel))])
            out = np.asarray(predict_batch(lp, refs[padded], dists[padded]))
            chunks.append(out[: len(sel)])
        preds = np.concatenate(chunks)
        gv = np.asarray(gold[val_idx])
        r = np.corrcoef(np.log(preds + 0.25), np.log(gv + 0.25))[0, 1]
        rel = np.abs(preds - gv) / gv
        return preds, r, float(np.median(rel)), float(np.percentile(rel, 90))

    # Baseline: the currently shipped calibration on this (possibly newer)
    # corpus, so a refit can be accepted/rejected on the same held-out set.
    try:
        from codec_eval_tpu.kernels.butteraugli import _calibrated

        cur = _calibrated()
        if cur is not None:
            cur_lp = jax.tree.map(
                lambda v: jnp.log(jnp.asarray(v, jnp.float32)), cur
            )
            _, r0, med0, p90_0 = heldout_stats(cur_lp)
            print(
                f"current calibration held-out: pearson(log)={r0:.4f}, "
                f"median rel err={med0:.3f}, p90={p90_0:.3f}",
                flush=True,
            )
    except Exception as e:  # pragma: no cover - diagnostic only
        print(f"(no current-calibration baseline: {e})")

    prng = np.random.default_rng(0)
    for i in range(args.steps):
        sel = jnp.asarray(prng.choice(train_ids, size=BATCH, replace=False))
        log_params, state, l = step(log_params, state, sel)
        if i % 50 == 0 or i == args.steps - 1:
            vl = eval_loss(log_params, val_idx[:BATCH * 2][: BATCH])
            print(
                f"step {i:4d}  train_loss {float(l):.4f}  "
                f"val_loss(batch) {float(vl):.4f}",
                flush=True,
            )

    final = jax.tree.map(lambda v: np.asarray(jnp.exp(v)), log_params)
    fp = ButteraugliParams(*[jnp.asarray(v) for v in final])

    # Fit quality on held-out set (chunked so the compiled program stays
    # the training-batch size).
    preds, r, med, p90 = heldout_stats(log_params)
    gv = np.asarray(gold[val_idx])
    rel = np.abs(preds - gv) / gv
    print(f"held-out: pearson(log) = {r:.4f}, median rel err = {med:.3f}, "
          f"p90 rel err = {p90:.3f}")

    out_path = REPO / "codec_eval_tpu" / "kernels" / "butteraugli_calibrated.py"
    with open(out_path, "w") as f:
        f.write(
            '"""Calibrated Butteraugli constants — GENERATED by '
            "tools/calibrate_butteraugli.py\n\n"
            f"Fitted against libjxl butteraugli on {n} synthetic distortion "
            f"pairs at {args.size}px.\n"
            f"Held-out fit: pearson(log)={r:.4f}, median rel err="
            f"{np.median(rel):.3f}, p90={np.percentile(rel, 90):.3f}.\n"
            '"""\n\n'
        )
        f.write(f"W_UHF = {final.w_uhf.tolist()!r}\n")
        f.write(f"W_HF = {final.w_hf.tolist()!r}\n")
        f.write(f"W_MF = {final.w_mf.tolist()!r}\n")
        f.write(f"W_LF = {final.w_lf.tolist()!r}\n")
        f.write(f"W_MALTA = {final.w_malta.tolist()!r}\n")
        f.write(f"MASK_STRENGTH = {float(final.mask_strength)!r}\n")
        f.write(f"MASK_OFFSET = {float(final.mask_offset)!r}\n")
        f.write(f"MASK_POWER = {float(final.mask_power)!r}\n")
        f.write(f"OUT_SCALE = {float(final.out_scale)!r}\n")
        f.write(f"OPSIN_BIAS = {float(final.opsin_bias)!r}\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
