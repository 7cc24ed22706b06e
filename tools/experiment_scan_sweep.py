"""Scan-based single-dispatch sweep scorer vs split pre+chunk pipeline.

The dense per-image sweep (4 codecs x 25 qualities = 100 candidates) costs
5 dispatches/image in the split pipeline (1 pre + 4 chunk-25) at ~4 ms
fixed each.  `_build_sweep_scorer` folds precompute + a lax.scan over
chunk slices into ONE program: dispatch cost paid once, chunk-25 HBM
working set kept (the flat batch-100 alternative measured slower —
tools/experiment_chunk100.py).

Measures 4 distinct images x 100 candidates, all inputs pre-staged,
3 rounds with one final scalar fetch, best-of-3; same instrument as
experiment_chunk100.py so numbers are comparable.

Run: ``python tools/experiment_scan_sweep.py``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from bench import _photo
    from codec_eval_tpu.engine.scoring import (
        _build_chunk_scorer,
        _build_precompute,
        _build_sweep_scorer,
    )

    size = 512
    n_img, n_cand = 4, 100
    refs = [_photo(size, size, 100 + i) for i in range(n_img)]
    rng = np.random.default_rng(31)
    refs_dev = [jax.block_until_ready(jnp.asarray(r)) for r in refs]

    def cands(ref, n):
        return np.clip(
            ref.astype(np.int16) + rng.integers(-8, 9, (n,) + ref.shape),
            0, 255,
        ).astype(np.uint8)

    full = [
        jax.block_until_ready(jnp.asarray(cands(refs[i], n_cand)))
        for i in range(n_img)
    ]

    # --- scan sweep: one dispatch per image, scan chunk in {25, 50} ------
    for chunk in (25, 50):
        scorer = _build_sweep_scorer(
            size, size, n_cand, chunk, True, True, True, True, False
        )
        out = scorer(refs_dev[0], full[0])
        np.asarray(out["ssimulacra2"])[:1]  # compile + complete

        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(n_img):
                out = scorer(refs_dev[i], full[i])
            np.asarray(out["ssimulacra2"])[:1]
            best = min(best, time.perf_counter() - t0)
        print(
            f"scan sweep chunk {chunk:3d}: {best * 1e3:8.2f} ms / {n_img} img"
            f" => {n_img * n_cand / best:8.1f} pairs/s sustained",
            flush=True,
        )

    # --- split pre + chunk dispatches (current pipeline) -----------------
    for chunk in (25, 50):
        pre_fn = _build_precompute(size, size, True, True, True, False)
        sc = _build_chunk_scorer(size, size, chunk, True, True, True, True)
        per_img = n_cand // chunk
        devs = [
            [
                jax.block_until_ready(
                    jnp.asarray(
                        np.asarray(full[i][c * chunk : (c + 1) * chunk])
                    )
                )
                for c in range(per_img)
            ]
            for i in range(n_img)
        ]
        out = sc(pre_fn(refs_dev[0]), devs[0][0])
        np.asarray(out["ssimulacra2"])[:1]

        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(n_img):
                pre = pre_fn(refs_dev[i])
                for c in range(per_img):
                    out = sc(pre, devs[i][c])
            np.asarray(out["ssimulacra2"])[:1]
            best = min(best, time.perf_counter() - t0)
        print(
            f"split pre+chunk {chunk:3d}: {best * 1e3:8.2f} ms / {n_img} img"
            f" => {n_img * n_cand / best:8.1f} pairs/s sustained",
            flush=True,
        )

    # Parity: scan output == split output on image 0.
    scorer = _build_sweep_scorer(
        size, size, n_cand, 25, True, True, True, True, False
    )
    sc = _build_chunk_scorer(size, size, 25, True, True, True, True)
    pre_fn = _build_precompute(size, size, True, True, True, False)
    a = np.asarray(scorer(refs_dev[0], full[0])["ssimulacra2"])
    pre = pre_fn(refs_dev[0])
    b = np.concatenate(
        [
            np.asarray(
                sc(pre, full[0][c * 25 : (c + 1) * 25])["ssimulacra2"]
            )
            for c in range(4)
        ]
    )
    rel = float(np.max(np.abs(a - b)))
    print(f"parity scan vs split (ssim2 scores): max abs {rel:.3e}")


if __name__ == "__main__":
    main()
