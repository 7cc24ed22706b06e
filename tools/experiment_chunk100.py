"""Per-image single-dispatch scoring: fused pre+score at chunk 100 vs the
split pre/chunk-50 pipeline bench.py uses.

The sweep grid is 4 codecs x 25 qualities = 100 candidates per image.  The
current bench scores it as one precompute dispatch + two chunk-50
dispatches (3 dispatches/image).  A fused chunk-100 program is 1
dispatch/image — this measures whether the dispatch amortization beats the
HBM-pressure penalty observed earlier at batch 100.

Slope method over distinct pre-staged inputs; all-metric at 512px.

Run: ``python tools/experiment_chunk100.py``.
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
        _build_scorer,
    )

    size = 512
    n_img = 4
    refs = [_photo(size, size, 100 + i) for i in range(n_img)]
    rng = np.random.default_rng(31)
    refs_dev = [jax.block_until_ready(jnp.asarray(r)) for r in refs]

    def cands(ref, n):
        return np.clip(
            ref.astype(np.int16) + rng.integers(-8, 9, (n,) + ref.shape),
            0, 255,
        ).astype(np.uint8)

    # --- A: fused single dispatch, chunk 100 -----------------------------
    for chunk in (100, 50):
        scorer = _build_scorer(size, size, chunk, True, True, True, True, False)
        per_img = 100 // chunk
        devs = [
            [
                jax.block_until_ready(jnp.asarray(cands(refs[i], chunk)))
                for _ in range(per_img)
            ]
            for i in range(n_img)
        ]
        out = scorer(refs_dev[0], devs[0][0])
        np.asarray(out["ssimulacra2"])[:1]  # compile+complete

        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(n_img):
                for c in range(per_img):
                    out = scorer(refs_dev[i], devs[i][c])
            np.asarray(out["ssimulacra2"])[:1]
            dt = time.perf_counter() - t0
            best = min(best, dt)
        pps = n_img * 100 / best
        print(
            f"fused chunk {chunk:3d}: {best * 1e3:8.2f} ms / {n_img} img "
            f"=> {pps:8.1f} pairs/s sustained"
        )

    # --- B: split pre + chunk-50 (bench.py's current shape) --------------
    for chunk in (100, 50):
        pre_fn = _build_precompute(size, size, True, True, True, False)
        sc = _build_chunk_scorer(size, size, chunk, True, True, True, True)
        per_img = 100 // chunk
        devs = [
            [
                jax.block_until_ready(jnp.asarray(cands(refs[i], chunk)))
                for _ in range(per_img)
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
            dt = time.perf_counter() - t0
            best = min(best, dt)
        pps = n_img * 100 / best
        print(
            f"split pre+chunk {chunk:3d}: {best * 1e3:8.2f} ms / {n_img} img "
            f"=> {pps:8.1f} pairs/s sustained"
        )


if __name__ == "__main__":
    main()
