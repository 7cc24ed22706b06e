"""Sweep the Malta kernel row-tile size at the BA-only scorer level.

Spawns a fresh interpreter per tile (the kernel reads
CODEC_EVAL_MALTA_TILE at trace time) and reports the chunk-slope rate of
the butteraugli-only chunk scorer at 512px/50 candidates — the same
instrument as tools/experiment_chunk_size.py, which has been repeatable
on this backend.

Run: ``python tools/experiment_malta_tile.py``          (all tiles)
     ``python tools/experiment_malta_tile.py <tile>``   (one tile, child)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def child(tile: int) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from bench import _photo
    from codec_eval_tpu.engine.scoring import (
        _build_chunk_scorer,
        _build_precompute,
    )

    size, chunk = 512, 50
    ref = _photo(size, size, 1)
    rng = np.random.default_rng(31)
    kmax = 8
    batches = [
        np.clip(
            ref.astype(np.int16) + rng.integers(-8, 9, (chunk,) + ref.shape),
            0, 255,
        ).astype(np.uint8)
        for _ in range(kmax)
    ]
    pre_fn = _build_precompute(size, size, False, False, True, False)
    scorer = _build_chunk_scorer(size, size, chunk, False, False, True, False)
    pre = jax.block_until_ready(pre_fn(jnp.asarray(ref)))
    devs = [jax.block_until_ready(jnp.asarray(b)) for b in batches]
    np.asarray(scorer(pre, devs[0])["butteraugli"])[:1]

    best = float("inf")
    for _ in range(3):
        ts = {}
        for k in (2, kmax):
            t0 = time.perf_counter()
            out = None
            for i in range(k):
                out = scorer(pre, devs[i])
            np.asarray(out["butteraugli"])[:1]
            ts[k] = time.perf_counter() - t0
        best = min(best, (ts[kmax] - ts[2]) / (kmax - 2))
    print(
        f"malta tile {tile or 'auto':>4}: {best * 1e3:8.2f} ms/dispatch "
        f"(BA-only, {chunk} cands)"
    )


def main() -> None:
    if len(sys.argv) > 1:
        child(int(sys.argv[1]))
        return
    for tile in (0, 64, 96):
        env = dict(os.environ, CODEC_EVAL_MALTA_TILE=str(tile))
        subprocess.run(
            [sys.executable, __file__, str(tile)], env=env, check=False
        )


if __name__ == "__main__":
    main()
