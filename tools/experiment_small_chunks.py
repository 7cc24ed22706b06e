"""Chunk-size sweep below 25, interleaved against phase drift.

Since the MXU matmul downscale, marginal per-pair cost at chunk 25 beats
50 — the curve may keep improving at smaller chunks (until utilization of
the per-candidate kernels collapses).  Chip throughput drifts ~15% in
phases, so all chunk sizes are measured round-robin within each round and
each takes its best-of-3.

20 divides the 4x25 sweep grid (5 dispatches); 10 gives 10.

Run: ``python tools/experiment_small_chunks.py``.
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
    from codec_eval_tpu.engine.scoring import _build_chunk_scorer, _build_precompute

    size = 512
    chunks = (10, 20, 25, 50)
    ref = _photo(size, size, 1)
    rng = np.random.default_rng(31)
    ref_dev = jnp.asarray(ref)
    pre = _build_precompute(size, size, True, True, True, False)(ref_dev)
    pre = jax.block_until_ready(pre)

    setups = {}
    for chunk in chunks:
        kmax = max(4, 200 // chunk)
        devs = [
            jax.block_until_ready(
                jnp.asarray(
                    np.clip(
                        ref.astype(np.int16)
                        + rng.integers(-8, 9, (chunk,) + ref.shape),
                        0, 255,
                    ).astype(np.uint8)
                )
            )
            for _ in range(kmax)
        ]
        sc = _build_chunk_scorer(size, size, chunk, True, True, True, True)
        np.asarray(sc(pre, devs[0])["ssimulacra2"])[:1]  # compile+complete
        setups[chunk] = (sc, devs, kmax)

    best = {c: float("inf") for c in chunks}
    for _ in range(3):
        for chunk in chunks:
            sc, devs, kmax = setups[chunk]
            ts = {}
            for k in (2, kmax):
                t0 = time.perf_counter()
                out = None
                for i in range(k):
                    out = sc(pre, devs[i])
                np.asarray(out["ssimulacra2"])[:1]
                ts[k] = time.perf_counter() - t0
            slope = (ts[kmax] - ts[2]) / (kmax - 2)
            best[chunk] = min(best[chunk], slope)
    for chunk in chunks:
        s = best[chunk]
        print(
            f"chunk {chunk:3d}: slope {s * 1e3:8.2f} ms/dispatch"
            f" => {chunk / s:8.1f} pairs/s sustained ({s / chunk * 1e3:6.3f}"
            " ms/pair)"
        )


if __name__ == "__main__":
    main()
