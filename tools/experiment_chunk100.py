"""Does the fused all-metric scorer compile and sustain at chunk 100?

Earlier in round 2 batch=100 tripped a TPU smem limit; the Pallas Malta /
freqsep kernels changed the program shape, so retest.  Slope method as in
experiment_chunk_size.py.

Run: ``python tools/experiment_chunk100.py [chunk]``.
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
    from codec_eval_tpu.engine.scoring import _build_scorer

    size = 512
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    ref = _photo(size, size, 1)
    rng = np.random.default_rng(31)
    ref_dev = jnp.asarray(ref)

    kmax = max(4, 300 // chunk)
    batches = [
        np.clip(
            ref.astype(np.int16) + rng.integers(-8, 9, (chunk,) + ref.shape),
            0, 255,
        ).astype(np.uint8)
        for _ in range(kmax)
    ]
    scorer = _build_scorer(size, size, chunk, True, True, True, True, False)
    devs = [jax.block_until_ready(jnp.asarray(b)) for b in batches]
    try:
        _ = np.asarray(scorer(ref_dev, devs[0])["ssimulacra2"])  # compile
    except Exception as e:  # smem overflow or OOM -> report and bail
        print(f"chunk {chunk}: COMPILE/RUN FAILED: {type(e).__name__}: {e}")
        return

    best = float("inf")
    for _ in range(3):
        ts = {}
        for k in (2, kmax):
            t0 = time.perf_counter()
            out = None
            for i in range(k):
                out = scorer(ref_dev, devs[i % kmax])
            np.asarray(out["ssimulacra2"])[:1]
            ts[k] = time.perf_counter() - t0
        best = min(best, (ts[kmax] - ts[2]) / (kmax - 2))
    print(
        f"chunk {chunk:3d}: slope {best * 1e3:8.2f} ms/dispatch "
        f"=> {chunk / best:8.1f} pairs/s sustained"
    )


if __name__ == "__main__":
    main()
