"""A/B: shared candidate u8->linear staging across metrics vs per-metric.

The all-metric chunk scorer used to let each metric (DSSIM, SSIMULACRA2,
Butteraugli) convert the candidate batch sRGB u8 -> planar linear f32 on its
own — bit-identical expressions XLA does not reliably CSE across the metric
subgraphs.  ``share_staging=True`` stages (N, 3, H, W) linear once and hands
it to all three.  Also A/Bs the Malta lane-halo strategy
(CODEC_EVAL_MALTA_HALO=roll vs slab) when run twice with the env set.

Both variants are measured interleaved within each round (chip throughput
drifts ~15% in phases), split pre+chunk pipeline, chunk 25 at 512px, slope
method with one final scalar fetch, best-of-3 rounds.

Run: ``python tools/experiment_shared_staging.py``.
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
    )

    size, chunk, kmax = 512, 25, 12
    ref = _photo(size, size, 1)
    rng = np.random.default_rng(31)
    batches = [
        np.clip(
            ref.astype(np.int16) + rng.integers(-8, 9, (chunk,) + ref.shape),
            0,
            255,
        ).astype(np.uint8)
        for _ in range(kmax)
    ]
    pre = _build_precompute(size, size, True, True, True, False)(
        jnp.asarray(ref)
    )
    pre = jax.block_until_ready(pre)
    devs = [jax.block_until_ready(jnp.asarray(b)) for b in batches]

    variants = {
        "shared": _build_chunk_scorer(size, size, chunk, True, True, True, True, True),
        "permetric": _build_chunk_scorer(size, size, chunk, True, True, True, True, False),
    }
    outs = {}
    for name, fn in variants.items():
        outs[name] = {
            k: np.asarray(v) for k, v in fn(pre, devs[0]).items()
        }  # compile
    for k in outs["shared"]:
        np.testing.assert_array_equal(
            outs["shared"][k], outs["permetric"][k], err_msg=k
        )
    print("parity: bit-exact across variants")

    best = {name: float("inf") for name in variants}
    for rnd in range(3):
        if rnd:
            time.sleep(2.0)
        for name, fn in variants.items():
            ts = {}
            for k in (2, kmax):
                t0 = time.perf_counter()
                out = None
                for i in range(k):
                    out = fn(pre, devs[i])
                np.asarray(out["ssimulacra2"])[:1]
                ts[k] = time.perf_counter() - t0
            slope = (ts[kmax] - ts[2]) / (kmax - 2)
            best[name] = min(best[name], slope)
    for name, slope in best.items():
        print(
            f"{name:10s}: slope {slope * 1e3:7.2f} ms/chunk "
            f"=> {chunk / slope:8.1f} pairs/s sustained"
        )


if __name__ == "__main__":
    main()
