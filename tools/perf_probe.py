"""Perf probe: where does SSIMULACRA2 sweep time go on the TPU?

Times the full sweep at two sizes plus ablations (blur-only, no-blur
features) to locate the bottleneck before writing Pallas kernels.
Run on the real chip: python tools/perf_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def bench(fn, *args, reps=5):
    import jax

    jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from codec_eval_tpu.kernels.blur import blur_separable
    from codec_eval_tpu.kernels.ssimulacra2 import (
        features_against_reference,
        precompute_reference,
        score_from_features,
    )

    rng = np.random.default_rng(0)
    for size in (400, 800):
        n = 25
        ref = rng.integers(0, 256, (size, size, 3)).astype(np.uint8)
        batch = rng.integers(0, 256, (n, size, size, 3)).astype(np.uint8)
        ref_d, batch_d = jnp.asarray(ref), jnp.asarray(batch)

        @jax.jit
        def sweep(r, b):
            pre = precompute_reference(r)
            return jax.vmap(
                lambda d: score_from_features(features_against_reference(pre, d))
            )(b)

        dt = bench(sweep, ref_d, batch_d)
        print(f"size {size}: sweep {dt * 1000:.1f} ms -> {n / dt:.0f} img/s")

        # Ablation: just the 21-plane blur at full res, batch n.
        planes = jnp.asarray(
            rng.random((n, 21, size, size)).astype(np.float32)
        )

        @jax.jit
        def blur_only(p):
            return jax.vmap(lambda x: blur_separable(x, 1.5))(p)

        dt_b = bench(blur_only, planes)
        print(f"  blur21 full-res x{n}: {dt_b * 1000:.1f} ms")

        # Ablation: precompute reuse value — score one pair.
        @jax.jit
        def one(r, d):
            pre = precompute_reference(r)
            return score_from_features(features_against_reference(pre, d))

        dt_1 = bench(one, ref_d, batch_d[0])
        print(f"  single pair: {dt_1 * 1000:.2f} ms")


if __name__ == "__main__":
    main()
