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


def bench(fn, inputs_list):
    """Times over DISTINCT inputs per repetition — the runtime memoizes
    identical (executable, input) executions."""
    import jax

    jax.block_until_ready(fn(*inputs_list[0]))  # compile
    times = []
    for args in inputs_list[1:]:
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times)


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

        sweep_inputs = [
            (jnp.asarray(rng.integers(0, 256, (size, size, 3)).astype(np.uint8)),
             jnp.asarray(rng.integers(0, 256, (n, size, size, 3)).astype(np.uint8)))
            for _ in range(4)
        ]
        dt = bench(sweep, sweep_inputs)
        print(f"size {size}: sweep {dt * 1000:.1f} ms -> {n / dt:.0f} img/s")

        # Ablation: just the 21-plane blur at full res, batch n.
        @jax.jit
        def blur_only(p):
            return jax.vmap(lambda x: blur_separable(x, 1.5))(p)

        blur_inputs = [
            (jnp.asarray(rng.random((n, 21, size, size)).astype(np.float32)),)
            for _ in range(4)
        ]
        dt_b = bench(blur_only, blur_inputs)
        print(f"  blur21 full-res x{n}: {dt_b * 1000:.1f} ms")

        # Ablation: precompute reuse value — score one pair.
        @jax.jit
        def one(r, d):
            pre = precompute_reference(r)
            return score_from_features(features_against_reference(pre, d))

        one_inputs = [(r, b[0]) for r, b in sweep_inputs]
        dt_1 = bench(one, one_inputs)
        print(f"  single pair: {dt_1 * 1000:.2f} ms")


if __name__ == "__main__":
    main()
