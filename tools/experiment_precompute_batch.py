"""Measure the per-image reference-precompute cost and its vmap batching.

After shared staging cut the chunk cost to ~15 ms/25 pairs, the per-image
precompute dispatch (SSIM2 + DSSIM pyramids, Butteraugli psycho images +
masking at batch 1) became ~25% of device time in the dense sweep.  This
measures (a) the single-image precompute slope and (b) the slope of a
vmapped R-image precompute, to size the batching win.

Slope method with fresh pre-staged refs per timed point (the runtime
memoizes identical (executable, input) executions), min-per-point across
rounds.

Run: ``python tools/experiment_precompute_batch.py``.
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
    from codec_eval_tpu.engine.scoring import _build_precompute

    size = 512
    pre_fn = _build_precompute(size, size, True, True, True, False)
    batched = jax.jit(jax.vmap(pre_fn))

    k_lo, k_hi, rounds = 2, 8, 5
    refs = [
        jax.block_until_ready(jnp.asarray(_photo(size, size, 1000 + i)))
        for i in range((k_lo + k_hi) * rounds)
    ]

    def leaf0(pre):
        return jax.tree_util.tree_leaves(pre)[0]

    # (a) single-image precompute
    np.asarray(leaf0(pre_fn(refs[0])))[..., :1]  # compile
    it = iter(range(len(refs)))
    times = {k_lo: [], k_hi: []}
    for rnd in range(rounds):
        if rnd:
            time.sleep(1.0)
        for k in (k_lo, k_hi):
            xs = [refs[next(it)] for _ in range(k)]
            t0 = time.perf_counter()
            out = None
            for x in xs:
                out = pre_fn(x)
            np.asarray(leaf0(out)).ravel()[:1]
            times[k].append(time.perf_counter() - t0)
    single = (min(times[k_hi]) - min(times[k_lo])) / (k_hi - k_lo)
    print(f"single-image precompute: {single * 1e3:7.2f} ms/image")

    # (b) vmapped batch-R precompute (R = 4, the bench's image count)
    for r in (4, 8):
        stacked = [
            jax.block_until_ready(
                jnp.stack([jnp.asarray(_photo(size, size, 5000 + 100 * j + i)) for i in range(r)])
            )
            for j in range((k_lo + k_hi) * rounds)
        ]
        np.asarray(leaf0(batched(stacked[0]))).ravel()[:1]  # compile
        it = iter(range(len(stacked)))
        times = {k_lo: [], k_hi: []}
        for rnd in range(rounds):
            if rnd:
                time.sleep(1.0)
            for k in (k_lo, k_hi):
                xs = [stacked[next(it)] for _ in range(k)]
                t0 = time.perf_counter()
                out = None
                for x in xs:
                    out = batched(x)
                np.asarray(leaf0(out)).ravel()[:1]
                times[k].append(time.perf_counter() - t0)
        slope = (min(times[k_hi]) - min(times[k_lo])) / (k_hi - k_lo)
        print(
            f"vmap batch-{r} precompute: {slope * 1e3:7.2f} ms/dispatch "
            f"= {slope * 1e3 / r:6.2f} ms/image"
        )


if __name__ == "__main__":
    main()
