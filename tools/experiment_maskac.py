"""A/B: fused Pallas candidate-side masking kernel vs the XLA matmul path.

Measures (same-phase, interleaved) the all-metric chunk-25 sweep at 512px
with MASKAC_IMPL toggled, plus on-chip score parity between the two paths.

Run: ``python tools/experiment_maskac.py [size] [batch]``.
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

    from codec_eval_tpu.engine.scoring import (
        _build_chunk_scorer,
        _build_precompute,
    )
    from codec_eval_tpu.kernels import butteraugli as ba

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    rng = np.random.default_rng(9)

    def photo(seed):
        r = np.random.default_rng(seed)
        y, x = np.mgrid[0:size, 0:size]
        base = 120 + 70 * np.sin(x / 23.0 + seed) + 45 * np.cos(y / 17.0)
        img = np.stack([base, base * 0.9 + 10, base * 0.8 + 24], -1)
        return np.clip(img + r.normal(0, 7, (size, size, 3)), 0, 255).astype(
            np.uint8
        )

    n_imgs = 4
    refs = [photo(100 + i) for i in range(n_imgs)]
    cands = [
        np.stack(
            [
                np.clip(
                    r.astype(np.int32) + rng.integers(-6, 7, r.shape),
                    0,
                    255,
                ).astype(np.uint8)
                for _ in range(batch)
            ]
        )
        for r in refs
    ]

    refs_dev = [jax.block_until_ready(jnp.asarray(r)) for r in refs]
    cands_dev = [jax.block_until_ready(jnp.asarray(c)) for c in cands]

    # Build AND warm each variant while its MASKAC_IMPL is active — jit
    # traces lazily on first call, so warming outside the toggle would
    # trace both scorers with the last-set impl.
    scorers = {}
    outs = {}
    for impl in ("xla", "pallas"):
        ba.MASKAC_IMPL = impl
        # __wrapped__: bypass the lru_cache, which would hand both impls
        # the same (first-built) scorer object.
        scorer = _build_chunk_scorer.__wrapped__(
            size, size, batch, True, True, True, True
        )
        pre = _build_precompute.__wrapped__(size, size, True, True, True, False)
        outs[impl] = {
            k: np.asarray(v)
            for k, v in scorer(pre(refs_dev[0]), cands_dev[0]).items()
        }
        scorers[impl] = (scorer, pre)
    for k in outs["xla"]:
        a, b = outs["xla"][k], outs["pallas"][k]
        rel = np.max(np.abs(a - b) / np.maximum(np.abs(a), 1e-6))
        print(f"parity {k}: max rel diff {rel:.2e}")

    def sweep_rate(scorer, pre):
        t0 = time.perf_counter()
        out = None
        for i in range(n_imgs):
            p = pre(refs_dev[i])
            out = scorer(p, cands_dev[i])
        _ = np.asarray(next(iter(out.values()))[0])
        return n_imgs * batch / (time.perf_counter() - t0)

    # Interleaved rounds so chip phase drift hits both equally.
    best = {"xla": 0.0, "pallas": 0.0}
    for _ in range(4):
        for impl, (scorer, pre) in scorers.items():
            best[impl] = max(best[impl], sweep_rate(scorer, pre))
    for impl, rate in best.items():
        print(f"{impl}: {rate:.1f} pairs/s (best of 4, {size}px/{batch})")
    print(f"speedup: {best['pallas'] / best['xla']:.3f}x")


if __name__ == "__main__":
    main()
