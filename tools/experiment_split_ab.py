"""A/B: fused (ref+chunk) scorer vs split precompute+chunk, same process.

Also measures the raw per-dispatch overhead floor with a trivial program.
All variants interleave inside each round so chip-phase drift hits them
equally.  Slope method, 512px, chunk 50.

Run: ``python tools/experiment_split_ab.py``.
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

    size, chunk = 512, 50
    ref = _photo(size, size, 1)
    rng = np.random.default_rng(31)
    ref_dev = jnp.asarray(ref)
    kmax = 6
    batches = [
        np.clip(
            ref.astype(np.int16) + rng.integers(-8, 9, (chunk,) + ref.shape),
            0, 255,
        ).astype(np.uint8)
        for _ in range(kmax)
    ]
    devs = [jax.block_until_ready(jnp.asarray(b)) for b in batches]

    fused = _build_scorer(size, size, chunk, True, True, True, True, False)
    split = _build_chunk_scorer(size, size, chunk, True, True, True, True)
    pre_fn = _build_precompute(size, size, True, True, True, False)
    tiny = jax.jit(lambda x: x + 1.0)
    tiny_in = jax.block_until_ready(jnp.zeros((8, 128), jnp.float32))

    pre = jax.block_until_ready(pre_fn(ref_dev))
    # Warm every executable.
    np.asarray(fused(ref_dev, devs[0])["ssimulacra2"])[:1]
    np.asarray(split(pre, devs[0])["ssimulacra2"])[:1]
    np.asarray(tiny(tiny_in))[:1]

    def slope(fn):
        ts = {}
        for k in (2, kmax):
            t0 = time.perf_counter()
            out = None
            for i in range(k):
                out = fn(i)
            leaf = jax.tree_util.tree_leaves(out)[-1]
            np.asarray(leaf).ravel()[:1]
            ts[k] = time.perf_counter() - t0
        return (ts[kmax] - ts[2]) / (kmax - 2)

    variants = {
        "tiny dispatch": lambda i: tiny(tiny_in),
        "fused chunk50": lambda i: fused(ref_dev, devs[i % kmax])["butteraugli"],
        "split chunk50 (pre cached)": lambda i: split(pre, devs[i % kmax])["butteraugli"],
        "precompute only": lambda i: pre_fn(ref_dev)["ref_u8"],
        "split pre+chunk": lambda i: split(pre_fn(ref_dev), devs[i % kmax])["butteraugli"],
    }
    best = {k: float("inf") for k in variants}
    for _ in range(3):
        for name, fn in variants.items():
            best[name] = min(best[name], slope(fn))
    for name in variants:
        print(f"{name:28s} {best[name] * 1e3:8.2f} ms/dispatch")


if __name__ == "__main__":
    main()
