"""Quick butteraugli-only sustained slope probe (for A/B kernel work).

Run: ``python tools/slope_ba_only.py [label]``.
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

    label = sys.argv[1] if len(sys.argv) > 1 else ""
    size, chunk = 512, 25
    ref = _photo(size, size, 1)
    rng = np.random.default_rng(4)
    kmax = 12
    batches = [
        np.clip(
            ref.astype(np.int16) + rng.integers(-8, 9, (chunk,) + ref.shape),
            0, 255,
        ).astype(np.uint8)
        for _ in range(kmax)
    ]
    ref_dev = jnp.asarray(ref)

    scorer = _build_scorer(size, size, chunk, False, False, True, False, False)
    devs = [jax.block_until_ready(jnp.asarray(b)) for b in batches]
    _ = np.asarray(scorer(ref_dev, devs[0])["butteraugli"])  # compile

    best = float("inf")
    for _round in range(3):
        ts = {}
        for k in (2, kmax):
            t0 = time.perf_counter()
            out = None
            for i in range(k):
                out = scorer(ref_dev, devs[i])
            np.asarray(out["butteraugli"])[:1]
            ts[k] = time.perf_counter() - t0
        slope = (ts[kmax] - ts[2]) / (kmax - 2)
        best = min(best, slope)
        print(
            f"ba {label:10s} round slope={slope * 1e3:7.2f} ms/dispatch "
            f"=> {chunk / slope:8.1f} pairs/s"
        )
    print(f"ba {label:10s} BEST {best * 1e3:7.2f} ms  {chunk / best:8.1f} pairs/s")


if __name__ == "__main__":
    main()
