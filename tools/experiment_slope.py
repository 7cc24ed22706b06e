"""True per-dispatch cost of the sweep scorer via the slope method.

Through the remote tunnel, async dispatch + per-fetch round trips distort
single-call timings.  Here we enqueue k dispatches (distinct inputs, all
pre-staged on device) and fetch ONE scalar of the LAST output; with a
single serial device stream, t(k) is linear in k and the slope is the true
per-dispatch wall cost (compute + any non-overlapped transfer).
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

    for name, flags in (
        ("all", (True, True, True, True)),
        ("ssim2-only", (False, True, False, False)),
        ("butteraugli", (False, False, True, False)),
        ("dssim", (True, False, False, False)),
        ("psnr", (False, False, False, True)),
    ):
        d, s2, ba, ps = flags
        scorer = _build_scorer(size, size, chunk, d, s2, ba, ps, False)
        key = "psnr" if ps else ("ssimulacra2" if s2 else ("butteraugli" if ba else "dssim"))

        # Pre-stage all inputs on device, outside timing.
        devs = [jax.block_until_ready(jnp.asarray(b)) for b in batches]
        _ = np.asarray(scorer(ref_dev, devs[0])[key])  # compile + warm

        def t_of_k(k, devs=devs, scorer=scorer, key=key):
            t0 = time.perf_counter()
            out = None
            for i in range(k):
                out = scorer(ref_dev, devs[i])
            _ = np.asarray(out[key][0])
            return time.perf_counter() - t0

        t2 = min(t_of_k(2) for _ in range(3))
        tk = min(t_of_k(kmax) for _ in range(3))
        slope = (tk - t2) / (kmax - 2)
        print(
            f"{name:12s} t(2)={t2 * 1e3:7.1f} ms  t({kmax})={tk * 1e3:7.1f} ms"
            f"  slope={slope * 1e3:7.1f} ms/dispatch"
            f"  => {chunk / slope:8.1f} pairs/s sustained"
        )


if __name__ == "__main__":
    main()
