"""Per-metric timing breakdown of the dense-sweep scorer at 512px.

Times each metric's single-metric fused program (batch=25 candidates vs one
reference) on the attached accelerator, so optimization effort goes where
the milliseconds are.  Run: ``python tools/profile_sweep_metrics.py``.
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

    size, batch = 512, 25
    ref = _photo(size, size, 1)
    rng = np.random.default_rng(2)
    cands = np.stack(
        [
            np.clip(
                ref.astype(np.int16) + rng.integers(-8, 9, ref.shape), 0, 255
            ).astype(np.uint8)
            for _ in range(batch)
        ]
    )
    ref_dev = jnp.asarray(ref)

    configs = {
        "psnr": (False, False, False, True),
        "ssimulacra2": (False, True, False, False),
        "dssim": (True, False, False, False),
        "butteraugli": (False, False, True, False),
        "all": (True, True, True, True),
    }
    for name, (d, s2, ba, ps) in configs.items():
        scorer = _build_scorer(size, size, batch, d, s2, ba, ps, False)
        c = jnp.asarray(cands)
        jax.block_until_ready(scorer(ref_dev, c))  # compile
        best = best_with_xfer = float("inf")
        for rep in range(4):
            cands[0, rep, 0, 0] ^= 1  # distinct inputs (runtime memoization)
            t_x = time.perf_counter()
            c = jax.block_until_ready(jnp.asarray(cands))
            t0 = time.perf_counter()
            # Materialize score VALUES: on the remote backend
            # block_until_ready alone can return before execution.
            out = scorer(ref_dev, c)
            _ = [np.asarray(v) for v in out.values()]
            t1 = time.perf_counter()
            best = min(best, t1 - t0)
            best_with_xfer = min(best_with_xfer, t1 - t_x)
        flops = None
        try:
            an = scorer.lower(ref_dev, c).compile().cost_analysis()
            if isinstance(an, (list, tuple)):
                an = an[0]
            flops = float(an.get("flops", 0.0)) or None
        except Exception:
            pass
        print(
            f"{name:12s} {best * 1e3:8.1f} ms compute "
            f"({best_with_xfer * 1e3:8.1f} ms with H2D) /batch{batch} "
            f"{batch / best:8.1f} pairs/s"
            + (f"  {flops / 1e9:.2f} GFLOP  {flops / best / 1e12:.2f} TFLOP/s"
               if flops else "")
        )


if __name__ == "__main__":
    main()
