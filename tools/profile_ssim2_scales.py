"""Per-scale cost of the batched SSIMULACRA2 scorer (prefix slope).

Times the batch pipeline truncated to the first k pyramid scales, for
k = 1..6; deltas give each scale's cost (pyramid step + XYB + fused
feature kernel).  At 512px the scale sizes are 512, 256, 128, 64, 32, 16 —
if the small scales cost disproportionately (grid overhead, lane waste),
an atlas-packed kernel is worth building.

Run: ``python tools/profile_ssim2_scales.py [size] [batch]``.
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

    import importlib

    s2 = importlib.import_module("codec_eval_tpu.kernels.ssimulacra2")
    from codec_eval_tpu.kernels.color import srgb_u8_to_linear
    from codec_eval_tpu.kernels.pallas.scale_features import (
        scale_features_pallas_batch,
    )

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    ref = _photo(size, size, 1)
    rng = np.random.default_rng(9)
    kmax = 8
    batches = [
        np.clip(
            ref.astype(np.int16) + rng.integers(-8, 9, (batch,) + ref.shape),
            0, 255,
        ).astype(np.uint8)
        for _ in range(kmax)
    ]
    pre = jax.block_until_ready(s2.precompute_reference(jnp.asarray(ref)))

    def lin_of(b):
        return jax.vmap(lambda d: jnp.moveaxis(srgb_u8_to_linear(d), -1, 0))(b)

    def upto(nscales):
        def fn(b):
            linear = lin_of(b)
            outs = []
            for scale in range(nscales):
                if scale:
                    linear = jax.vmap(s2.downscale_by_2)(linear)
                xyb2 = jax.vmap(s2._to_positive_xyb)(linear)
                outs.append(
                    scale_features_pallas_batch(
                        pre.xyb[scale], pre.mu[scale], pre.sqblur[scale],
                        xyb2, sigma=s2.SIGMA,
                    )
                )
            return outs

        return fn

    devs = [jax.block_until_ready(jnp.asarray(b)) for b in batches]
    prev = 0.0
    for ns in range(1, s2.NUM_SCALES + 1):
        fn = upto(ns)

        def scalar_fn(b, fn=fn):
            out = fn(b)
            return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out))

        jfn = jax.jit(scalar_fn)
        jax.block_until_ready(jfn(devs[0]))
        best = float("inf")
        for _ in range(2):
            ts = {}
            for k in (2, kmax):
                t0 = time.perf_counter()
                out = None
                for i in range(k):
                    out = jfn(devs[i])
                np.asarray(out)
                ts[k] = time.perf_counter() - t0
            best = min(best, (ts[kmax] - ts[2]) / (kmax - 2))
        sz = size >> (ns - 1)
        print(
            f"scales 0..{ns - 1} (last {sz}px) {best * 1e3:7.2f} ms  "
            f"(+{(best - prev) * 1e3:6.2f})"
        )
        prev = best


if __name__ == "__main__":
    main()
