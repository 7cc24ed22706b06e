"""Stage-level cost breakdown of the batched SSIMULACRA2 scorer (slope).

Cumulative prefixes of _ssimulacra2_batch_pallas at 512px/25 candidates;
all outputs reduced to scalars in-program (tunnel fetches cost ~25 ms/MB).

Run: ``python tools/profile_ssim2_stages.py``.
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

    import importlib

    from bench import _photo

    s2 = importlib.import_module("codec_eval_tpu.kernels.ssimulacra2")
    from codec_eval_tpu.kernels.color import srgb_u8_to_linear
    from codec_eval_tpu.kernels.pallas.scale_features import (
        scale_features_pallas_batch,
    )

    size, batch = 512, 25
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

    def p_linear(b):
        return lin_of(b)

    def p_pyramid(b):
        linear = lin_of(b)
        outs = [linear]
        for scale in range(1, s2.NUM_SCALES):
            linear = jax.vmap(s2.downscale_by_2)(linear)
            outs.append(linear)
        return outs

    def p_xyb(b):
        linear = lin_of(b)
        outs = []
        for scale in range(s2.NUM_SCALES):
            if scale:
                linear = jax.vmap(s2.downscale_by_2)(linear)
            outs.append(jax.vmap(s2._to_positive_xyb)(linear))
        return outs

    def p_full(b):
        r = jnp.asarray(ref)
        return s2._ssimulacra2_batch_pallas(s2.precompute_reference(r), r, b)

    def p_feats_only(b):
        # features kernel with scale-0 xyb reused at every scale shape:
        linear = lin_of(b)
        outs = []
        for scale in range(s2.NUM_SCALES):
            if scale:
                linear = jax.vmap(s2.downscale_by_2)(linear)
            xyb2 = jax.vmap(s2._to_positive_xyb)(linear)
            outs.append(
                scale_features_pallas_batch(
                    pre.xyb[scale], pre.mu[scale], pre.sqblur[scale], xyb2,
                    sigma=s2.SIGMA,
                )
            )
        return outs

    stages = [
        ("u8->linear", p_linear),
        ("+pyramid (6 scales)", p_pyramid),
        ("+XYB conversions", p_xyb),
        ("+features kernels", p_feats_only),
        ("full (=ssim2 batch)", p_full),
    ]

    devs = [jax.block_until_ready(jnp.asarray(b)) for b in batches]
    prev = 0.0
    for name, fn in stages:
        def scalar_fn(b, fn=fn):
            out = fn(b)
            return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out))

        jfn = jax.jit(scalar_fn)
        jax.block_until_ready(jfn(devs[0]))
        ts = {}
        best = float("inf")
        for _ in range(2):
            for k in (2, kmax):
                t0 = time.perf_counter()
                out = None
                for i in range(k):
                    out = jfn(devs[i])
                np.asarray(out)
                ts[k] = time.perf_counter() - t0
            best = min(best, (ts[kmax] - ts[2]) / (kmax - 2))
        print(f"{name:26s} {best * 1e3:7.2f} ms  (+{(best - prev) * 1e3:6.2f})")
        prev = best


if __name__ == "__main__":
    main()
