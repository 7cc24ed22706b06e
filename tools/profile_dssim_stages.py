"""Stage-level cost of the batched DSSIM scorer (slope method).

Cumulative prefixes at 512px/25 candidates, scalars fetched.

Run: ``python tools/profile_dssim_stages.py``.
"""

from __future__ import annotations

import importlib
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
    from codec_eval_tpu.kernels.color import srgb_u8_to_linear

    ds = importlib.import_module("codec_eval_tpu.kernels.dssim")

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    ref = _photo(size, size, 1)
    rng = np.random.default_rng(41)
    kmax = 8
    batches = [
        np.clip(
            ref.astype(np.int16) + rng.integers(-8, 9, (batch,) + ref.shape),
            0, 255,
        ).astype(np.uint8)
        for _ in range(kmax)
    ]
    ref_lin = jnp.moveaxis(srgb_u8_to_linear(jnp.asarray(ref)), -1, 0)
    pre = jax.block_until_ready(ds.precompute_dssim_reference(ref_lin))

    def lin_of(b):
        return jax.vmap(lambda d: jnp.moveaxis(srgb_u8_to_linear(d), -1, 0))(b)

    def p_linear(b):
        return lin_of(b)

    def p_lab(b):
        return jax.vmap(ds._linear_rgb_to_lab_planes)(lin_of(b))

    def p_pyramids(b):
        lab = jax.vmap(ds._linear_rgb_to_lab_planes)(lin_of(b))
        return jax.vmap(lambda l: tuple(ds._lab_channel_pyramids(l)))(lab)

    def p_blurs(b):
        lab = jax.vmap(ds._linear_rgb_to_lab_planes)(lin_of(b))

        def one(l):
            outs = []
            for luma2, chroma2 in ds._lab_channel_pyramids(l):
                outs.append(
                    ds._blur_window(
                        jnp.concatenate([luma2, luma2 * luma2], axis=0)
                    ).sum()
                )
                outs.append(
                    ds._blur_window(
                        jnp.concatenate([chroma2, chroma2 * chroma2], axis=0)
                    ).sum()
                )
            return sum(outs)

        return jax.vmap(one)(lab)

    def p_full(b):
        lin = lin_of(b)
        return jax.vmap(lambda d: ds.dssim_against_reference(pre, d))(lin)

    stages = [
        ("u8->linear", p_linear),
        ("+lab conversion", p_lab),
        ("+pyramids", p_pyramids),
        ("+window blurs (self)", p_blurs),
        ("full dssim batch", p_full),
    ]

    devs = [jax.block_until_ready(jnp.asarray(b)) for b in batches]
    prev = 0.0
    for name, fn in stages:
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
        print(f"{name:24s} {best * 1e3:7.2f} ms  (+{(best - prev) * 1e3:6.2f})")
        prev = best


if __name__ == "__main__":
    main()
