"""A/B: all-metric chunk scorer with channel-last vs planar u8 staging.

profile_ba_batch_stages.py charges ~2 ms of the 512px/25 all-metric chunk
to the (N, H, W, 3) u8 -> (N, 3, H, W) f32 linear staging pass (the
channel-last u8 layout tiles pathologically on TPU: minor dim 3).  The
chunk scorer already has a ``planar=True`` mode built for the device-JPEG
producer; this measures what the HOST-staged sweep path gains by handing
over planar u8 (a host-side transpose) instead.

Run: ``python tools/experiment_planar_chunk.py [size] [batch]``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def slope(fn, inputs, kmax=12):
    import jax

    best = float("inf")
    for _round in range(3):
        ts = {}
        for k in (2, kmax):
            t0 = time.perf_counter()
            out = None
            for i in range(k):
                out = fn(inputs[i])
            np.asarray(next(iter(out.values()))[:1])
            ts[k] = time.perf_counter() - t0
        best = min(best, (ts[kmax] - ts[2]) / (kmax - 2))
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from bench import _photo
    from codec_eval_tpu.engine.scoring import (
        _build_chunk_scorer,
        _build_precompute,
    )

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    ref = _photo(size, size, 1)
    rng = np.random.default_rng(5)
    kmax = 12
    batches = [
        np.clip(
            ref.astype(np.int16) + rng.integers(-8, 9, (batch,) + ref.shape),
            0, 255,
        ).astype(np.uint8)
        for _ in range(kmax)
    ]

    pre_fn = _build_precompute(size, size, True, True, True, False)
    pre = jax.block_until_ready(pre_fn(jnp.asarray(ref)))

    for name, planar in (("channel-last", False), ("planar", True)):
        sc = _build_chunk_scorer(
            size, size, batch, True, True, True, True, planar=planar
        )
        host = (
            [np.ascontiguousarray(np.moveaxis(b, -1, 1)) for b in batches]
            if planar
            else batches
        )
        devs = [jax.block_until_ready(jnp.asarray(b)) for b in host]
        _ = np.asarray(devs[-1].ravel()[:1])
        out = sc(pre, devs[0])
        vals = {k: np.asarray(v) for k, v in out.items()}
        assert all(np.isfinite(v).all() for v in vals.values())
        s = slope(lambda d, sc=sc: sc(pre, d), devs, kmax)
        print(
            f"{name:14s} {s * 1e3:7.2f} ms/dispatch  "
            f"=> {batch / s:8.1f} pairs/s"
        )
        if planar:
            t0 = time.perf_counter()
            _ = [np.ascontiguousarray(np.moveaxis(b, -1, 1)) for b in batches]
            host_ms = (time.perf_counter() - t0) / kmax * 1e3
            print(f"  host transpose: {host_ms:.1f} ms/chunk (1-core box)")


if __name__ == "__main__":
    main()
