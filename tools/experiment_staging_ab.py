"""Interleaved A/B: channel-last vs planar candidate staging over the tunnel.

VERDICT r4 #5: four tunnel-bound bench fields moved up to 3.6x between
rounds 2 and 4 with nothing to distinguish tunnel weather from a real
regression (planar staging landed in between and was supposed to HELP
transfers).  This experiment settles the staging-layout half: it stages the
same 512px/25 u8 candidate chunk in both layouts, strictly interleaved
A/B/A/B within one session so both variants sample the same weather, and
reports per-rep MB/s for each.

Run on the chip: ``python tools/experiment_staging_ab.py [reps]``.
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

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    size, chunk = 512, 25
    rng = np.random.default_rng(17)
    ref = _photo(size, size, 55)
    base = np.clip(
        ref.astype(np.int16) + rng.integers(-8, 9, (chunk,) + ref.shape),
        0, 255,
    ).astype(np.uint8)  # (N, H, W, 3) channel-last
    mb = base.nbytes / 1e6

    def stage_once(arr):
        t0 = time.perf_counter()
        dev = jnp.asarray(arr)
        jax.block_until_ready(dev)
        _ = np.asarray(dev.ravel()[:1])  # drain the transfer stream
        return mb / (time.perf_counter() - t0)

    rates = {"channel_last": [], "planar": []}
    for rep in range(reps):
        # Fresh bits per rep and per variant: the remote runtime memoizes
        # identical transfers; strict interleave shares the weather.
        cl = base.copy()
        cl[0, rep % size, 0, 0] ^= 1
        rates["channel_last"].append(stage_once(cl))
        pl = np.ascontiguousarray(np.moveaxis(base, -1, 1))
        pl[0, 0, rep % size, 0] ^= 2
        rates["planar"].append(stage_once(pl))
        print(
            f"rep {rep}: channel_last {rates['channel_last'][-1]:7.2f} MB/s   "
            f"planar {rates['planar'][-1]:7.2f} MB/s",
            flush=True,
        )

    for k, v in rates.items():
        print(
            f"{k:13s} median {np.median(v):7.2f}  min {min(v):7.2f}  "
            f"max {max(v):7.2f} MB/s"
        )


if __name__ == "__main__":
    main()
