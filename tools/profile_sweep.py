"""Capture a jax.profiler trace of the SSIMULACRA2 sweep for analysis.

Writes a TensorBoard/Perfetto-compatible trace; use it to attribute sweep
time between the MXU blur matmuls, elementwise fusions, and transcendentals
before the next optimization round.

Usage: python tools/profile_sweep.py [--size 800] [--out /tmp/ssim2_trace]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--batch", type=int, default=25)
    ap.add_argument("--out", default="/tmp/ssim2_trace")
    ap.add_argument("--impl", choices=["xla", "pallas"], default="xla")
    args = ap.parse_args()

    import os

    os.environ["CODEC_EVAL_SSIM2_IMPL"] = args.impl

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from codec_eval_tpu.kernels.ssimulacra2 import ssimulacra2_batch
    from codec_eval_tpu.utils.profiling import device_trace

    rng = np.random.default_rng(0)

    def mk(seed):
        r = np.random.default_rng(seed)
        ref = r.integers(0, 256, (args.size, args.size, 3)).astype(np.uint8)
        batch = np.stack(
            [
                np.clip(
                    ref.astype(np.int16) + r.integers(-6, 7, ref.shape), 0, 255
                ).astype(np.uint8)
                for _ in range(args.batch)
            ]
        )
        return jnp.asarray(ref), jnp.asarray(batch)

    f = jax.jit(ssimulacra2_batch)
    warm = mk(0)
    jax.block_until_ready(f(*warm))

    inputs = [mk(s) for s in range(1, 4)]
    with device_trace(args.out):
        for a in inputs:
            jax.block_until_ready(f(*a))
    print(f"trace written to {args.out} (impl={args.impl})")
    print("inspect: tensorboard --logdir", args.out)


if __name__ == "__main__":
    main()
