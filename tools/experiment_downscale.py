"""A/B: reshape-mean 2x2 downscale vs matmul (MXU) downscale.

The SSIMULACRA2 pyramid's scale-1 step costs ~2.2 ms at 512px/25 — as much
as the whole scale-0 feature kernel — suspicion: the lane-dim pairwise
mean in ``downscale_by_2`` lowers to shuffles.  Candidate: column-pair
averaging as a (W, W/2) matmul on the MXU + row-pair mean on sublanes.

Interleaved same-phase slope A/B at 512px/25.

Run: ``python tools/experiment_downscale.py``.
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
    from codec_eval_tpu.kernels.blur import downscale_by_2
    from codec_eval_tpu.kernels.color import srgb_u8_to_linear

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

    def lin_of(b):
        return jax.vmap(lambda d: jnp.moveaxis(srgb_u8_to_linear(d), -1, 0))(b)

    def down_mm(planes):
        """(C, H, W) -> (C, ceil(H/2), ceil(W/2)) via averaging matmul."""
        c, h, w = planes.shape
        ph, pw = h % 2, w % 2
        if ph or pw:
            planes = jnp.pad(planes, ((0, 0), (0, ph), (0, pw)), mode="edge")
        h2, w2 = planes.shape[-2] // 2, planes.shape[-1] // 2
        # Column average: x @ A, A (2*w2, w2) with 0.5 at (2j, j), (2j+1, j).
        a = np.zeros((2 * w2, w2), np.float32)
        a[2 * np.arange(w2), np.arange(w2)] = 0.5
        a[2 * np.arange(w2) + 1, np.arange(w2)] = 0.5
        cols = jnp.einsum(
            "chw,wk->chk", planes, jnp.asarray(a),
            precision=jax.lax.Precision.HIGHEST,
        )
        # Row average on sublanes: reshape-mean over the row-pair axis.
        return cols.reshape(c, h2, 2, w2).mean(axis=2)

    def pyr_reshape(b):
        linear = lin_of(b)
        outs = []
        for _ in range(5):
            linear = jax.vmap(downscale_by_2)(linear)
            outs.append(jnp.sum(linear))
        return sum(outs)

    def pyr_mm(b):
        linear = lin_of(b)
        outs = []
        for _ in range(5):
            linear = jax.vmap(down_mm)(linear)
            outs.append(jnp.sum(linear))
        return sum(outs)

    def base(b):
        return jnp.sum(lin_of(b))

    devs = [jax.block_until_ready(jnp.asarray(b)) for b in batches]
    fns = {
        "u8->linear only": jax.jit(base),
        "5-step pyramid reshape-mean": jax.jit(pyr_reshape),
        "5-step pyramid matmul-cols": jax.jit(pyr_mm),
    }
    for name, f in fns.items():
        jax.block_until_ready(f(devs[0]))

    # Interleaved rounds: each round measures all variants back to back so
    # chip phase drift hits them equally.
    best = {name: float("inf") for name in fns}
    for _ in range(3):
        for name, f in fns.items():
            ts = {}
            for k in (2, kmax):
                t0 = time.perf_counter()
                out = None
                for i in range(k):
                    out = f(devs[i])
                np.asarray(out)
                ts[k] = time.perf_counter() - t0
            best[name] = min(best[name], (ts[kmax] - ts[2]) / (kmax - 2))
    for name, v in best.items():
        print(f"{name:32s} {v * 1e3:7.2f} ms/dispatch")


if __name__ == "__main__":
    main()
