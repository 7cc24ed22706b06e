"""Sub-stage cost of the butteraugli psycho pipeline (slope method).

Cumulative prefixes: u8->linear, +opsin Pallas kernel, +sigma-7.16 LF blur
(MXU), +bands Pallas kernel.  512px / 25 candidates, scalars fetched.

Run: ``python tools/profile_psycho_stages.py``.
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
    from codec_eval_tpu.kernels import butteraugli as ba
    from codec_eval_tpu.kernels.color import srgb_u8_to_linear
    from codec_eval_tpu.kernels.pallas.freqsep import (
        bands_batch_pallas,
        opsin_xyb_batch_pallas,
    )

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    ref = _photo(size, size, 1)
    rng = np.random.default_rng(13)
    kmax = 8
    batches = [
        np.clip(
            ref.astype(np.int16) + rng.integers(-8, 9, (batch,) + ref.shape),
            0, 255,
        ).astype(np.uint8)
        for _ in range(kmax)
    ]
    it = jnp.float32(ba.ButteraugliParams.default().intensity_target)

    def lin_of(b):
        return (
            jax.vmap(lambda d: jnp.moveaxis(srgb_u8_to_linear(d), -1, 0))(b)
            * it
        )

    def p_linear(b):
        return lin_of(b)

    def p_opsin(b):
        return opsin_xyb_batch_pallas(lin_of(b), ba._OPSIN_CONSTS)

    def p_lf(b):
        xyb = opsin_xyb_batch_pallas(lin_of(b), ba._OPSIN_CONSTS)
        return xyb, jax.vmap(lambda p: ba._blur(p, ba.SIGMA_LF))(xyb)

    def p_bands(b):
        xyb = opsin_xyb_batch_pallas(lin_of(b), ba._OPSIN_CONSTS)
        lf = jax.vmap(lambda p: ba._blur(p, ba.SIGMA_LF))(xyb)
        return bands_batch_pallas(xyb, lf, ba._BAND_CONSTS)

    def p_psycho(b):
        return ba._psycho_batch(lin_of(b))

    stages = [
        ("u8->linear", p_linear),
        ("+opsin kernel", p_opsin),
        ("+LF blur (MXU)", p_lf),
        ("+bands kernel", p_bands),
        ("full _psycho_batch", p_psycho),
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
        print(f"{name:22s} {best * 1e3:7.2f} ms  (+{(best - prev) * 1e3:6.2f})")
        prev = best


if __name__ == "__main__":
    main()
