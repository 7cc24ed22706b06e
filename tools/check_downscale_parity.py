"""TPU parity check: matmul vs reshape downscale/supersample paths.

The matmul column-pair operators must reproduce the reshape formulation to
f32 rounding (~1e-7 relative) on device.  Checks downscale_by_2 (even and
odd dims), butteraugli._subsample2x, _add_supersampled2x, and end-to-end
ssimulacra2_batch / butteraugli_batch scores.

Run: ``python tools/check_downscale_parity.py``.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import importlib

    from bench import _photo
    from codec_eval_tpu.kernels import blur as blur_mod
    from codec_eval_tpu.kernels import butteraugli as ba

    s2 = importlib.import_module("codec_eval_tpu.kernels.ssimulacra2")

    rng = np.random.default_rng(3)
    ok = True

    def cmp(name, a, b, tol):
        nonlocal ok
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(np.abs(a), 1e-6)
        rel = float(np.max(np.abs(a - b) / denom))
        status = "OK " if rel <= tol else "FAIL"
        if rel > tol:
            ok = False
        print(f"{status} {name:44s} max rel {rel:.3e}")

    # downscale_by_2: even + odd shapes.
    for h, w in ((512, 512), (333, 517)):
        x = jnp.asarray(rng.normal(0, 1, (3, h, w)).astype(np.float32))
        blur_mod.DOWNSCALE_IMPL = "matmul"
        ymm = jax.jit(blur_mod.downscale_by_2)(x)
        blur_mod.DOWNSCALE_IMPL = "reshape"
        yrs = jax.jit(blur_mod.downscale_by_2)(x)
        blur_mod.DOWNSCALE_IMPL = "auto"
        cmp(f"downscale_by_2 {h}x{w}", yrs, ymm, 5e-6)

    # _subsample2x: even + odd.
    for h, w in ((512, 512), (333, 517)):
        x = jnp.asarray(rng.normal(0, 1, (3, h, w)).astype(np.float32))
        blur_mod.DOWNSCALE_IMPL = "matmul"
        ymm = jax.jit(ba._subsample2x)(x)
        blur_mod.DOWNSCALE_IMPL = "reshape"
        yrs = jax.jit(ba._subsample2x)(x)
        blur_mod.DOWNSCALE_IMPL = "auto"
        cmp(f"_subsample2x {h}x{w}", yrs, ymm, 5e-6)

    # _add_supersampled2x.
    for h, w in ((512, 512), (333, 517)):
        res = jnp.asarray(rng.normal(1, 0.3, (h, w)).astype(np.float32))
        sub = jnp.asarray(
            rng.normal(1, 0.3, ((h + 1) // 2, (w + 1) // 2)).astype(np.float32)
        )
        blur_mod.DOWNSCALE_IMPL = "matmul"
        ymm = jax.jit(ba._add_supersampled2x)(res, sub)
        blur_mod.DOWNSCALE_IMPL = "reshape"
        yrs = jax.jit(ba._add_supersampled2x)(res, sub)
        blur_mod.DOWNSCALE_IMPL = "auto"
        cmp(f"_add_supersampled2x {h}x{w}", yrs, ymm, 5e-6)

    # End-to-end scores, matmul vs reshape paths.
    ref = _photo(512, 512, 1)
    cand = np.clip(
        ref.astype(np.int16) + rng.integers(-9, 10, (4,) + ref.shape),
        0, 255,
    ).astype(np.uint8)
    refd, candd = jnp.asarray(ref), jnp.asarray(cand)

    for name, fn in (
        ("ssimulacra2_batch", lambda: s2.ssimulacra2_batch(refd, candd)),
        (
            "butteraugli_batch",
            lambda: ba.butteraugli_batch(
                ba.precompute_butteraugli_reference(refd), candd
            ),
        ),
    ):
        blur_mod.DOWNSCALE_IMPL = "matmul"
        smm = np.asarray(jax.jit(fn)())
        blur_mod.DOWNSCALE_IMPL = "reshape"
        srs = np.asarray(jax.jit(fn)())
        blur_mod.DOWNSCALE_IMPL = "auto"
        print(f"     {name} matmul  {smm}")
        print(f"     {name} reshape {srs}")
        cmp(f"{name} scores", srs, smm, 2e-3)

    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
