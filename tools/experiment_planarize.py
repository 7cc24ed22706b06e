"""A/B: interleaved->planar u8->linear staging variants (slope method).

profile_ba_batch_stages.py puts u8->linear at ~1.64 ms of the 512px/25
batch — suspicion: the cost is the (H, W, 3) -> (3, H, W) moveaxis (a
lane-dim transpose), not the sRGB math.  Variants:

  A. current: srgb_u8_to_linear then moveaxis (per candidate, vmapped)
  B. math only, no transpose (lower bound for the elementwise part)
  C. transpose only, no math (isolates the layout cost)
  D. linearize interleaved as (H, 3W), planarize via a (3W, 3W) 0/1
     selection matmul on the MXU, then the cheap (H,3,W)->(3,H,W) swap
  E. D but selection matmul in bf16 (exact: selection entries are 0/1,
     products are f32 values x 1 — but accumulation order may differ)

Run: ``python tools/experiment_planarize.py [size] [batch]``.
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
    from codec_eval_tpu.kernels.color import srgb_u8_to_linear

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    ref = _photo(size, size, 1)
    rng = np.random.default_rng(5)
    kmax = 8
    batches = [
        np.clip(
            ref.astype(np.int16) + rng.integers(-8, 9, (batch,) + ref.shape),
            0, 255,
        ).astype(np.uint8)
        for _ in range(kmax)
    ]
    devs = [jax.block_until_ready(jnp.asarray(b)) for b in batches]

    w = size
    sel = np.zeros((3 * w, 3 * w), np.float32)
    for c in range(3):
        for j in range(w):
            sel[3 * j + c, c * w + j] = 1.0
    sel_dev = jnp.asarray(sel)

    def srgb_math(x_u8):
        x = x_u8.astype(jnp.float32) / 255.0
        lo = x / 12.92
        hi = ((x + 0.055) / 1.055) ** 2.4
        return jnp.where(x <= 0.04045, lo, hi)

    def v_a(b):
        return jax.vmap(lambda d: jnp.moveaxis(srgb_u8_to_linear(d), -1, 0))(b)

    def v_b(b):
        return jax.vmap(srgb_u8_to_linear)(b)

    def v_c(b):
        return jnp.moveaxis(b.astype(jnp.float32), -1, 1)

    def _planarize_mm(d, precision):
        lin = srgb_math(d).reshape(size, 3 * w)
        cols = jnp.matmul(lin, sel_dev, precision=precision)
        return jnp.moveaxis(cols.reshape(size, 3, w), 1, 0)

    def v_d(b):
        return jax.vmap(
            lambda d: _planarize_mm(d, jax.lax.Precision.HIGHEST)
        )(b)

    def v_e(b):
        return jax.vmap(
            lambda d: _planarize_mm(d, jax.lax.Precision.DEFAULT)
        )(b)

    def slope(fn, kmax=8):
        jfn = jax.jit(lambda b: jnp.sum(fn(b)))
        jax.block_until_ready(jfn(devs[0]))
        best = float("inf")
        for _ in range(3):
            ts = {}
            for k in (2, kmax):
                t0 = time.perf_counter()
                out = None
                for i in range(k):
                    out = jfn(devs[i])
                np.asarray(out).ravel()[:1]
                ts[k] = time.perf_counter() - t0
            best = min(best, (ts[kmax] - ts[2]) / (kmax - 2))
        return best

    variants = [
        ("A current moveaxis", v_a),
        ("B math only (no transpose)", v_b),
        ("C transpose only (no math)", v_c),
        ("D selection matmul HIGHEST", v_d),
        ("E selection matmul bf16", v_e),
    ]
    for name, fn in variants:
        print(f"{name:30s} {slope(fn) * 1e3:7.2f} ms", flush=True)

    # Parity D vs A.
    a = np.asarray(jax.jit(v_a)(devs[0]))
    d = np.asarray(jax.jit(v_d)(devs[0]))
    rel = np.max(np.abs(a - d) / np.maximum(np.abs(a), 1e-6))
    print(f"parity D vs A: max rel {rel:.3e}")


if __name__ == "__main__":
    main()
