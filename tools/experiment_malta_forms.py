"""A/B malta-sweep formulations in pure XLA before reaching for Pallas.

Variants on a batch of 25 (512, 512) diff planes, slope-timed:
  dyn     — current: jnp.pad + lax.dynamic_slice per (dy, dx)
  static  — jnp.pad + static slicing
  conv    — one lax.conv with 12/16 sparse 9x9 output-channel kernels
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

    from codec_eval_tpu.kernels import butteraugli as ba

    size, batch = 512, 25
    rng = np.random.default_rng(6)
    kmax = 8
    batches = [
        rng.normal(0, 1, (batch, size, size)).astype(np.float32)
        for _ in range(kmax)
    ]
    lines = ba._MALTA_LINES_LF

    def sweep_dyn(d):
        return ba._malta_sweep(d, lines)

    def sweep_static(d):
        h, w = d.shape
        pad = jnp.pad(d, 4)
        acc = jnp.zeros_like(d)
        for weight, line in lines:
            s = None
            for dy, dx in line:
                piece = pad[4 + dy : 4 + dy + h, 4 + dx : 4 + dx + w]
                s = piece if s is None else s + piece
            acc = acc + weight * (s * s)
        return acc

    kern = np.zeros((len(lines), 1, 9, 9), np.float32)
    wts = np.array([wt for wt, _ in lines], np.float32)
    for i, (_, line) in enumerate(lines):
        for dy, dx in line:
            kern[i, 0, 4 + dy, 4 + dx] = 1.0

    def sweep_conv(d):
        x = d[None, None]
        dn = jax.lax.conv_dimension_numbers(x.shape, kern.shape, ("NCHW", "OIHW", "NCHW"))
        sums = jax.lax.conv_general_dilated(
            x, jnp.asarray(kern), (1, 1), [(4, 4), (4, 4)],
            dimension_numbers=dn, precision=jax.lax.Precision.HIGHEST,
        )[0]
        return jnp.tensordot(jnp.asarray(wts), sums * sums, axes=1)

    for name, f in (("dyn", sweep_dyn), ("static", sweep_static), ("conv", sweep_conv)):
        fn = jax.jit(lambda b, f=f: jnp.stack([jnp.max(jax.vmap(f)(b))]))
        devs = [jax.block_until_ready(jnp.asarray(b)) for b in batches]
        out0 = np.asarray(fn(devs[0]))

        def t_of_k(k):
            t0 = time.perf_counter()
            out = None
            for i in range(k):
                out = fn(devs[i])
            _ = np.asarray(out[0])
            return time.perf_counter() - t0

        t2 = min(t_of_k(2) for _ in range(3))
        tk = min(t_of_k(kmax) for _ in range(3))
        slope = (tk - t2) / (kmax - 2)
        print(f"{name:8s} slope={slope * 1e3:7.2f} ms/batch{batch}  (out {out0[0]:.4f})")


if __name__ == "__main__":
    main()
