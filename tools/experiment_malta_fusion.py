"""Test whether an elementwise prologue fused into the malta sweep gets
recomputed per offset read (and whether optimization_barrier prevents it)."""

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
        rng.normal(0, 1, (batch, 2, size, size)).astype(np.float32)
        for _ in range(kmax)
    ]
    lines = ba._MALTA_LINES_LF

    def prologue(a, b):
        # ~10 elementwise ops, like _malta_diff_map's asymmetry math.
        d = a - b
        den = 1.0 + 0.5 * (jnp.abs(a) + jnp.abs(b))
        x = d / den
        ts, tb = 0.55 * jnp.abs(a), 1.05 * jnp.abs(a)
        imp = jnp.where(b < ts, ts - b, jnp.where(b > tb, tb - b, 0.0)) / den
        return x + jnp.where(a >= 0, imp, -imp)

    def sweep(d):
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

    variants = {
        "fused": lambda ab: sweep(prologue(ab[0], ab[1])),
        "barrier": lambda ab: sweep(
            jax.lax.optimization_barrier(prologue(ab[0], ab[1]))
        ),
        "6x_fused": lambda ab: sum(
            jnp.max(sweep(prologue(ab[0] * (1.0 + 0.01 * i), ab[1])))
            for i in range(6)
        ),
        "6x_barrier": lambda ab: sum(
            jnp.max(
                sweep(
                    jax.lax.optimization_barrier(
                        prologue(ab[0] * (1.0 + 0.01 * i), ab[1])
                    )
                )
            )
            for i in range(6)
        ),
    }

    for name, f in variants.items():
        fn = jax.jit(lambda b, f=f: jnp.stack([jnp.max(jax.vmap(f)(b))]))
        devs = [jax.block_until_ready(jnp.asarray(b)) for b in batches]
        _ = np.asarray(fn(devs[0]))

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
        print(f"{name:12s} slope={slope * 1e3:7.2f} ms/batch{batch}")


if __name__ == "__main__":
    main()
