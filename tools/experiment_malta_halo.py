"""A/B: Malta kernel lane-halo strategy, kernel-alone, interleaved.

"slab" stages an explicit lane halo the 128-alignment inflates (wp_in 640
for 512px, +25% input DMA; 384 for 256px, +50%); "roll" keeps the input
block exactly wp lanes and synthesizes the dx shifts as in-kernel lane
rotations with wrap masking.

Measurement: host-staged per-dispatch timing through the tunnel proved
hopeless (stalls + a runtime that memoizes identical (executable, input)
executions + block_until_ready returning early).  Instead each timed unit
is ONE dispatch running a ``lax.scan`` chain of k Malta calls with a
serializing scalar perturbation between steps (distinct inputs each step,
nothing to memoize, no staging in the timed window).  The per-step
perturbation multiply (~0.4 ms of HBM traffic) is identical across
variants and cancels in the A/B.  Slope over chain lengths (4, 12)
cancels dispatch+RTT; min over 5 interleaved rounds per point.

Run: ``python tools/experiment_malta_halo.py``.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from codec_eval_tpu.kernels.butteraugli import (
        _MALTA_LINES_FULL,
        _MALTA_LINES_LF,
    )
    from codec_eval_tpu.kernels.pallas.malta import malta_ac_batch_pallas

    rng = np.random.default_rng(7)
    k_lo, k_hi = 4, 12

    @functools.partial(jax.jit, static_argnames=("halo", "k"))
    def chain(x, seed, halo, k):
        def body(carry, _):
            xs, s = carry
            y = malta_ac_batch_pallas(
                xs * (1.0 + 1e-12 * s),
                _MALTA_LINES_FULL,
                _MALTA_LINES_LF,
                halo=halo,
            )
            return (xs, y[0, 0, 0, 0]), None
        (_, s), _ = jax.lax.scan(body, (x, seed), None, length=k)
        return s

    for size in (512, 256):
        base = jax.block_until_ready(
            jnp.asarray(rng.normal(size=(25, 6, size, size)).astype(np.float32))
        )

        want = {h: np.asarray(
            malta_ac_batch_pallas(base, _MALTA_LINES_FULL, _MALTA_LINES_LF, halo=h)
        ) for h in ("slab", "roll")}
        np.testing.assert_array_equal(want["slab"], want["roll"])

        times = {h: {k_lo: [], k_hi: []} for h in ("slab", "roll")}
        seed = [0]
        for h in times:  # compile outside the timed region
            for k in (k_lo, k_hi):
                np.asarray(chain(base, jnp.float32(seed[0]), h, k))
        for rnd in range(5):
            if rnd:
                time.sleep(1.0)
            for h in times:
                for k in (k_lo, k_hi):
                    seed[0] += 1
                    t0 = time.perf_counter()
                    np.asarray(chain(base, jnp.float32(seed[0]), h, k))
                    times[h][k].append(time.perf_counter() - t0)
        for h, ts in times.items():
            slope = (min(ts[k_hi]) - min(ts[k_lo])) / (k_hi - k_lo)
            print(
                f"{size}px {h:5s}: {slope * 1e3:7.2f} ms/batch-25 "
                f"(incl ~0.4 ms perturbation)"
            )


if __name__ == "__main__":
    main()
