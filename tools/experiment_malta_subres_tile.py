"""Malta kernel row-tile sweep at the sub-res size (256px).

STATUS: INCONCLUSIVE — kept as a record of the instrument failure.

profile_subres_stages.py puts the sub-res Malta sweep at ~1.6 ms — well
above the ~0.95 ms that quarter-pixel scaling from the 3.8 ms full-res
sweep predicts, suggesting per-grid-step overhead (9 lane rotations per
channel per tile, restage) dominates at 256px with the tile-48 default.

Three slope formulations (distinct pre-staged inputs; a deterministic
chained carry; unique-per-measurement chained carries) ALL produced
consistently negative slopes at this granularity on the tunneled
backend: the remote runtime memoizes identical (executable, input)
executions, evicts/restages large idle buffers, and `block_until_ready`
can return before execution completes, so the first timed fetch absorbs
multi-second stalls.  The scorer-level chunk slope
(tools/experiment_malta_tile.py, 512px/50) is the trustworthy
instrument; its global tile optimum (48) already includes the sub-res
sweep's contribution.  Expected upside of a width-dependent tile was
<=0.5 ms of a 19 ms batch — not worth a kernel API change on this
evidence.

Run: ``python tools/experiment_malta_subres_tile.py [size]`` (parent)
     ``python tools/experiment_malta_subres_tile.py <size> <tile>`` (child)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def child(size: int) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from codec_eval_tpu.kernels import butteraugli as ba
    from codec_eval_tpu.kernels.pallas.malta import malta_ac_batch_pallas

    # Chained iterations (input i+1 perturbed by output i) so neither the
    # remote runtime's (executable, input) memoization nor input eviction/
    # restaging can fake the timing; one device-resident carry, one final
    # scalar fetch.  The perturbation add is negligible next to the sweep.
    batch = 25
    rng = np.random.default_rng(11)
    base = jax.block_until_ready(
        jnp.asarray(
            rng.normal(0, 1, (batch, 6, size, size)).astype(np.float32)
        )
    )
    lines_full, lines_lf = ba._MALTA_LINES_FULL, ba._MALTA_LINES_LF

    @jax.jit
    def step(d):
        out = malta_ac_batch_pallas(d, lines_full, lines_lf)
        bump = 1e-6 * jnp.tanh(out)
        d = d.at[:, :2].add(bump)
        return d

    d = jax.block_until_ready(step(base))
    best = float("inf")
    idx = 0
    for _ in range(3):
        ts = {}
        for k in (2, 10):
            # Unique chain per measurement: identical (executable, input)
            # re-executions are memoized by the remote runtime.
            idx += 1
            d = jax.block_until_ready(base * (1.0 + 1e-3 * idx))
            t0 = time.perf_counter()
            for _ in range(k):
                d = step(d)
            np.asarray(d[0, 0, 0, :1])  # scalar fetch; RTT cancels in slope
            ts[k] = time.perf_counter() - t0
        best = min(best, (ts[10] - ts[2]) / 8)
    tile = os.environ.get("CODEC_EVAL_MALTA_TILE", "default")
    print(f"size {size} tile {tile:>7s}: {best * 1e3:7.2f} ms", flush=True)


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    if len(sys.argv) > 2:
        child(size)
        return
    for tile in (24, 48, 96, 128, 0):
        env = dict(os.environ)
        if tile:
            env["CODEC_EVAL_MALTA_TILE"] = str(tile)
        else:
            env.pop("CODEC_EVAL_MALTA_TILE", None)
        subprocess.run(
            [sys.executable, __file__, str(size), "child"],
            env=env,
            check=False,
        )


if __name__ == "__main__":
    main()
