"""2048px (CLIC-class) cost breakdown: precompute vs per-metric chunks.

VERDICT r4 #3: the 2048px all-metric number sat at ~36 pairs/s across two
rounds while a claimed 4.6x freqsep-stage win landed — nothing reconciles
the stage story with the end-to-end number.  This tool decomposes the
bench's exact workload (one reference precompute + ladder chunks of 5
planar candidates) into:

- the reference precompute dispatch (amortized over only 10 pairs at
  2048px, vs 100 at 512px — a 10x worse amortization),
- each single-metric chunk program (psnr / dssim / ssimulacra2 /
  butteraugli) and the all-metric chunk,

using the slope method (delta between 2- and k-dispatch chains over
pre-staged distinct inputs) so tunnel RTTs cancel.

Run on the chip: ``python tools/profile_large_breakdown.py [size] [chunk]``.
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
    from codec_eval_tpu.engine.scoring import (
        _build_chunk_scorer,
        _build_precompute,
    )

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    kmax = 6

    refs = [_photo(size, size, 4000 + i) for i in range(kmax)]
    rng = np.random.default_rng(9)
    cand_chunks = [
        np.ascontiguousarray(
            np.moveaxis(
                np.clip(
                    refs[0].astype(np.int16)
                    + rng.integers(-8, 9, (chunk,) + refs[0].shape),
                    0, 255,
                ).astype(np.uint8),
                -1, 1,
            )
        )
        for _ in range(kmax)
    ]
    refs_dev = [jax.block_until_ready(jnp.asarray(r)) for r in refs]
    cands_dev = [jax.block_until_ready(jnp.asarray(c)) for c in cand_chunks]
    _ = np.asarray(cands_dev[-1][0, 0, 0, :1])  # drain transfers

    def slope(fn, inputs):
        ts = {}
        for k in (2, kmax):
            t0 = time.perf_counter()
            out = None
            for i in range(k):
                out = fn(inputs[i])
            _ = np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[:1]
            ts[k] = time.perf_counter() - t0
        return (ts[kmax] - ts[2]) / (kmax - 2)

    # Reference precompute (all-metric).
    pre_all = _build_precompute(size, size, True, True, True, False)
    jax.block_until_ready(pre_all(refs_dev[0]))
    pre_ms = slope(pre_all, refs_dev) * 1e3
    print(f"precompute (all-metric)      {pre_ms:8.2f} ms/image")

    configs = {
        "psnr": (False, False, False, True),
        "dssim": (True, False, False, False),
        "ssimulacra2": (False, True, False, False),
        "butteraugli": (False, False, True, False),
        "all": (True, True, True, True),
    }
    total_single = 0.0
    for name, (d, s2, ba, ps) in configs.items():
        scorer = _build_chunk_scorer(size, size, chunk, d, s2, ba, ps,
                                     planar=True)
        pre_fn = _build_precompute(size, size, d, s2, ba, False)
        pre = jax.block_until_ready(pre_fn(refs_dev[0]))
        jax.block_until_ready(scorer(pre, cands_dev[0]))  # compile
        ms = slope(lambda c: scorer(pre, c), cands_dev) * 1e3
        if name != "all":
            total_single += ms
        print(
            f"chunk {name:12s}           {ms:8.2f} ms/chunk{chunk} "
            f"({ms / chunk:6.2f} ms/pair)"
        )
    print(f"sum of single-metric chunks  {total_single:8.2f} ms/chunk{chunk}")

    # Bench-equivalent rate: pre + ladder of 10 pairs in chunks.
    scorer = _build_chunk_scorer(size, size, chunk, True, True, True, True,
                                 planar=True)
    n_chunks = max(1, 10 // chunk)
    t0 = time.perf_counter()
    outs = []
    for i in range(2, kmax):
        p = pre_all(refs_dev[i])
        for c in range(n_chunks):
            outs.append(scorer(p, cands_dev[(i + c) % kmax]))
    _ = np.asarray(next(iter(outs[-1].values()))[0])
    wall = (time.perf_counter() - t0) / (kmax - 2)
    print(
        f"bench-equivalent ladder      {wall * 1e3:8.2f} ms/image "
        f"-> {n_chunks * chunk / wall:6.2f} pairs/s"
    )


if __name__ == "__main__":
    main()
