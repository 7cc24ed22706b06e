"""Dispatch-structure experiments for the dense-sweep scorer.

Through the remote tunnel each dispatch carries a large fixed latency, so
the sweep's 16 dispatches/rep (4 images x 4 codec chunks of 25) may be
paying more in round trips than in compute.  Compare:

  A. 4 dispatches of batch=25 per image (current bench structure)
  B. 1 dispatch of batch=100 per image (direct vmap)
  C. 1 dispatch per image, lax.map over 4 chunks of 25 inside the program
  D. 1 dispatch for ALL 4 images (vmap over images of C)
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
    from codec_eval_tpu.engine.scoring import _build_scorer

    size, chunk, nchunks, nimg = 512, 25, 4, 4
    refs = np.stack([_photo(size, size, 100 + i) for i in range(nimg)])
    rng = np.random.default_rng(3)
    cands = np.stack(
        [
            np.clip(
                refs[i].astype(np.int16) + rng.integers(-8, 9, refs[i].shape),
                0, 255,
            ).astype(np.uint8)
            for i in range(nimg)
            for _ in range(chunk * nchunks)
        ]
    ).reshape(nimg, nchunks, chunk, size, size, 3)
    total_pairs = nimg * nchunks * chunk

    scorer25 = _build_scorer(size, size, chunk, True, True, True, True, False)

    def timed(fn, reps=3, tag=""):
        fn()  # compile/warm
        best = float("inf")
        for rep in range(reps):
            cands[0, 0, 0, rep, 0, 0] ^= 1
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{tag:34s} {best * 1e3:8.1f} ms  {total_pairs / best:8.1f} pairs/s")
        return best

    # A: 16 dispatches (transfer per chunk, async pipelined).
    def run_a():
        outs = [
            scorer25(jnp.asarray(refs[i]), jnp.asarray(cands[i, c]))
            for i in range(nimg)
            for c in range(nchunks)
        ]
        return [np.asarray(v) for o in outs for v in o.values()]

    timed(run_a, tag="A: 16 dispatches batch=25")

    # B: 4 dispatches of batch=100.
    try:
        scorer100 = _build_scorer(size, size, chunk * nchunks, True, True, True, True, False)

        def run_b():
            outs = [
                scorer100(
                    jnp.asarray(refs[i]),
                    jnp.asarray(cands[i].reshape(-1, size, size, 3)),
                )
                for i in range(nimg)
            ]
            return [np.asarray(v) for o in outs for v in o.values()]

        timed(run_b, tag="B: 4 dispatches batch=100")
    except Exception as e:
        print("B failed:", str(e)[:200])

    # C: 4 dispatches, lax.map over chunks inside.
    def make_mapped():
        inner = _build_scorer.__wrapped__(size, size, chunk, True, True, True, True, False)

        @jax.jit
        def mapped(ref, chunks_u8):  # (nchunks, chunk, H, W, 3)
            return jax.lax.map(lambda c: inner(ref, c), chunks_u8)

        return mapped

    mapped = make_mapped()
    try:
        def run_c():
            outs = [mapped(jnp.asarray(refs[i]), jnp.asarray(cands[i])) for i in range(nimg)]
            return [np.asarray(v) for o in outs for v in o.values()]

        timed(run_c, tag="C: 4 dispatches lax.map(4x25)")
    except Exception as e:
        print("C failed:", str(e)[:200])

    # D: single dispatch for everything.
    try:
        inner = _build_scorer.__wrapped__(size, size, chunk, True, True, True, True, False)

        @jax.jit
        def run_all_fn(refs_u8, cands_u8):  # (nimg,H,W,3), (nimg,nchunks,chunk,H,W,3)
            def per_image(ref, chunks_u8):
                return jax.lax.map(lambda c: inner(ref, c), chunks_u8)
            return jax.lax.map(lambda rc: per_image(rc[0], rc[1]), (refs_u8, cands_u8))

        def run_d():
            outs = run_all_fn(jnp.asarray(refs), jnp.asarray(cands))
            return [np.asarray(v) for v in outs.values()]

        timed(run_d, tag="D: 1 dispatch lax.map(4img x 4x25)")
    except Exception as e:
        print("D failed:", str(e)[:200])


if __name__ == "__main__":
    main()
