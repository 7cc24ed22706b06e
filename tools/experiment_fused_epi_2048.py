"""A/B: fused whole-diffmap epilogue vs unfused flow, BA-only chunk at 2048px.

Backs the round-5 default flip (butteraugli._fused_diffmap_ok): measured
61 vs 65-76 ms per chunk of 5 with identical scores (2026-08-21).  Every
(pre, cand) combo is unique across reps so the runtime's (executable,
input) memoization cannot corrupt the slope; the first rep is still
discarded (first-measurement stall).  Run with
CODEC_EVAL_MALTA_FUSED_EPI={auto,probe,0} to compare.
"""
import sys, time, os
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from bench import _photo
from codec_eval_tpu.engine.scoring import _build_chunk_scorer, _build_precompute

size, chunk = 2048, 5
kmax = 6
rng = np.random.default_rng(9)
refs = [_photo(size, size, 4000 + i) for i in range(kmax)]
base = refs[0]
cands = [jnp.asarray(np.ascontiguousarray(np.moveaxis(
    np.clip(base.astype(np.int16) + rng.integers(-8, 9, (chunk,)+base.shape), 0, 255).astype(np.uint8), -1, 1)))
    for _ in range(kmax)]
cands = [jax.block_until_ready(c) for c in cands]
_ = np.asarray(cands[-1][0,0,0,:1])
scorer = _build_chunk_scorer(size, size, chunk, False, False, True, False, planar=True)
pre_fn = _build_precompute(size, size, False, False, True, False)
pres = [jax.block_until_ready(pre_fn(jnp.asarray(r))) for r in refs]
out = scorer(pres[0], cands[0])
print("scores:", np.round(np.asarray(out["butteraugli"]), 4))
def slope(rep):
    # every (pre, cand) combo unique across ALL reps -> no memoization
    ts = {}
    for k in (2, kmax):
        t0 = time.perf_counter()
        o = None
        for i in range(k):
            o = scorer(pres[(i + 2 * rep) % kmax], cands[(2 * i + rep) % kmax])
        _ = np.asarray(next(iter(o.values()))[0])
        ts[k] = time.perf_counter() - t0
    return (ts[kmax]-ts[2])/(kmax-2)*1e3
vals = [slope(r) for r in range(3)]
print(f"BA chunk [{os.environ.get('CODEC_EVAL_MALTA_FUSED_EPI','auto')}]: " + " ".join(f"{v:7.2f}" for v in vals) + " ms")
