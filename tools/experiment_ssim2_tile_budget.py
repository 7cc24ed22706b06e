"""A/B: SSIM2 scale-kernel row-tile budget (CODEC_EVAL_SSIM2_TILE_BUDGET).

Backs the round-5 default widening 96*512 -> 96*1024: SSIM2-only chunk of
5 at 2048px measured 16.9-17.2 -> 14.8-14.9 ms (identical scores); 800px
measured a wash across reversed-order pairs.  Usage:
CODEC_EVAL_SSIM2_TILE_BUDGET=49152 python tools/experiment_ssim2_tile_budget.py 2048 5
"""
import sys, time, os
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from bench import _photo
from codec_eval_tpu.engine.scoring import _build_chunk_scorer, _build_precompute

size = int(sys.argv[1]); chunk = int(sys.argv[2])
kmax = 6
rng = np.random.default_rng(9)
refs = [_photo(size, size, 4500 + i) for i in range(kmax)]
base = refs[0]
cands = [jax.block_until_ready(jnp.asarray(np.ascontiguousarray(np.moveaxis(
    np.clip(base.astype(np.int16) + rng.integers(-8, 9, (chunk,)+base.shape), 0, 255).astype(np.uint8), -1, 1))))
    for _ in range(kmax)]
_ = np.asarray(cands[-1][0,0,0,:1])
scorer = _build_chunk_scorer(size, size, chunk, False, True, False, False, planar=True)
pre_fn = _build_precompute(size, size, False, True, False, False)
pres = [jax.block_until_ready(pre_fn(jnp.asarray(r))) for r in refs]
o = scorer(pres[0], cands[0]); v = np.asarray(o["ssimulacra2"])
def slope(rep):
    ts = {}
    for k in (2, kmax):
        t0 = time.perf_counter()
        o = None
        for i in range(k):
            o = scorer(pres[(i + 2*rep + 1) % kmax], cands[(3*i + rep) % kmax])
        _ = np.asarray(next(iter(o.values()))[0])
        ts[k] = time.perf_counter() - t0
    return (ts[kmax]-ts[2])/(kmax-2)*1e3
vals = [slope(r) for r in range(3)]
print(f"s2-only {size}/{chunk} [budget={os.environ.get('CODEC_EVAL_SSIM2_TILE_BUDGET','default')}]: "
      + " ".join(f"{x:6.2f}" for x in vals) + f" ms; scores[:3]={np.round(v[:3],4)}")
