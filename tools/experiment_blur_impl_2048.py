"""A/B: MXU banded-matmul blur vs Pallas FIR kernel at 2048px, per sigma.

Backs the round-5 blur routing (butteraugli._blur_batch): sigma-7.16
(33 taps) measured 8.6 ms banded vs 10.9 ms Pallas (VPU-bound ~1 TFLOP/s
-> stays on the MXU); sigma-2.7 (13 taps) wins 1.5-1.8x in Pallas.
On-device salting keeps every execution's inputs distinct (the remote
runtime memoizes identical (executable, input) pairs).
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from codec_eval_tpu.kernels import butteraugli as ba
from codec_eval_tpu.kernels.pallas.blur import blur_batch_pallas

size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 5
kmax = 8
rng = np.random.default_rng(3)
base = jax.block_until_ready(jnp.asarray(rng.random((batch,3,size,size)).astype(np.float32)))
salts = [jax.block_until_ready(jnp.float32(1e-6 * i)) for i in range(100)]
_ = np.asarray(base[0,0,0,:1])
salt_i = iter(range(100))

def slope(fn):
    jax.block_until_ready(fn(base, salts[next(salt_i)]))
    best = np.inf
    for _ in range(2):
        ts = {}
        for k in (2, kmax):
            t0 = time.perf_counter()
            out = None
            for i in range(k):
                out = fn(base, salts[next(salt_i)])
            _ = np.asarray(out.ravel()[:1])
            ts[k] = time.perf_counter() - t0
        best = min(best, (ts[kmax]-ts[2])/(kmax-2))
    return best*1e3

for sigma, name in [(ba.SIGMA_LF, "sigma7.16"), (ba.SIGMA_MASK, "sigma2.7")]:
    xla = jax.jit(lambda x, s, sg=sigma: jnp.sum(jax.vmap(lambda p: ba._blur(p, sg))(x + s), axis=(1,2,3)))
    pal = jax.jit(lambda x, s, sg=sigma: jnp.sum(blur_batch_pallas(x + s, sg), axis=(1,2,3)))
    t_x = slope(xla); t_p = slope(pal)
    # interleaved second sample
    t_x2 = slope(xla); t_p2 = slope(pal)
    print(f"{name}: xla {t_x:7.2f}/{t_x2:7.2f} ms   pallas {t_p:7.2f}/{t_p2:7.2f} ms")
