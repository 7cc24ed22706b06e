"""Sub-resolution branch breakdown of butteraugli_batch (prefix deltas).

Same cumulative-prefix slope method as profile_ba_batch_stages.py (the
variant-in-isolation method in experiment_subres.py proved unusable: chip
throughput phase drift dominates sub-millisecond stages measured far apart
in time).  All prefixes include the full-resolution pipeline; deltas
therefore isolate the sub-res components.

Run: ``python tools/profile_subres_stages.py [size] [batch]``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def slope(fn, inputs, kmax=8):
    import jax

    ts = {}
    for k in (2, kmax):
        t0 = time.perf_counter()
        out = None
        for i in range(k):
            out = fn(inputs[i])
        np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[:1]
        ts[k] = time.perf_counter() - t0
    return (ts[kmax] - ts[2]) / (kmax - 2)


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from bench import _photo
    from codec_eval_tpu.kernels import butteraugli as ba
    from codec_eval_tpu.kernels.color import srgb_u8_to_linear

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    ref = _photo(size, size, 1)
    rng = np.random.default_rng(7)
    kmax = 8
    batches = [
        np.clip(
            ref.astype(np.int16) + rng.integers(-8, 9, (batch,) + ref.shape),
            0, 255,
        ).astype(np.uint8)
        for _ in range(kmax)
    ]

    pre = ba.precompute_butteraugli_reference(jnp.asarray(ref))
    pre = jax.block_until_ready(pre)
    params = ba.ButteraugliParams.default()
    it = jnp.float32(params.intensity_target)
    hf_a = params.hf_asymmetry
    pi0f, pi0s = pre.pi0_full, pre.pi0_sub

    def lin_of(b):
        return jax.vmap(
            lambda d: jnp.moveaxis(srgb_u8_to_linear(d), -1, 0)
        )(b)

    def full_res(b):
        lin = lin_of(b)
        pi1 = ba._psycho_batch(lin * it)
        stacks = jax.vmap(lambda p1: ba._malta_diffs_stack(pi0f, p1, hf_a))(pi1)
        ac = ba._malta_ac_batch(stacks)
        maps = jax.vmap(
            lambda p1, a: ba._diffmap_psycho(
                pi0f, p1, hf_a, params.xmul, malta_ac=a, mask_pre=pre.mask_full
            )
        )(pi1, ac)
        return lin, maps

    def p_full(b):
        return full_res(b)[1]

    def p_sub_sample(b):
        lin, maps = full_res(b)
        return maps, jax.vmap(ba._subsample2x)(lin)

    def p_sub_psycho(b):
        lin, maps = full_res(b)
        sub = jax.vmap(ba._subsample2x)(lin)
        return maps, ba._psycho_batch(sub * it)

    def p_sub_stack(b):
        lin, maps = full_res(b)
        sub = jax.vmap(ba._subsample2x)(lin)
        pi1 = ba._psycho_batch(sub * it)
        return maps, jax.vmap(
            lambda p1: ba._malta_diffs_stack(pi0s, p1, hf_a)
        )(pi1)

    def p_sub_malta(b):
        lin, maps = full_res(b)
        sub = jax.vmap(ba._subsample2x)(lin)
        pi1 = ba._psycho_batch(sub * it)
        stacks = jax.vmap(
            lambda p1: ba._malta_diffs_stack(pi0s, p1, hf_a)
        )(pi1)
        return maps, ba._malta_ac_batch(stacks)

    def p_both(b):
        return ba.butteraugli_batch(pre, b, hf_a)

    stages = [
        ("full-res only", p_full),
        ("+subsample2x", p_sub_sample),
        ("+sub psycho @%d" % (size // 2), p_sub_psycho),
        ("+sub malta stack", p_sub_stack),
        ("+sub malta sweep", p_sub_malta),
        ("full both-res (epilogue incl.)", p_both),
    ]

    devs = [jax.block_until_ready(jnp.asarray(b)) for b in batches]
    prev = 0.0
    for name, fn in stages:
        def scalar_fn(b, fn=fn):
            out = fn(b)
            return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out))

        jfn = jax.jit(scalar_fn)
        jax.block_until_ready(jfn(devs[0]))
        cost = slope(jfn, devs, kmax)
        print(
            f"{name:36s} {cost * 1e3:7.2f} ms  (+{(cost - prev) * 1e3:6.2f})"
        )
        prev = cost


if __name__ == "__main__":
    main()
