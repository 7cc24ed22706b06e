"""Where does butteraugli's sub-resolution pass spend its time?

The 512px chunk-50 profile shows the sub-res branch costing ~8 ms while a
standalone 256px pipeline implies ~4.3 ms.  This times the components in
isolation (slope method, distinct pre-staged inputs): the 2x subsample of
the candidate batch, the 256px psycho stage, the 256px malta stack+sweep,
and the supersample+max epilogue.

Run: ``python tools/experiment_subres.py [batch]``.
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
    from codec_eval_tpu.kernels import butteraugli as ba
    from codec_eval_tpu.kernels.color import srgb_u8_to_linear

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    size = 512
    ref = _photo(size, size, 1)
    rng = np.random.default_rng(7)
    kmax = 6
    params = ba.ButteraugliParams.default()
    it = jnp.float32(params.intensity_target)
    hf_a = params.hf_asymmetry

    pre = ba.precompute_butteraugli_reference(jnp.asarray(ref))
    pre = jax.block_until_ready(pre)

    # Pre-staged full-res linear batches (the sub branch starts from these).
    def to_lin(b_u8):
        return jax.vmap(
            lambda d: jnp.moveaxis(srgb_u8_to_linear(d), -1, 0)
        )(b_u8)

    lin_full = [
        jax.block_until_ready(
            jax.jit(to_lin)(
                jnp.asarray(
                    np.clip(
                        ref.astype(np.int16)
                        + rng.integers(-8, 9, (batch,) + ref.shape),
                        0, 255,
                    ).astype(np.uint8)
                )
            )
        )
        for _ in range(kmax)
    ]
    lin_sub = [
        jax.block_until_ready(jax.jit(jax.vmap(ba._subsample2x))(l))
        for l in lin_full
    ]
    # Fake full-res result maps + sub maps for the epilogue test.
    res_full = [
        jax.block_until_ready(
            jnp.asarray(rng.normal(1, 0.2, (batch, size, size)).astype(np.float32))
        )
        for _ in range(kmax)
    ]
    res_sub = [
        jax.block_until_ready(
            jnp.asarray(
                rng.normal(1, 0.2, (batch, size // 2, size // 2)).astype(np.float32)
            )
        )
        for _ in range(kmax)
    ]

    pi0s = pre.pi0_sub

    # Each variant reduces to a scalar in-graph: fetching a multi-MB
    # tensor through the dev tunnel (~25 MB/s) would swamp the slope.
    @jax.jit
    def f_subsample(l):
        return jnp.sum(jax.vmap(ba._subsample2x)(l))

    @jax.jit
    def f_psycho256(ls):
        pi = ba._psycho_batch(ls * it)
        return sum(jnp.sum(x) for x in (pi.uhf, pi.hf, pi.mf, pi.lf))

    @jax.jit
    def f_sub_branch(ls):
        pi1 = ba._psycho_batch(ls * it)
        stacks = jax.vmap(
            lambda p1: ba._malta_diffs_stack(pi0s, p1, hf_a)
        )(pi1)
        ac = ba._malta_ac_batch(stacks)
        mask_pre = pre.mask_sub
        maps = jax.vmap(
            lambda p1, a: ba._diffmap_psycho(
                pi0s, p1, hf_a, params.xmul, malta_ac=a, mask_pre=mask_pre
            )
        )(pi1, ac)
        return jnp.max(maps, axis=(-2, -1))

    @jax.jit
    def f_epilogue(rf, rs):
        return jnp.max(jax.vmap(ba._add_supersampled2x)(rf, rs), axis=(-2, -1))

    # The remote runtime memoizes identical (executable, input) executions;
    # adding a fresh tiny scalar to the first arg on-device makes every call
    # a distinct input at a uniform ~0.4 ms/dispatch cost.
    import itertools

    counter = itertools.count(1)
    pert = jax.jit(lambda x, c: x + c)

    def slope(fn, inputs):
        ts = {}
        for k in (2, kmax):
            t0 = time.perf_counter()
            out = None
            for i in range(k):
                args = inputs[i]
                c = jnp.float32(1e-12 * next(counter))
                out = fn(pert(args[0], c), *args[1:])
            np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[:1]
            ts[k] = time.perf_counter() - t0
        return (ts[kmax] - ts[2]) / (kmax - 2)

    variants = [
        ("subsample2x (512->256)", f_subsample, [(l,) for l in lin_full]),
        ("psycho @256", f_psycho256, [(l,) for l in lin_sub]),
        ("full sub branch @256", f_sub_branch, [(l,) for l in lin_sub]),
        ("supersample+max epilogue", f_epilogue,
         list(zip(res_full, res_sub))),
    ]
    for name, fn, inputs in variants:  # compile + warm before timing
        out = fn(*inputs[0])
        np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[:1]
    best = {n: float("inf") for n, _, _ in variants}
    for _ in range(3):
        for name, fn, inputs in variants:
            best[name] = min(best[name], slope(fn, inputs))
    for name, _, _ in variants:
        print(f"{name:28s} {best[name] * 1e3:8.2f} ms/dispatch")


if __name__ == "__main__":
    main()
