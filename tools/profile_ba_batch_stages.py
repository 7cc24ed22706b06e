"""Stage-level cost breakdown of butteraugli_batch (slope method).

Times *cumulative prefixes* of the batch pipeline (each prefix one jitted
program over pre-staged device inputs); a stage's cost is the delta between
consecutive prefixes.  Prefix boundaries match the real dataflow, so each
delta includes the HBM round trip the full program would also pay at that
boundary (the Pallas kernel boundaries are materialization points anyway).

Run: ``python tools/profile_ba_batch_stages.py [size] [batch]``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def slope(fn, inputs, kmax=8):
    """Per-dispatch cost of fn over distinct pre-staged inputs."""
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

    pi0 = pre.pi0_full

    def lin_of(batch_u8):
        return jax.vmap(
            lambda d: jnp.moveaxis(srgb_u8_to_linear(d), -1, 0)
        )(batch_u8) * it

    def p_linear(b):
        return lin_of(b)

    def p_psycho(b):
        return ba._psycho_batch(lin_of(b))

    def p_stack(b):
        pi1 = ba._psycho_batch(lin_of(b))
        return jax.vmap(lambda p1: ba._malta_diffs_stack(pi0, p1, hf_a))(pi1)

    def p_malta(b):
        pi1 = ba._psycho_batch(lin_of(b))
        stacks = jax.vmap(lambda p1: ba._malta_diffs_stack(pi0, p1, hf_a))(pi1)
        return ba._malta_ac_batch(stacks)

    def p_full(b):
        pi1 = ba._psycho_batch(lin_of(b))
        stacks = jax.vmap(lambda p1: ba._malta_diffs_stack(pi0, p1, hf_a))(pi1)
        ac = ba._malta_ac_batch(stacks)
        b0, mask = ba._mask_reference_side(pi0)
        mask_pre = (b0, ba._mask_y(mask), ba._mask_dc_y(mask))
        return jax.vmap(
            lambda p1, a: ba._diffmap_psycho(
                pi0, p1, hf_a, params.xmul, malta_ac=a, mask_pre=mask_pre
            )
        )(pi1, ac)

    def p_both_res(b):
        return ba.butteraugli_batch(pre, b, hf_a)

    stages = [
        ("u8->linear", p_linear),
        ("+psycho (opsin+LF+bands)", p_psycho),
        ("+malta diff stack", p_stack),
        ("+malta pallas sweep", p_malta),
        ("+mask/L2/epilogue (full res)", p_full),
        ("full both-res (= butteraugli_batch)", p_both_res),
    ]

    devs = [jax.block_until_ready(jnp.asarray(b)) for b in batches]
    prev = 0.0
    for name, fn in stages:
        # Reduce every output leaf to a scalar INSIDE the program: fetching
        # a full intermediate over the tunnel costs ~25 ms/MB and would
        # swamp the slope.
        def scalar_fn(b, fn=fn):
            out = fn(b)
            return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out))

        jfn = jax.jit(scalar_fn)
        jax.block_until_ready(jfn(devs[0]))  # compile
        cost = slope(jfn, devs, kmax)
        print(
            f"{name:40s} {cost * 1e3:7.2f} ms  (+{(cost - prev) * 1e3:6.2f})"
        )
        prev = cost


if __name__ == "__main__":
    main()
