"""Stage-level cost breakdown of the Butteraugli kernel (slope method).

Variants skip one stage at a time; the cost of a stage is the delta vs the
full pipeline.  All variants are jit(vmap) over a batch of 25 candidates vs
one precomputed reference at 512px, timed by enqueueing k dispatches of
pre-staged device inputs and fetching one scalar at the end.
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

    size, batch = 512, 25
    ref = _photo(size, size, 1)
    rng = np.random.default_rng(5)
    kmax = 8
    batches = [
        np.clip(
            ref.astype(np.int16) + rng.integers(-8, 9, (batch,) + ref.shape),
            0, 255,
        ).astype(np.uint8)
        for _ in range(kmax)
    ]

    pre = ba.precompute_butteraugli_reference(jnp.asarray(ref))
    pre = jax.tree_util.tree_map(
        lambda x: jax.block_until_ready(x) if hasattr(x, "block_until_ready") else x,
        pre,
    )
    params = ba.ButteraugliParams.default()
    it = jnp.float32(params.intensity_target)

    def pi_of(d_u8, sub=False):
        lin = jnp.moveaxis(srgb_u8_to_linear(d_u8), -1, 0)
        if sub:
            lin = ba._subsample2x(lin)
        return ba._separate_frequencies(ba._opsin_dynamics(lin * it))

    def diffmap_variant(pi0, pi1, malta=True, mask=True, l2=True):
        a = jnp.float32(params.hf_asymmetry)
        sqrt_a = jnp.sqrt(a)
        zero = jnp.zeros_like(pi1.uhf[0])
        ac0 = zero
        ac1 = zero
        if malta:
            ac1 = ba._malta_diff_map(
                pi0.uhf[1], pi1.uhf[1], ba._W_UHF_MALTA * a, ba._W_UHF_MALTA / a,
                ba._NORM1_UHF, ba._MALTA_MULLI, ba._MALTA_LINES_FULL)
            ac0 = ba._malta_diff_map(
                pi0.uhf[0], pi1.uhf[0], ba._W_UHF_MALTA_X * a, ba._W_UHF_MALTA_X / a,
                ba._NORM1_UHF_X, ba._MALTA_MULLI, ba._MALTA_LINES_FULL)
            ac1 = ac1 + ba._malta_diff_map(
                pi0.hf[1], pi1.hf[1], ba._W_HF_MALTA * sqrt_a, ba._W_HF_MALTA / sqrt_a,
                ba._NORM1_HF, ba._MALTA_MULLI_LF, ba._MALTA_LINES_LF)
            ac0 = ac0 + ba._malta_diff_map(
                pi0.hf[0], pi1.hf[0], ba._W_HF_MALTA_X * sqrt_a, ba._W_HF_MALTA_X / sqrt_a,
                ba._NORM1_HF_X, ba._MALTA_MULLI_LF, ba._MALTA_LINES_LF)
            ac1 = ac1 + ba._malta_diff_map(
                pi0.mf[1], pi1.mf[1], ba._W_MF_MALTA, ba._W_MF_MALTA,
                ba._NORM1_MF, ba._MALTA_MULLI_LF, ba._MALTA_LINES_LF)
            ac0 = ac0 + ba._malta_diff_map(
                pi0.mf[0], pi1.mf[0], ba._W_MF_MALTA_X, ba._W_MF_MALTA_X,
                ba._NORM1_MF_X, ba._MALTA_MULLI_LF, ba._MALTA_LINES_LF)
        if l2:
            ac0 = ac0 + ba._l2_diff_asymmetric(
                pi0.hf[0], pi1.hf[0], ba._WMUL[0] * a, ba._WMUL[0] / a)
            ac1 = ac1 + ba._l2_diff_asymmetric(
                pi0.hf[1], pi1.hf[1], ba._WMUL[1] * a, ba._WMUL[1] / a)
        d_mf = pi0.mf - pi1.mf
        ac = jnp.stack([ac0, ac1, jnp.zeros_like(ac0)], axis=0)
        ac = ac + jnp.asarray(ba._WMUL[3:6], jnp.float32)[:, None, None] * d_mf * d_mf
        d_lf = pi0.lf - pi1.lf
        dc = jnp.asarray(ba._WMUL[6:9], jnp.float32)[:, None, None] * d_lf * d_lf
        if mask:
            m, mdac = ba._mask_psycho_image(pi0, pi1)
            ac = ac.at[1].add(mdac)
            maskval, dc_maskval = ba._mask_y(m), ba._mask_dc_y(m)
        else:
            maskval = dc_maskval = jnp.float32(1e-3)
        total = dc_maskval * (dc[0] + dc[1] + dc[2]) + maskval * (
            ac[0] + ac[1] + ac[2])
        return jnp.sqrt(jnp.maximum(total, 0.0))

    def make(malta=True, mask=True, sep_only=False, full_res_only=False):
        def one(d_u8):
            pi1 = pi_of(d_u8)
            if sep_only:
                s = sum(jnp.sum(p) for p in pi1)
                pi1s = pi_of(d_u8, sub=True)
                return s + sum(jnp.sum(p) for p in pi1s)
            r = diffmap_variant(pre.pi0_full, pi1, malta=malta, mask=mask)
            if not full_res_only:
                pi1s = pi_of(d_u8, sub=True)
                rs = diffmap_variant(pre.pi0_sub, pi1s, malta=malta, mask=mask)
                r = ba._add_supersampled2x(r, rs)
            return jnp.max(r)

        return jax.jit(lambda b: jax.vmap(one)(b))

    variants = {
        "full": make(),
        "no_malta": make(malta=False),
        "no_mask": make(mask=False),
        "sep_only": make(sep_only=True),
        "full_res_only": make(full_res_only=True),
    }

    for name, fn in variants.items():
        devs = [jax.block_until_ready(jnp.asarray(b)) for b in batches]
        _ = np.asarray(fn(devs[0]))  # compile

        def t_of_k(k):
            t0 = time.perf_counter()
            out = None
            for i in range(k):
                out = fn(devs[i])
            _ = np.asarray(out[0])
            return time.perf_counter() - t0

        t2 = min(t_of_k(2) for _ in range(3))
        tk = min(t_of_k(kmax) for _ in range(3))
        slope = (tk - t2) / (kmax - 2)
        print(f"{name:15s} slope={slope * 1e3:7.1f} ms/batch{batch}")


if __name__ == "__main__":
    main()
