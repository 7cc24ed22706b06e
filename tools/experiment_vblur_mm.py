"""A/B: vertical blur in the batched SSIM2 features kernel on MXU vs VPU.

The per-step VPU budget is dominated by the 15-tap vertical FIR applied to
the three moment products (45 plane-ops).  A banded (tile, slab_rows)
operator matmul does the same contraction on the MXU in one dot per
product, freeing the VPU for the maps.

Run: ``python tools/experiment_vblur_mm.py``.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from codec_eval_tpu.kernels.blur import gaussian_taps
    from codec_eval_tpu.kernels.pallas import scale_features as sf

    sigma = 1.5
    taps = tuple(float(t) for t in gaussian_taps(sigma))
    r = len(taps) // 2

    def vop(tile, slab_rows):
        """Banded (tile, slab_rows) vertical-blur operator (f32)."""
        m = np.zeros((tile, slab_rows), np.float32)
        for i in range(tile):
            for j, t in enumerate(taps):
                m[i, i + j] = t
        return m

    def kernel_mm(
        x1_hbm, x2_hbm, mu1_ref, s11_ref, t_top_ref, t_mid_ref, t_bot_ref,
        vop_ref,
        d1_ref, d4_ref, a1_ref, a4_ref, l1_ref, l4_ref,
        ref_slab, slab2, sems,
        *, tile, slab_rows, valid_w, valid_h, n_cand,
    ):
        c = pl.program_id(0)
        t = pl.program_id(1)
        n = pl.program_id(2)
        nt = pl.num_programs(1)
        k = (c * nt + t) * n_cand + n
        total = pl.num_programs(0) * nt * n_cand
        slot = jax.lax.rem(k, 2)
        next_slot = jax.lax.rem(k + 1, 2)
        row0 = t * tile

        def cand_dma(kk, slot_idx):
            cc = jax.lax.div(kk, nt * n_cand)
            rest = jax.lax.rem(kk, nt * n_cand)
            tt = jax.lax.div(rest, n_cand)
            nn = jax.lax.rem(rest, n_cand)
            return pltpu.make_async_copy(
                x2_hbm.at[nn, cc, pl.ds(tt * tile, slab_rows), :],
                slab2.at[slot_idx],
                sems.at[slot_idx, 0],
            )

        @pl.when(k == 0)
        def _():
            cand_dma(k, slot).start()

        @pl.when(n == 0)
        def _():
            pltpu.make_async_copy(
                x1_hbm.at[c, pl.ds(row0, slab_rows), :], ref_slab,
                sems.at[0, 1],
            ).start()

        @pl.when(k + 1 < total)
        def _():
            cand_dma(k + 1, next_slot).start()

        cand_dma(k, slot).wait()

        @pl.when(n == 0)
        def _():
            pltpu.make_async_copy(
                x1_hbm.at[c, pl.ds(row0, slab_rows), :], ref_slab,
                sems.at[0, 1],
            ).wait()

        x1s = ref_slab[...]
        x2s = slab2[slot]
        x1 = x1s[r : r + tile, :]
        x2 = x2s[r : r + tile, :]
        mu1 = mu1_ref[0]
        s11 = s11_ref[0]

        dot = lambda a, b: jax.lax.dot(
            a, b, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        vb = lambda p: dot(vop_ref[...], p)
        hblur = lambda v: sf._hblur_mm(
            v, t_top_ref[...], t_mid_ref[...], t_bot_ref[...]
        )
        mu2 = hblur(vb(x2s))
        s22 = hblur(vb(x2s * x2s))
        s12 = hblur(vb(x1s * x2s))

        mu11 = mu1 * mu1
        mu22 = mu2 * mu2
        mu12 = mu1 * mu2
        mu_diff = mu1 - mu2
        num_m = 1.0 - mu_diff * mu_diff
        num_s = 2.0 * (s12 - mu12) + sf.C2
        denom_s = (s11 - mu11) + (s22 - mu22) + sf.C2
        d = jnp.maximum(1.0 - (num_m * num_s) / denom_s, 0.0)

        detail1 = jnp.abs(x1 - mu1)
        detail2 = jnp.abs(x2 - mu2)
        ed = (1.0 + detail2) / (1.0 + detail1) - 1.0
        artifact = jnp.maximum(ed, 0.0)
        detail_lost = jnp.maximum(-ed, 0.0)

        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        row = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0) + row0
        mask = jnp.logical_and(col < valid_w, row < valid_h).astype(d.dtype)
        d = d * mask
        artifact = artifact * mask
        detail_lost = detail_lost * mask

        d1_ref[n, c, t] = jnp.sum(d)
        d4_ref[n, c, t] = jnp.sum(d * d * d * d)
        a1_ref[n, c, t] = jnp.sum(artifact)
        a4_ref[n, c, t] = jnp.sum(artifact**4)
        l1_ref[n, c, t] = jnp.sum(detail_lost)
        l4_ref[n, c, t] = jnp.sum(detail_lost**4)

    @functools.partial(jax.jit, static_argnames=())
    def run_mm(xyb1, mu1, s11, xyb2_batch):
        c, h, w = xyb1.shape
        n_cand = xyb2_batch.shape[0]
        tile = min(sf.TILE_H_MM, ((h + 7) // 8) * 8)
        hp = ((h + tile - 1) // tile) * tile
        slab_rows = ((tile + 2 * r + 7) // 8) * 8
        bottom = (slab_rows - tile - r) + (hp - h)
        wp = ((w + 127) // 128) * 128
        pad_halo = ((0, 0), (r, bottom), (0, wp - w))
        x1p = jnp.pad(xyb1, pad_halo)
        x2p = jnp.pad(xyb2_batch, ((0, 0),) + pad_halo)
        pad_tile = ((0, 0), (0, hp - h), (0, wp - w))
        mu1p = jnp.pad(mu1, pad_tile)
        s11p = jnp.pad(s11, pad_tile)
        nt = hp // tile
        kernel = functools.partial(
            kernel_mm, tile=tile, slab_rows=slab_rows,
            valid_w=w, valid_h=h, n_cand=n_cand,
        )
        t_top, t_mid, t_bot = (
            jnp.asarray(m) for m in sf._block_tridiag_ops(sigma)
        )
        vmat = jnp.asarray(vop(tile, slab_rows))
        sum_shape = jax.ShapeDtypeStruct((n_cand, c, nt), jnp.float32)
        sum_spec = pl.BlockSpec(
            (n_cand, c, nt), lambda ci, ti, ni: (0, 0, 0),
            memory_space=pltpu.SMEM,
        )
        tile_spec = pl.BlockSpec(
            (1, tile, wp), lambda ci, ti, ni: (ci, ti, 0),
            memory_space=pltpu.VMEM,
        )
        op_spec = pl.BlockSpec(
            (128, 128), lambda ci, ti, ni: (0, 0), memory_space=pltpu.VMEM
        )
        vop_spec = pl.BlockSpec(
            (tile, slab_rows), lambda ci, ti, ni: (0, 0),
            memory_space=pltpu.VMEM,
        )
        sums = pl.pallas_call(
            kernel,
            grid=(c, nt, n_cand),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                tile_spec, tile_spec, op_spec, op_spec, op_spec, vop_spec,
            ],
            out_specs=tuple(sum_spec for _ in range(6)),
            out_shape=tuple(sum_shape for _ in range(6)),
            scratch_shapes=[
                pltpu.VMEM((slab_rows, wp), jnp.float32),
                pltpu.VMEM((2, slab_rows, wp), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )(x1p, x2p, mu1p, s11p, t_top, t_mid, t_bot, vmat)
        nn = jnp.float32(h * w)
        d1, d4, a1, a4, l1, l4 = (s.sum(axis=2) for s in sums)
        return jnp.stack(
            [
                jnp.stack([d1 / nn, a1 / nn, l1 / nn], axis=-1),
                jnp.stack(
                    [
                        jnp.sqrt(jnp.sqrt(d4 / nn)),
                        jnp.sqrt(jnp.sqrt(a4 / nn)),
                        jnp.sqrt(jnp.sqrt(l4 / nn)),
                    ],
                    axis=-1,
                ),
            ],
            axis=2,
        )

    @jax.jit
    def run_prod(xyb1, mu1, s11, xyb2_batch):
        return sf.scale_features_pallas_batch(
            xyb1, mu1, s11, xyb2_batch, sigma=sigma
        )

    rng = np.random.default_rng(23)
    kmax = 8
    h = w = 512
    xyb1 = jnp.asarray(rng.random((3, h, w)).astype(np.float32))
    from codec_eval_tpu.kernels.blur import blur_separable

    stacked = jnp.concatenate([xyb1, xyb1 * xyb1], axis=0)
    blurred = blur_separable(stacked, sigma)
    mu1, s11 = blurred[:3], blurred[3:]
    cands = [
        jnp.asarray(rng.random((25, 3, h, w)).astype(np.float32))
        for _ in range(kmax)
    ]
    args = [jax.block_until_ready(x) for x in (xyb1, mu1, s11)]
    cands = [jax.block_until_ready(c) for c in cands]

    ref_out = None
    for name, fn in (("prod(vpu-vblur)", run_prod), ("mm-vblur", run_mm)):
        out = np.asarray(fn(*args, cands[0]))
        if ref_out is None:
            ref_out = out
        else:
            diff = np.max(np.abs(out - ref_out) / (np.abs(ref_out) + 1e-6))
            print(f"{name}: max rel diff = {diff:.2e}")
        best = float("inf")
        for _ in range(3):
            ts = {}
            for k in (2, kmax):
                t0 = time.perf_counter()
                o = None
                for i in range(k):
                    o = fn(*args, cands[i])
                np.asarray(o)[:1]
                ts[k] = time.perf_counter() - t0
            best = min(best, (ts[kmax] - ts[2]) / (kmax - 2))
        print(f"{name:18s} slope {best * 1e3:7.3f} ms/dispatch")


if __name__ == "__main__":
    main()
