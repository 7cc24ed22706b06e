"""A/B the bands kernel's row-tile size (VMEM-model-limited to 32 today).

The scoped-VMEM model in bands_batch_pallas assumes ~90 live (tile, wp_in)
temporaries (23.1 MB measured at tile=128/512px) and clamps tile to 32 at
512px.  This probes tile=64 (model says ~14.5 MB: tight but maybe under the
16 MB limit) against production, and a two-call split variant where stage 1
(sigma-3.22 blur) and stage 2 (sigma-1.56 chain) are separate kernels that
can each run at tile=128.

Run: ``python tools/experiment_bands_tile.py``.
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

    from codec_eval_tpu.kernels import butteraugli as ba
    from codec_eval_tpu.kernels.pallas import freqsep as fs

    rng = np.random.default_rng(17)
    kmax = 8
    xyb_list = [
        jnp.asarray(rng.normal(0, 1, (25, 3, 512, 512)).astype(np.float32))
        for _ in range(kmax)
    ]
    lf_list = [
        jnp.asarray(rng.normal(0, 1, (25, 3, 512, 512)).astype(np.float32))
        for _ in range(kmax)
    ]
    xyb_list = [jax.block_until_ready(x) for x in xyb_list]
    lf_list = [jax.block_until_ready(x) for x in lf_list]

    import functools

    def bands_with_tile(forced_tile):
        @jax.jit
        def run(xyb, lf):
            # Clone of bands_batch_pallas geometry with the tile forced.
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            consts = ba._BAND_CONSTS
            b, c, h, w = xyb.shape
            s332, s156 = 3.2248991, 1.5641633
            taps332, taps156 = fs._taps(s332), fs._taps(s156)
            r332, r156 = len(taps332) // 2, len(taps156) // 2
            halo = 16
            wp = ((w + 127) // 128) * 128
            wp_in = ((wp + 2 * halo + 127) // 128) * 128
            tile = forced_tile
            hp = ((h + tile - 1) // tile) * tile
            nt = hp // tile
            pad = ((0, 0), (0, 0), (halo, hp - h + halo), (halo, wp_in - w - halo))
            xyb_slabs = fs._overlap_slabs(jnp.pad(xyb, pad), tile, halo, hp)
            lf_slabs = fs._overlap_slabs(jnp.pad(lf, pad), tile, halo, hp)
            inner_rows = tile + 2 * (r156 + 1)
            inner_cols = wp + 2 * (r156 + 1)
            m = r156 + 1
            r332_full = np.zeros((hp + 2 * m, wp + 2 * m), np.float32)
            r332_full[m : m + h, m : m + w] = fs._recip_norm(h, w, s332)
            r332_slabs = np.stack(
                [r332_full[i * tile : i * tile + inner_rows, :inner_cols] for i in range(nt)]
            )
            r156_full = np.zeros((hp, wp), np.float32)
            r156_full[:h, :w] = fs._recip_norm(h, w, s156)
            r156_slabs = np.stack(
                [r156_full[i * tile : i * tile + tile, :wp] for i in range(nt)]
            )
            kernel = functools.partial(
                fs._bands_kernel, consts=consts, taps332=taps332,
                taps156=taps156, tile=tile, wp=wp, halo=halo,
            )
            out = pl.pallas_call(
                kernel,
                grid=(b, nt),
                in_specs=[
                    pl.BlockSpec(
                        (1, 3, 1, tile + 2 * halo, wp_in),
                        lambda bi, ti: (bi, 0, ti, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 3, 1, tile + 2 * halo, wp_in),
                        lambda bi, ti: (bi, 0, ti, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, inner_rows, inner_cols),
                        lambda bi, ti: (ti, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, tile, wp),
                        lambda bi, ti: (ti, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (1, 7, 1, tile, wp),
                    lambda bi, ti: (bi, 0, ti, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((b, 7, nt, tile, wp), jnp.float32),
            )(xyb_slabs, lf_slabs, jnp.asarray(r332_slabs), jnp.asarray(r156_slabs))
            out = out.reshape(b, 7, hp, wp)
            return jnp.sum(out[:, :, :h, :w], axis=(1, 2, 3))

        return run

    @jax.jit
    def run_prod(xyb, lf):
        out = fs.bands_batch_pallas(xyb, lf, ba._BAND_CONSTS)
        return jnp.sum(out, axis=(1, 2, 3))

    variants = [
        ("prod(tile=32)", run_prod),
        ("tile=48", bands_with_tile(48)),
        ("tile=64", bands_with_tile(64)),
    ]

    ref_out = None
    for name, fn in variants:
        try:
            out = np.asarray(fn(xyb_list[0], lf_list[0]))
        except Exception as e:
            print(f"{name:16s} FAILED: {str(e)[:160]}")
            continue
        if ref_out is None:
            ref_out = out
        else:
            rel = np.max(np.abs(out - ref_out) / (np.abs(ref_out) + 1e-6))
            print(f"{name}: max rel diff = {rel:.2e}")
        best = float("inf")
        for _ in range(3):
            ts = {}
            for k in (2, kmax):
                t0 = time.perf_counter()
                o = None
                for i in range(k):
                    o = fn(xyb_list[i], lf_list[i])
                np.asarray(o)[:1]
                ts[k] = time.perf_counter() - t0
            best = min(best, (ts[kmax] - ts[2]) / (kmax - 2))
        print(f"{name:16s} slope {best * 1e3:7.3f} ms/dispatch")


if __name__ == "__main__":
    main()
