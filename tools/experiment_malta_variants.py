"""Isolated A/B of Malta-sweep kernel variants (slope method, kernel only).

Variants:
  A: current production kernel (where-based accumulation, tile cap 8 MB)
  B: pl.when accumulation (skip the dead accumulator's read-modify-write)
  C: B + tile cap 12 MB (tile 256 at 512px if it fits)

Run: ``python tools/experiment_malta_variants.py``.
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

    from codec_eval_tpu.kernels import butteraugli as ba
    from codec_eval_tpu.kernels.pallas import malta as m

    lines_full = ba._MALTA_LINES_FULL
    lines_lf = ba._MALTA_LINES_LF

    def kernel_when(
        slab_ref, out_ref, shifted, *, tile, wp, lines_full, lines_lf
    ):
        ch = pl.program_id(2)
        for dx in range(2 * m._RADIUS + 1):
            shifted[dx] = slab_ref[0, 0, 0, :, dx : dx + wp]

        @pl.when(ch == 0)
        def _():
            out_ref[0, 0] = jnp.zeros((tile, wp), jnp.float32)
            out_ref[0, 1] = jnp.zeros((tile, wp), jnp.float32)

        def add_sweep(lines):
            acc = m._sweep_shifted(shifted, lines, tile)

            @pl.when(ch % 2 == 0)
            def _():
                out_ref[0, 1] = out_ref[0, 1] + acc

            @pl.when(ch % 2 == 1)
            def _():
                out_ref[0, 0] = out_ref[0, 0] + acc

        @pl.when(ch < 2)
        def _():
            add_sweep(lines_full)

        @pl.when(ch >= 2)
        def _():
            add_sweep(lines_lf)

    def build_variant(kernel_fn, vmem_cap_mb):
        @functools.partial(jax.jit, static_argnames=())
        def run(diffs):
            b, c, h, w = diffs.shape
            r = m._RADIUS
            wp = ((w + 127) // 128) * 128
            wp_in = ((wp + 2 * r + 127) // 128) * 128
            tile = 256
            while tile > 8 and (
                (2 * r + 13) * (tile + 2 * r) * wp * 4
                > vmem_cap_mb * 1024 * 1024
            ):
                tile //= 2
            tile = min(tile, ((h + 7) // 8) * 8)
            hp = ((h + tile - 1) // tile) * tile
            nt = hp // tile
            slab_rows = tile + 2 * r
            pad = ((0, 0), (0, 0), (r, (hp - h) + r), (r, wp_in - w - r))
            diffs_p = jnp.pad(diffs, pad)
            slabs = jnp.stack(
                [
                    diffs_p[:, :, i * tile : i * tile + slab_rows, :]
                    for i in range(nt)
                ],
                axis=2,
            )
            kern = functools.partial(
                kernel_fn, tile=tile, wp=wp,
                lines_full=lines_full, lines_lf=lines_lf,
            )
            out = pl.pallas_call(
                kern,
                grid=(b, nt, 6),
                in_specs=[
                    pl.BlockSpec(
                        (1, 1, 1, slab_rows, wp_in),
                        lambda bi, ti, ci: (bi, ci, ti, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                ],
                out_specs=pl.BlockSpec(
                    (1, 2, tile, wp),
                    lambda bi, ti, ci: (bi, 0, ti, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((b, 2, hp, wp), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((2 * m._RADIUS + 1, slab_rows, wp), jnp.float32),
                ],
            )(slabs)
            return jnp.sum(out[:, :, :h, :w], axis=(1, 2, 3))

        return run

    def run_prod(diffs):
        out = m.malta_ac_batch_pallas(diffs, lines_full, lines_lf)
        return jnp.sum(out, axis=(1, 2, 3))

    # D: register-aligned restage offsets — rows at sublane offset 8,
    # lanes at offset 128 — so the host-side pad+stack is pure aligned
    # copies (no sublane/lane shuffle of the whole diff stack).
    def kernel_aligned(
        slab_ref, out_ref, shifted, *, tile, wp, lines_full, lines_lf
    ):
        ch = pl.program_id(2)
        r = m._RADIUS
        for dx in range(2 * r + 1):
            shifted[dx] = slab_ref[0, 0, 0, :, 128 - r + dx : 128 - r + dx + wp]

        @pl.when(ch == 0)
        def _():
            out_ref[0, 0] = jnp.zeros((tile, wp), jnp.float32)
            out_ref[0, 1] = jnp.zeros((tile, wp), jnp.float32)

        def sweep(lines):
            acc = None
            for weight, line in lines:
                s = None
                for dy, dx in line:
                    piece = shifted[
                        dx + r, 8 + dy : 8 + dy + tile, :
                    ]
                    s = piece if s is None else s + piece
                term = weight * (s * s)
                acc = term if acc is None else acc + term
            is_ac1 = (ch % 2) == 0
            out_ref[0, 0] = out_ref[0, 0] + jnp.where(is_ac1, 0.0, 1.0) * acc
            out_ref[0, 1] = out_ref[0, 1] + jnp.where(is_ac1, 1.0, 0.0) * acc

        @pl.when(ch < 2)
        def _():
            sweep(lines_full)

        @pl.when(ch >= 2)
        def _():
            sweep(lines_lf)

    @jax.jit
    def run_aligned(diffs):
        b, c, h, w = diffs.shape
        r = m._RADIUS
        wp = ((w + 127) // 128) * 128
        wp_in = ((wp + 256 + 127) // 128) * 128
        tile = 128
        while tile > 8 and (2 * r + 13) * (tile + 16) * wp * 4 > 8 * 1024 * 1024:
            tile //= 2
        tile = min(tile, ((h + 7) // 8) * 8)
        hp = ((h + tile - 1) // tile) * tile
        nt = hp // tile
        slab_rows = tile + 16
        pad = ((0, 0), (0, 0), (8, (hp - h) + 8), (128, wp_in - w - 128))
        diffs_p = jnp.pad(diffs, pad)
        slabs = jnp.stack(
            [
                diffs_p[:, :, i * tile : i * tile + slab_rows, :]
                for i in range(nt)
            ],
            axis=2,
        )
        kern = functools.partial(
            kernel_aligned, tile=tile, wp=wp,
            lines_full=lines_full, lines_lf=lines_lf,
        )
        out = pl.pallas_call(
            kern,
            grid=(b, nt, 6),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, 1, slab_rows, wp_in),
                    lambda bi, ti, ci: (bi, ci, ti, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, 2, tile, wp),
                lambda bi, ti, ci: (bi, 0, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, 2, hp, wp), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2 * r + 1, slab_rows, wp), jnp.float32),
            ],
        )(slabs)
        return jnp.sum(out[:, :, :h, :w], axis=(1, 2, 3))

    variants = [
        ("A-prod(where,8MB)", jax.jit(run_prod)),
        ("D-aligned-offsets", run_aligned),
    ]

    rng = np.random.default_rng(11)
    kmax = 10
    diffs_list = [
        jnp.asarray(rng.normal(0, 1, (25, 6, 512, 512)).astype(np.float32))
        for _ in range(kmax)
    ]
    diffs_list = [jax.block_until_ready(d) for d in diffs_list]

    ref_out = None
    for name, fn in variants:
        out = np.asarray(fn(diffs_list[0]))
        if ref_out is None:
            ref_out = out
        else:
            rel = np.max(np.abs(out - ref_out) / (np.abs(ref_out) + 1e-6))
            print(f"{name}: max rel diff vs A = {rel:.2e}")
        best = float("inf")
        for _round in range(3):
            ts = {}
            for k in (2, kmax):
                t0 = time.perf_counter()
                o = None
                for i in range(k):
                    o = fn(diffs_list[i])
                np.asarray(o)[:1]
                ts[k] = time.perf_counter() - t0
            best = min(best, (ts[kmax] - ts[2]) / (kmax - 2))
        print(f"{name:20s} slope {best * 1e3:7.3f} ms/dispatch")


if __name__ == "__main__":
    main()
