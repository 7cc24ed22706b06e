"""Fused-epilogue Malta diffmap kernel tests (pallas/malta.py).

The whole-diffmap fused kernel (prologue + six channel sweeps + L2/DC band
diffs + mask combine + sqrt in one Pallas program) must agree with the
unfused three-pass path (`_malta_diffs_stack` + XLA sweeps +
`_diffmap_psycho` epilogue) — checked in interpreter mode at odd shapes so
halo/padding logic is exercised.  The VMEM admission model is regression-
locked against the BENCH_r03 failure: a 20.85 MB scoped-stack compile OOM at
(tile 48, wp 1024) that the old 12-plane estimate admitted.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from codec_eval_tpu.kernels import butteraugli as ba
from codec_eval_tpu.kernels.pallas.malta import (
    _FUSED_EPI_PLANES,
    _RADIUS,
    _fused_epi_tile,
    fused_epilogue_supported,
)


def _pi(seed, h, w, batch=None):
    r = np.random.default_rng(seed)

    def f(c):
        shape = (batch, c, h, w) if batch else (c, h, w)
        return jnp.asarray(r.normal(0.0, 1.0, shape).astype(np.float32))

    return ba.PsychoImage(uhf=f(2), hf=f(2), mf=f(3), lf=f(3))


@pytest.mark.parametrize("shape", [(2, 48, 64), (1, 37, 53)])
def test_fused_epilogue_interpret_matches_unfused(shape):
    b, h, w = shape
    pi0 = _pi(1, h, w)
    pi1b = _pi(2, h, w, batch=b)
    a, xmul = 0.8, 1.0
    mask_pre = ba._mask_pre_of(pi0)
    dac = ba._mask_diff_ac_batch(pi1b, mask_pre[0])

    stacks = jax.vmap(lambda p1: ba._malta_diffs_stack(pi0, p1, a))(pi1b)
    ac = jax.vmap(ba._malta_ac_stack_xla)(stacks)
    want = np.asarray(
        jax.vmap(
            lambda pi1, acb, d: ba._diffmap_psycho(
                pi0, pi1, a, xmul,
                malta_ac=acb, mask_pre=mask_pre, diff_ac=d,
            )
        )(pi1b, ac, dac)
    )
    got = np.asarray(
        ba._diffmap_fused_batch(
            pi0, pi1b, a, xmul, mask_pre, dac, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_vmem_model_rejects_bench_r03_geometry():
    """The calibrated stack model must reject (tile 48, wp 1024) — the exact
    admission that compile-OOMed BENCH_r03 (20.85 MB vs the 16 MB scoped
    limit) — while still admitting every production geometry at SOME tile."""
    # The measured-calibrated footprint at the r03 geometry exceeds the limit.
    assert _FUSED_EPI_PLANES * (48 + 2 * _RADIUS) * 1024 * 4 > 16 * 1024 * 1024
    # Production geometries all get a tile (confirmed compiling on TPU at
    # 512/800/1024/2048 on 2026-08-20; the runtime additionally probe-compiles
    # before enabling the kernel — butteraugli._fused_diffmap_compiles).
    assert _fused_epi_tile(512, 512) == 48
    assert _fused_epi_tile(800, 800) == 32
    assert _fused_epi_tile(1024, 1024) == 24
    assert _fused_epi_tile(2048, 2048) == 8
    # Tile never exceeds the padded image height.
    assert _fused_epi_tile(37, 53) == 40
    for s in (512, 800, 1024, 2048):
        assert fused_epilogue_supported(s, s)
