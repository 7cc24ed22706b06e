"""Fused opsin + band-separation Pallas kernel tests (interpreter mode on
the CPU test backend; the compiled path is checked on TPU vs the same XLA
reference — see kernels/pallas/freqsep.py notes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from codec_eval_tpu.kernels import butteraugli as ba
from codec_eval_tpu.kernels.pallas.freqsep import (
    bands_batch_pallas,
    opsin_xyb_batch_pallas,
)


@pytest.mark.parametrize("shape", [(1, 32, 48), (2, 27, 41)])
def test_opsin_pallas_matches_xla(shape):
    b, h, w = shape
    rng = np.random.default_rng(7)
    lin = jnp.asarray(rng.random((b, 3, h, w)).astype(np.float32)) * 80.0
    want = np.asarray(jax.vmap(ba._opsin_dynamics)(lin))
    got = np.asarray(
        opsin_xyb_batch_pallas(lin, ba._OPSIN_CONSTS, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize("shape", [(1, 32, 48), (1, 27, 41)])
def test_bands_pallas_matches_xla(shape):
    b, h, w = shape
    rng = np.random.default_rng(8)
    lin = jnp.asarray(rng.random((b, 3, h, w)).astype(np.float32)) * 80.0
    xyb = jax.vmap(ba._opsin_dynamics)(lin)
    lf = jax.vmap(lambda p: ba._blur(p, ba.SIGMA_LF))(xyb)
    want = jax.vmap(ba._separate_frequencies)(xyb)
    got = np.asarray(
        bands_batch_pallas(xyb, lf, ba._BAND_CONSTS, interpret=True)
    )
    wants = [
        want.uhf[:, 0], want.uhf[:, 1],
        want.hf[:, 0], want.hf[:, 1],
        want.mf[:, 0], want.mf[:, 1], want.mf[:, 2],
    ]
    for i, name in enumerate(
        ["uhf_x", "uhf_y", "hf_x", "hf_y", "mf_x", "mf_y", "mf_b"]
    ):
        np.testing.assert_allclose(
            got[:, i], np.asarray(wants[i]), rtol=2e-3, atol=5e-3,
            err_msg=name,
        )


@pytest.mark.parametrize("shape", [(1, 24, 1030), (1, 17, 653)])
def test_opsin_pallas_column_tiled_matches_xla(shape):
    """Wide (CLIC-class) planes take the 2-D tiled path (nc > 1): column
    halos + per-tile border renormalization must reproduce the XLA chain
    exactly, including at the interior tile seams and odd right edges."""
    b, h, w = shape
    rng = np.random.default_rng(9)
    lin = jnp.asarray(rng.random((b, 3, h, w)).astype(np.float32)) * 80.0
    want = np.asarray(jax.vmap(ba._opsin_dynamics)(lin))
    got = np.asarray(
        opsin_xyb_batch_pallas(lin, ba._OPSIN_CONSTS, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize("shape", [(1, 24, 1030), (1, 17, 653)])
def test_bands_pallas_column_tiled_matches_xla(shape):
    b, h, w = shape
    rng = np.random.default_rng(10)
    lin = jnp.asarray(rng.random((b, 3, h, w)).astype(np.float32)) * 80.0
    xyb = jax.vmap(ba._opsin_dynamics)(lin)
    lf = jax.vmap(lambda p: ba._blur(p, ba.SIGMA_LF))(xyb)
    want = jax.vmap(ba._separate_frequencies)(xyb)
    got = np.asarray(
        bands_batch_pallas(xyb, lf, ba._BAND_CONSTS, interpret=True)
    )
    wants = [
        want.uhf[:, 0], want.uhf[:, 1],
        want.hf[:, 0], want.hf[:, 1],
        want.mf[:, 0], want.mf[:, 1], want.mf[:, 2],
    ]
    for i, name in enumerate(
        ["uhf_x", "uhf_y", "hf_x", "hf_y", "mf_x", "mf_y", "mf_b"]
    ):
        np.testing.assert_allclose(
            got[:, i], np.asarray(wants[i]), rtol=2e-3, atol=5e-3,
            err_msg=name,
        )


def test_opsin_absorbance_is_not_a_matmul():
    """Regression guard for the bf16-MXU opsin bug: the absorbance must be
    elementwise FMAs (no dot/tensordot in its jaxpr), because a 3x3
    contraction rides the MXU at bf16 default precision on TPU and injected
    ~0.5% relative error into every opsin value."""
    jaxpr = jax.make_jaxpr(ba._opsin_absorbance)(
        jnp.zeros((3, 8, 8), jnp.float32)
    )
    prims = {eqn.primitive.name for eqn in jaxpr.eqns}
    assert "dot_general" not in prims, prims
