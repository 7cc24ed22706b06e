"""Fused candidate-side masking kernel (pallas/maskac.py).

The Pallas chain (sigma-2.7 FIR blur + renormalization + squared diff vs
the reference-side blur) must agree with the XLA path
(`_mask_candidate_side`), which the stage goldens pin.  On the CPU test
backend the dispatcher uses the XLA path; the kernel itself is checked in
interpreter mode on odd shapes so halo/padding logic is exercised.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from codec_eval_tpu.kernels import butteraugli as ba
from codec_eval_tpu.kernels.pallas.maskac import mask_diff_ac_batch_pallas


def _pi_batch(rng, b, h, w):
    return ba.PsychoImage(
        uhf=jnp.asarray(rng.normal(0, 2, (b, 2, h, w)).astype(np.float32)),
        hf=jnp.asarray(rng.normal(0, 2, (b, 2, h, w)).astype(np.float32)),
        mf=jnp.asarray(rng.normal(0, 2, (b, 3, h, w)).astype(np.float32)),
        lf=jnp.asarray(rng.normal(0, 2, (b, 3, h, w)).astype(np.float32)),
    )


@pytest.mark.parametrize("shape", [(2, 48, 64), (1, 37, 53)])
def test_maskac_pallas_interpret_matches_xla(shape):
    b, h, w = shape
    rng = np.random.default_rng(11)
    pi1 = _pi_batch(rng, b, h, w)
    b0 = jnp.asarray(rng.normal(0.5, 0.3, (h, w)).astype(np.float32))

    want = np.asarray(
        jax.vmap(lambda pi: ba._mask_candidate_side(b0, pi))(pi1)
    )
    d1 = jax.vmap(
        lambda pi: ba._diff_precompute(ba._combine_channels_for_masking(pi))
    )(pi1)
    got = np.asarray(
        mask_diff_ac_batch_pallas(
            d1, b0, ba._MASK_DIFF_AC_MUL, sigma=ba.SIGMA_MASK, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_maskac_dispatcher_xla_on_cpu():
    """On the CPU backend the dispatcher takes the vmapped XLA path and is
    bit-identical to per-candidate _mask_candidate_side."""
    rng = np.random.default_rng(12)
    pi1 = _pi_batch(rng, 3, 32, 40)
    b0 = jnp.asarray(rng.normal(0.5, 0.3, (32, 40)).astype(np.float32))
    got = np.asarray(ba._mask_diff_ac_batch(pi1, b0))
    for i in range(3):
        one = ba.PsychoImage(*(jax.tree_util.tree_map(lambda x: x[i], pi1)))
        want = np.asarray(ba._mask_candidate_side(b0, one))
        np.testing.assert_array_equal(got[i], want)
