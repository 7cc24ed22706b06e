"""The block-tridiagonal matmul blur must equal the FIR formulation.

kernels/pallas/scale_features.py factors the banded (W, W) Toeplitz blur
operator into three (128, 128) blocks applied to the previous / current /
next 128-lane input block.  The factorization is pure jnp math, so its
equivalence to the lane-shift FIR (and to the full banded operator) is
checked here on CPU; the TPU kernel around it is exercised on hardware.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from codec_eval_tpu.kernels.blur import _banded_matrix, gaussian_taps
from codec_eval_tpu.kernels.pallas.scale_features import (
    _block_tridiag_ops,
    _hblur,
    _hblur_mm,
)

SIGMA = 1.5


@pytest.mark.parametrize("w", [128, 384, 896])
def test_block_tridiag_equals_fir(w):
    rng = np.random.default_rng(w)
    x = jnp.asarray(rng.normal(size=(16, w)).astype(np.float32))
    taps = tuple(float(t) for t in gaussian_taps(SIGMA))
    r = len(taps) // 2
    fir = _hblur(x, taps, r)
    t_top, t_mid, t_bot = (jnp.asarray(m) for m in _block_tridiag_ops(SIGMA))
    mm = _hblur_mm(x, t_top, t_mid, t_bot)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(fir), atol=2e-6)


def test_block_tridiag_equals_full_banded_operator():
    w = 640
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, w)).astype(np.float32))
    full = np.asarray(x) @ _banded_matrix(w, SIGMA)
    t_top, t_mid, t_bot = (jnp.asarray(m) for m in _block_tridiag_ops(SIGMA))
    mm = np.asarray(_hblur_mm(x, t_top, t_mid, t_bot))
    np.testing.assert_allclose(mm, full, atol=2e-6)


def test_block_operators_structure():
    """t_mid carries the main band; t_top/t_bot only the coupling corners."""
    t_top, t_mid, t_bot = _block_tridiag_ops(SIGMA)
    taps = gaussian_taps(SIGMA)
    r = len(taps) // 2
    # Main diagonal of t_mid is the center tap.
    assert np.allclose(np.diag(t_mid), taps[r])
    # t_top nonzero only where (input row) - (output col) >= 128 - r.
    k, jj = np.nonzero(t_top)
    assert len(k) > 0 and np.all(k - jj >= 128 - r)
    # t_bot nonzero only in the opposite corner.
    k, jj = np.nonzero(t_bot)
    assert len(k) > 0 and np.all(jj - k >= 128 - r)
