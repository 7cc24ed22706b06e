"""Batched device scoring: the TPU replacement for the reference's serial
per-pair metric dispatch (reference: src/eval/session.rs:375-431, 437-497).

Where the reference scores each (codec, quality) pair one at a time through
native SIMD crates, this engine stages every decoded candidate of an image
into one (N, H, W, 3) batch and runs a single fused, jitted program per
image shape: sRGB decode, optional XYB roundtrip of the reference, and all
enabled metrics — with the SSIMULACRA2 reference pyramid precomputed once
and broadcast across the batch (the ``Ssimulacra2Reference`` reuse pattern,
crates/codec-iter/src/eval.rs:138-149).

Compiled programs are cached per (shape, metric-set); candidate batches are
padded to a bucket size so a whole quality sweep hits one compilation.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# NOTE: import leaf functions by full module path — the package __init__
# re-exports functions whose names shadow their submodules.
from ..kernels.color import srgb_u8_to_linear as _srgb_u8_to_linear
from ..kernels.color import xyb_roundtrip as _xyb_roundtrip
from ..kernels.dssim import (
    dssim_against_reference as _dssim_against,
    precompute_dssim_reference as _dssim_precompute,
)
from ..kernels.butteraugli import (
    butteraugli_batch as _butteraugli_batch,
    precompute_butteraugli_reference as _butteraugli_precompute,
)
from ..kernels.ssimulacra2 import ssimulacra2_batch as _ssimulacra2_batch
from ..kernels.psnr import psnr as _psnr_kernel
from ..metrics import MetricConfig, MetricResult


def _bucket(n: int) -> int:
    """Round batch size up to a small set of buckets to bound compilations."""
    for b in (1, 2, 4, 8, 16, 32, 64, 128):
        if n <= b:
            return b
    return ((n + 127) // 128) * 128


@functools.lru_cache(maxsize=64)
def _build_scorer(
    height: int,
    width: int,
    batch: int,
    dssim: bool,
    ssimulacra2: bool,
    butteraugli: bool,
    psnr: bool,
    xyb_roundtrip: bool,
):
    def score(ref_u8: jnp.ndarray, batch_u8: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if xyb_roundtrip:
            ref_u8 = _xyb_roundtrip(ref_u8)
        out: Dict[str, jnp.ndarray] = {}
        if psnr:
            out["psnr"] = jax.vmap(lambda d: _psnr_kernel(ref_u8, d))(batch_u8)
        if dssim:
            # Reference Lab pyramid + moments computed once, broadcast over
            # the candidate batch (exact-zero identity guarantee preserved
            # via the byte-equality select).
            dref = _dssim_precompute(_srgb_u8_to_linear(ref_u8))

            def one_dssim(d):
                val = _dssim_against(dref, _srgb_u8_to_linear(d))
                return jnp.where(jnp.all(ref_u8 == d), jnp.zeros_like(val), val)

            out["dssim"] = jax.vmap(one_dssim)(batch_u8)
        if ssimulacra2:
            out["ssimulacra2"] = _ssimulacra2_batch(ref_u8, batch_u8)
        if butteraugli:
            bref = _butteraugli_precompute(ref_u8)
            vals = _butteraugli_batch(bref, batch_u8)
            identical = jax.vmap(lambda d: jnp.all(ref_u8 == d))(batch_u8)
            out["butteraugli"] = jnp.where(identical, 0.0, vals)
        return out

    return jax.jit(score)


class BatchScorer:
    """Scores batches of decoded candidates against a reference image."""

    def __init__(self, config: MetricConfig):
        self.config = config

    def enabled(self) -> bool:
        c = self.config
        return c.dssim or c.ssimulacra2 or c.butteraugli or c.psnr

    def score_batch(
        self, reference_u8: np.ndarray, candidates_u8: np.ndarray
    ) -> list[MetricResult]:
        """reference (H, W, 3) u8; candidates (N, H, W, 3) u8 -> N results."""
        n = candidates_u8.shape[0]
        if n == 0 or not self.enabled():
            return [MetricResult() for _ in range(n)]
        h, w = reference_u8.shape[:2]
        padded_n = _bucket(n)
        if padded_n != n:
            pad = np.repeat(candidates_u8[-1:], padded_n - n, axis=0)
            candidates_u8 = np.concatenate([candidates_u8, pad], axis=0)

        c = self.config
        scorer = _build_scorer(
            h, w, padded_n, c.dssim, c.ssimulacra2, c.butteraugli, c.psnr,
            c.xyb_roundtrip,
        )
        raw = scorer(jnp.asarray(reference_u8), jnp.asarray(candidates_u8))
        raw = {k: np.asarray(v, dtype=np.float64) for k, v in raw.items()}

        results = []
        for i in range(n):
            results.append(
                MetricResult(
                    dssim=float(raw["dssim"][i]) if "dssim" in raw else None,
                    ssimulacra2=(
                        float(raw["ssimulacra2"][i]) if "ssimulacra2" in raw else None
                    ),
                    butteraugli=(
                        float(raw["butteraugli"][i]) if "butteraugli" in raw else None
                    ),
                    psnr=float(raw["psnr"][i]) if "psnr" in raw else None,
                )
            )
        return results

    def score_pair(
        self, reference_u8: np.ndarray, candidate_u8: np.ndarray
    ) -> MetricResult:
        return self.score_batch(reference_u8, candidate_u8[None])[0]
