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
    ButteraugliParams as _BaParams,
    ButteraugliReference as _BaReference,
    butteraugli_batch as _butteraugli_batch,
    precompute_butteraugli_reference as _butteraugli_precompute,
)
from ..kernels.ssimulacra2 import (
    precompute_reference as _s2_precompute,
    ssimulacra2_batch_pre as _ssimulacra2_batch_pre,
)
from ..kernels.psnr import psnr as _psnr_kernel
from ..metrics import MetricConfig, MetricResult


def _bucket(n: int) -> int:
    """Round batch size up to a small set of buckets to bound compilations.

    25/50/75/100 are first-class buckets: they are the quality-preset sizes
    (dense = 25 points; 4-codec x 25 = 100), and padding a dense sweep from
    25 up to 32 would waste 28% of device compute.
    """
    for b in (1, 2, 4, 8, 16, 25, 32, 50, 64, 75, 100, 128):
        if n <= b:
            return b
    return ((n + 127) // 128) * 128


@functools.lru_cache(maxsize=64)
def _build_precompute(
    height: int,
    width: int,
    dssim: bool,
    ssimulacra2: bool,
    butteraugli: bool,
    xyb_roundtrip: bool,
):
    """Jitted per-image reference precompute: everything that depends only
    on the reference (XYB-roundtrip staging, SSIM2/DSSIM pyramids + window
    moments, Butteraugli psycho images + masking) runs ONCE per image, in
    its own program, so multi-chunk sweeps don't redo it every dispatch.

    Returns a plain array pytree (NamedTuples with static metadata are
    reassembled inside the chunk scorer, where shapes are known statically).
    """

    def pre(ref_u8: jnp.ndarray):
        if xyb_roundtrip:
            ref_u8 = _xyb_roundtrip(ref_u8)
        out: Dict[str, object] = {"ref_u8": ref_u8}
        # One shared (3, H, W) linear staging pass for all metrics (the
        # same cross-subgraph CSE gap as in the chunk scorer).
        lin = None
        if dssim + ssimulacra2 + butteraugli >= 2:
            lin = jnp.moveaxis(_srgb_u8_to_linear(ref_u8), -1, 0)
        if dssim:
            out["dssim"] = _dssim_precompute(
                lin if lin is not None else _srgb_u8_to_linear(ref_u8)
            )
        if ssimulacra2:
            out["s2"] = _s2_precompute(ref_u8, lin_planar=lin)
        if butteraugli:
            bref = _butteraugli_precompute(ref_u8, lin_planar=lin)
            out["ba"] = (
                bref.pi0_full, bref.pi0_sub, bref.mask_full, bref.mask_sub
            )
        return out

    return jax.jit(pre)


@functools.lru_cache(maxsize=64)
def _build_chunk_scorer(
    height: int,
    width: int,
    batch: int,
    dssim: bool,
    ssimulacra2: bool,
    butteraugli: bool,
    psnr: bool,
    share_staging: bool = True,
    planar: bool = False,
):
    """Jitted per-chunk scorer over a precomputed reference pytree.

    With ``planar=True`` the candidate batch is (N, 3, H, W) u8 instead of
    (N, H, W, 3) — the layout the device-resident JPEG reconstruction
    produces.  Channel-last u8 batches tile poorly on TPU (minor dim 3),
    so producers that live on device hand over planar and skip both the
    bad layout and the staging moveaxis; every downstream consumer is
    layout-agnostic once reference and candidates agree.
    """

    def score(pre, batch_u8: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        ref_u8 = pre["ref_u8"]
        ref_cmp = jnp.moveaxis(ref_u8, -1, 0) if planar else ref_u8
        out: Dict[str, jnp.ndarray] = {}
        # Stage the candidates' (N, 3, H, W) linear RGB once and hand it to
        # every metric that needs it: the per-metric conversions are
        # bit-identical expressions, but XLA does not reliably CSE them
        # across the metric subgraphs in the big fused program.
        lin = None
        if planar and (dssim or ssimulacra2 or butteraugli):
            lin = jax.vmap(_srgb_u8_to_linear)(batch_u8)
        elif share_staging and dssim + ssimulacra2 + butteraugli >= 2:
            lin = jax.vmap(
                lambda d: jnp.moveaxis(_srgb_u8_to_linear(d), -1, 0)
            )(batch_u8)
        if psnr:
            out["psnr"] = jax.vmap(lambda d: _psnr_kernel(ref_cmp, d))(batch_u8)
        if dssim:
            dref = pre["dssim"]

            def one_dssim(d, l):
                val = _dssim_against(
                    dref, l if l is not None else _srgb_u8_to_linear(d)
                )
                return jnp.where(jnp.all(ref_cmp == d), jnp.zeros_like(val), val)

            if lin is None:
                out["dssim"] = jax.vmap(lambda d: one_dssim(d, None))(batch_u8)
            else:
                out["dssim"] = jax.vmap(one_dssim)(batch_u8, lin)
        if ssimulacra2:
            out["ssimulacra2"] = _ssimulacra2_batch_pre(
                pre["s2"], ref_cmp, batch_u8, lin_planar=lin
            )
        if butteraugli:
            pi0_full, pi0_sub, mask_full, mask_sub = pre["ba"]
            bref = _BaReference(
                pi0_full=pi0_full,
                pi0_sub=pi0_sub,
                lin_sub_available=pi0_sub is not None,
                params=_BaParams.default(),
                shape=(height, width),
                mask_full=mask_full,
                mask_sub=mask_sub,
            )
            vals = _butteraugli_batch(bref, batch_u8, lin_full=lin)
            identical = jax.vmap(lambda d: jnp.all(ref_cmp == d))(batch_u8)
            out["butteraugli"] = jnp.where(identical, 0.0, vals)
        return out

    return jax.jit(score)


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
    """One-shot (reference, batch) scorer: precompute + chunk score fused
    into a single program.  Sweeps that dispatch several chunks against the
    same reference should use ``_build_precompute`` + ``_build_chunk_scorer``
    instead to amortize the reference-side work."""
    pre = _build_precompute(
        height, width, dssim, ssimulacra2, butteraugli, xyb_roundtrip
    )
    chunk = _build_chunk_scorer(
        height, width, batch, dssim, ssimulacra2, butteraugli, psnr
    )

    def score(ref_u8: jnp.ndarray, batch_u8: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return chunk(pre(ref_u8), batch_u8)

    return jax.jit(score)


@functools.lru_cache(maxsize=64)
def _build_sweep_scorer(
    height: int,
    width: int,
    n_cand: int,
    chunk: int,
    dssim: bool,
    ssimulacra2: bool,
    butteraugli: bool,
    psnr: bool,
    xyb_roundtrip: bool,
):
    """Whole-sweep scorer: ONE dispatch per image = reference precompute +
    ``lax.scan`` over chunk-sized candidate slices.

    Motivation (tools/experiment_chunk100.py, ROADMAP): per-pair kernel cost
    is lowest at chunk ~25, but a dense 4-codec x 25-quality sweep then pays
    4 chunk dispatches + 1 precompute dispatch per image (~4 ms fixed each
    on the tunneled backend).  A flat batch-100 program loses that saving to
    HBM pressure; the scan keeps the chunk-25 working set while paying the
    dispatch cost once.
    """
    if n_cand % chunk:
        raise ValueError(f"n_cand {n_cand} not a multiple of chunk {chunk}")
    pre_fn = _build_precompute(
        height, width, dssim, ssimulacra2, butteraugli, xyb_roundtrip
    )
    chunk_fn = _build_chunk_scorer(
        height, width, chunk, dssim, ssimulacra2, butteraugli, psnr
    )

    def score(
        ref_u8: jnp.ndarray, cands_u8: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        pre = pre_fn(ref_u8)
        slices = cands_u8.reshape(
            n_cand // chunk, chunk, height, width, cands_u8.shape[-1]
        )

        def body(carry, ck):
            return carry, chunk_fn(pre, ck)

        _, outs = jax.lax.scan(body, None, slices)
        return {k: v.reshape(n_cand) for k, v in outs.items()}

    return jax.jit(score)


def fetch_scores(scores: Dict[str, "jnp.ndarray"]) -> Dict[str, np.ndarray]:
    """Materialize a chunk scorer's {metric: device array} output with ONE
    device->host fetch: the per-metric arrays are stacked on device (a
    trivial dispatch) and transferred together.  On a remote runtime each
    separate np.asarray pays a full round trip (~25 ms here), which for a
    4-metric ladder was costing more than the scoring itself."""
    if not scores:
        return {}
    keys = sorted(scores)
    if len(keys) == 1:
        return {keys[0]: np.asarray(scores[keys[0]])}
    stacked = np.asarray(jnp.stack([scores[k] for k in keys]))
    return {k: stacked[i] for i, k in enumerate(keys)}


class BatchScorer:
    """Scores batches of decoded candidates against a reference image.

    The reference-side work (pyramids, window moments, psycho images,
    masking) runs as its own jitted program, cached per reference array
    identity — consecutive chunks against the same reference (quality
    sweeps, multi-codec ladders) skip it entirely.
    """

    def __init__(self, config: MetricConfig):
        self.config = config
        self._ref_key: object = None
        self._ref_pre = None

    def enabled(self) -> bool:
        c = self.config
        return c.dssim or c.ssimulacra2 or c.butteraugli or c.psnr

    def _precomputed(self, reference_u8: np.ndarray):
        """Per-image reference precompute, cached by (shape, config,
        content crc): identity-keyed caching would let a caller that
        decodes into a reused buffer mutate the reference in place and
        silently score every later batch against the stale pyramids.  The
        crc is ~0.5 ms/MP — noise next to the staging it guards."""
        import zlib

        contig = np.ascontiguousarray(reference_u8)
        key = (
            reference_u8.shape,
            self.config,
            zlib.crc32(contig.view(np.uint8).reshape(-1).data),
        )
        if self._ref_key != key:
            c = self.config
            h, w = reference_u8.shape[:2]
            pre_fn = _build_precompute(
                h, w, c.dssim, c.ssimulacra2, c.butteraugli, c.xyb_roundtrip
            )
            self._ref_pre = pre_fn(jnp.asarray(reference_u8))
            self._ref_key = key
        return self._ref_pre

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
        # Stage candidates planar (N, 3, H, W): channel-last u8 batches
        # tile pathologically on TPU (minor dim 3) — the layout swap alone
        # cost ~2 ms of the 18 ms all-metric chunk at 512px/25 (tools/
        # profile_ba_batch_stages.py "u8->linear").  The host transpose is
        # a memcpy-rate pass that overlaps with device compute on PCIe
        # hosts.
        scorer = _build_chunk_scorer(
            h, w, padded_n, c.dssim, c.ssimulacra2, c.butteraugli, c.psnr,
            planar=True,
        )
        planar = np.ascontiguousarray(np.moveaxis(candidates_u8, -1, 1))
        raw = scorer(self._precomputed(reference_u8), jnp.asarray(planar))
        raw = {
            k: v.astype(np.float64)
            for k, v in fetch_scores(raw).items()
        }

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
