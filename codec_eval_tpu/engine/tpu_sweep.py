"""Device-resident R-D sweep: encode, decode, and score a whole tpujpeg
quality ladder without candidate pixels ever leaving the TPU.

This is the capability the reference cannot have: its eval loop round-trips
every (codec, quality) candidate through host RAM between the codec and the
scorer (reference: crates/codec-iter/src/eval.rs:151-167 encode -> decode ->
compare per pair; the CUDA path still uploads each decoded frame,
crates/codec-iter/src/gpu.rs:83-109).  Here the tpujpeg transform, the
per-quality quantize/dequantize/iDCT reconstruction
(kernels/jpeg_enc.build_reconstruct_sweep), and the fused all-metric scorer
(engine/scoring) compose on device: per image, two dispatches produce the
full ladder's scores.  The only host work is the optional entropy-coding
pass that turns the (already device-computed) quantized coefficients into
real .jpg bytes for exact file sizes — and it overlaps with the next
image's device work.

The scored pixels are this framework's own decoder output; a libjpeg decode
of the emitted bytes differs by ~0.6 u8 RMS (integer iDCT vs float), which
moves SSIMULACRA2 by well under a point (pinned in tests/test_tpujpeg.py).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..kernels import jpeg_enc as _je
from ..utils import native as _native

__all__ = ["TpuSweepPoint", "evaluate_tpujpeg_sweep"]


@dataclass
class TpuSweepPoint:
    """One (quality) row of a device-resident ladder evaluation."""

    quality: float
    bits_per_pixel: Optional[float]
    file_size: Optional[int]
    metrics: Dict[str, float]


def _qtabs_for(qualities: Sequence[float]) -> np.ndarray:
    return np.stack(
        [
            np.stack(_je.quality_to_qtables(q)).astype(np.float32)
            for q in qualities
        ]
    )  # (n_q, 2, 64) natural order


def evaluate_tpujpeg_sweep(
    image_u8: np.ndarray,
    qualities: Sequence[float],
    subsampling: str = "420",
    aq_strength: float = 0.30,
    metrics: Sequence[str] = ("dssim", "ssimulacra2", "butteraugli", "psnr"),
    with_sizes: bool = True,
    size_pool: Optional[ThreadPoolExecutor] = None,
) -> List[TpuSweepPoint]:
    """Score a full tpujpeg quality ladder for one image on device.

    with_sizes=False skips the host entropy pass entirely (scores only —
    useful when hunting a quality threshold rather than an R-D curve).
    """
    import jax.numpy as jnp

    from .scoring import _build_chunk_scorer, _build_precompute

    h, w = image_u8.shape[:2]
    n_q = len(qualities)
    want = {m: m in metrics for m in ("dssim", "ssimulacra2", "butteraugli", "psnr")}

    recon = _je.build_reconstruct_sweep(h, w, n_q, subsampling)
    pre_fn = _build_precompute(
        h, w, want["dssim"], want["ssimulacra2"], want["butteraugli"], False
    )
    scorer = _build_chunk_scorer(
        h, w, n_q,
        want["dssim"], want["ssimulacra2"], want["butteraugli"], want["psnr"],
    )

    img_dev = jnp.asarray(image_u8)
    qtabs = jnp.asarray(_qtabs_for(qualities))
    cands, coefs = recon(img_dev, qtabs, float(aq_strength))
    scores = scorer(pre_fn(img_dev), cands)

    sizes: List[Optional[int]] = [None] * n_q
    if with_sizes:
        # Entropy-code on host for exact bytes; the coefficient fetch and
        # the Huffman pass overlap device scoring via the thread pool.
        cy = np.asarray(coefs["y"])
        ccb = np.asarray(coefs["cb"])
        ccr = np.asarray(coefs["cr"])

        def size_of(qi: int) -> int:
            ql, qc = _je.quality_to_qtables(qualities[qi])
            data = _native.jpeg_encode_baseline(
                w, h, subsampling,
                cy[qi], ccb[qi], ccr[qi],
                ql[_je.ZIGZAG], qc[_je.ZIGZAG],
            )
            return len(data)

        if size_pool is not None:
            sizes = list(size_pool.map(size_of, range(n_q)))
        else:
            sizes = [size_of(qi) for qi in range(n_q)]

    host_scores = {k: np.asarray(v) for k, v in scores.items()}
    points = []
    for qi, q in enumerate(qualities):
        row = {k: float(v[qi]) for k, v in host_scores.items()}
        points.append(
            TpuSweepPoint(
                quality=float(q),
                bits_per_pixel=(
                    sizes[qi] * 8.0 / (h * w) if sizes[qi] is not None else None
                ),
                file_size=sizes[qi],
                metrics=row,
            )
        )
    return points
