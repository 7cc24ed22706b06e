"""Corpus-scale sharded scoring: the end-to-end multi-chip path.

Takes an arbitrary list of decoded (reference, candidate) pairs, buckets
them by image shape (one compiled SPMD program per bucket — the mixed-size
strategy from SURVEY.md §5 "bucketed padding"), pads each bucket's batch up
to a multiple of the mesh's batch axis, and scores every bucket across the
device mesh with on-device aggregation.  This is the whole-corpus analog of
the reference's rayon fan-out (rd_calibrate.rs:184-216) with ICI collectives
in place of thread joins.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .mesh import make_mesh, shard_batch, sharded_score_fn


@dataclass
class CorpusScores:
    """Per-pair scores (input order) + corpus means per metric."""

    per_pair: List[Dict[str, float]]
    means: Dict[str, float] = field(default_factory=dict)


def score_pairs_sharded(
    pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
    mesh=None,
    dssim: bool = True,
    ssimulacra2: bool = True,
    butteraugli: bool = True,
    psnr: bool = True,
) -> CorpusScores:
    """Score (ref, dist) u8 pairs across the mesh, bucketed by shape.

    Pads each bucket's batch by repeating its last pair up to a multiple of
    the mesh batch axis; padded entries are dropped from results and means.
    """
    if mesh is None:
        mesh = make_mesh(n_space=1)
    n_batch = mesh.devices.shape[0]

    step = sharded_score_fn(
        mesh, dssim=dssim, ssimulacra2=ssimulacra2,
        butteraugli=butteraugli, psnr=psnr,
    )

    # Bucket indices by shape.
    buckets: Dict[Tuple[int, int], List[int]] = {}
    for i, (ref, dist) in enumerate(pairs):
        assert ref.shape == dist.shape, f"pair {i} shape mismatch"
        buckets.setdefault(ref.shape[:2], []).append(i)

    per_pair: List[Optional[Dict[str, float]]] = [None] * len(pairs)
    for shape, indices in buckets.items():
        refs = np.stack([pairs[i][0] for i in indices])
        dists = np.stack([pairs[i][1] for i in indices])
        n = len(indices)
        padded = ((n + n_batch - 1) // n_batch) * n_batch
        if padded != n:
            refs = np.concatenate([refs, np.repeat(refs[-1:], padded - n, 0)])
            dists = np.concatenate([dists, np.repeat(dists[-1:], padded - n, 0)])
        scores, _ = step(shard_batch(mesh, refs), shard_batch(mesh, dists))
        scores = {k: np.asarray(v, dtype=np.float64) for k, v in scores.items()}
        for j, i in enumerate(indices):
            per_pair[i] = {k: float(scores[k][j]) for k in scores}

    result = CorpusScores(per_pair=[p for p in per_pair if p is not None])
    if result.per_pair:
        keys = result.per_pair[0].keys()
        result.means = {
            k: float(np.mean([p[k] for p in result.per_pair])) for k in keys
        }
    return result


__all__ = ["CorpusScores", "score_pairs_sharded"]
