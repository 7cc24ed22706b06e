"""Device-mesh parallelism: SPMD scoring over the (image x codec x quality)
grid, on-device corpus reductions."""

from .mesh import make_mesh, pair_sharding, scalar_sharding, shard_batch, sharded_score_fn

__all__ = [
    "make_mesh",
    "pair_sharding",
    "scalar_sharding",
    "shard_batch",
    "sharded_score_fn",
]

from .corpus_runner import (
    CorpusScores,
    StagedPairs,
    score_pairs_sharded,
    score_staged,
    stage_pairs_sharded,
)

__all__ += [
    "CorpusScores",
    "StagedPairs",
    "score_pairs_sharded",
    "score_staged",
    "stage_pairs_sharded",
]

from .ladder_runner import CorpusLadders, sweep_corpus_ladders

__all__ += ["CorpusLadders", "sweep_corpus_ladders"]

from . import multihost

__all__ += ["multihost"]
