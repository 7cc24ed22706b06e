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
