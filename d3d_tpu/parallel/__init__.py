from .mesh import (make_mesh, shard_train_step, batch_sharding,
                   replicate_sharding, reduce_stats_arrays, stats_to_arrays,
                   arrays_to_stats)

__all__ = [
    "make_mesh", "shard_train_step", "batch_sharding", "replicate_sharding",
    "reduce_stats_arrays", "stats_to_arrays", "arrays_to_stats",
]
