from .mesh import DATA_AXIS, MODEL_AXIS, make_mesh, replicated, sharding
from .sharding import shard_cache, shard_params

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "make_mesh", "replicated", "sharding",
    "shard_cache", "shard_params",
]
