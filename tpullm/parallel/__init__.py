from .mesh import (
    DATA_AXIS, EXPERT_AXIS, MODEL_AXIS, make_mesh, make_mesh_ep, replicated,
    sharding,
)
from .sharding import shard_cache, shard_params

__all__ = [
    "DATA_AXIS", "EXPERT_AXIS", "MODEL_AXIS", "make_mesh", "make_mesh_ep",
    "replicated", "sharding", "shard_cache", "shard_params",
]
