from .mesh import AXES, BATCH_AXES, batch_sharding, create_mesh, replicated
from .sharding import param_shardings, param_specs, shard_params

__all__ = ["AXES", "BATCH_AXES", "batch_sharding", "create_mesh", "replicated",
           "param_shardings", "param_specs", "shard_params"]
