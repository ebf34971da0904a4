from .distributed import barrier, host_shard, initialize, is_coordinator
from .pipeline import (
    build_pp_forward,
    create_pp_mesh,
    pp_shardings,
    stack_block_params,
    stacked_cache,
)
from .mesh import (
    LOGICAL_AXIS_RULES,
    abstract_boxed_params,
    batch_sharding,
    create_mesh,
    param_shardings,
    replicated,
    shard_params,
)

__all__ = [
    "LOGICAL_AXIS_RULES",
    "abstract_boxed_params",
    "create_mesh",
    "param_shardings",
    "shard_params",
    "batch_sharding",
    "replicated",
    "initialize",
    "host_shard",
    "is_coordinator",
    "barrier",
    "build_pp_forward",
    "create_pp_mesh",
    "pp_shardings",
    "stack_block_params",
    "stacked_cache",
]
