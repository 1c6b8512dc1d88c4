from .mesh import AXIS_CP, AXIS_DP_REPLICATE, AXIS_DP_SHARD, AXIS_TP, BATCH_AXES, MeshEnv, ParallelDims
from .pipeline import pipeline_blocks
from .sharding import derive_opt_state_shardings, infer_fsdp_spec, make_param_shardings, shard_pytree
from .utils import dist_max, dist_mean, dist_reduce


__all__ = [
    "pipeline_blocks",
    "AXIS_CP",
    "AXIS_DP_REPLICATE",
    "AXIS_DP_SHARD",
    "AXIS_TP",
    "BATCH_AXES",
    "MeshEnv",
    "ParallelDims",
    "derive_opt_state_shardings",
    "infer_fsdp_spec",
    "make_param_shardings",
    "shard_pytree",
    "dist_max",
    "dist_reduce",
    "dist_mean",
]
