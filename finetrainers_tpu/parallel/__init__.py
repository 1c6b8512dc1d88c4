from .mesh import AXIS_CP, AXIS_DP_REPLICATE, AXIS_DP_SHARD, AXIS_PP, AXIS_TP, BATCH_AXES, MeshEnv, ParallelDims
from .pipeline import PipelineContext, get_pipeline_context, pipeline_blocks, set_pipeline_context
from .sharding import derive_opt_state_shardings, infer_fsdp_spec, make_param_shardings, shard_pytree
from .utils import dist_max, dist_mean, dist_reduce


__all__ = [
    "pipeline_blocks",
    "PipelineContext",
    "get_pipeline_context",
    "set_pipeline_context",
    "AXIS_CP",
    "AXIS_PP",
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
