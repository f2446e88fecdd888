from . import functional  # noqa: F401
from .mesh import (  # noqa: F401
    DATA_AXES,
    DP_AXIS,
    FSDP_AXIS,
    MESH_AXES,
    TP_AXIS,
    ParallelConfig,
    batch_pspec,
    build_mesh,
    data_parallel_size,
    data_sharding,
    get_mesh,
    hybrid_device_grid,
    init_dist_env,
    local_batch_size,
    replicated,
    set_mesh,
    tp_size,
)
from .sharding import VIT_TP_RULES, partition_params, shard_train_state  # noqa: F401
