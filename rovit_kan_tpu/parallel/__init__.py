from rovit_kan_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
from rovit_kan_tpu.parallel.tensor import (  # noqa: F401
    make_2d_mesh,
    make_moe_mesh,
    moe_param_specs,
    param_specs,
    seq_sharding,
    shard_params,
    shard_state,
)
from rovit_kan_tpu.parallel.fsdp import (  # noqa: F401
    fsdp_param_specs,
    sharded_size,
)
from rovit_kan_tpu.parallel.pipeline import (  # noqa: F401
    is_pipeline_mesh,
    make_pipeline_mesh,
    make_pipelined_train_step,
    map_param_subtrees,
    merge_params,
    pipeline_blocks,
    pipeline_param_specs,
    pipelined_forward,
    shard_pipeline_params,
    split_params,
)
