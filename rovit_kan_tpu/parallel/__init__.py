from rovit_kan_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
from rovit_kan_tpu.parallel.tensor import (  # noqa: F401
    make_2d_mesh,
    param_specs,
    shard_params,
    shard_state,
)
