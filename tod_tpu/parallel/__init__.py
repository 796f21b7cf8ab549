from tod_tpu.parallel.mesh import make_mesh  # noqa: F401
from tod_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_sharding_tree,
    shard_chunk_step,
    shard_inference,
    shard_train_step,
    state_sharding_tree,
)
from tod_tpu.parallel.spatial import spatial_sharded_forward  # noqa: F401
from tod_tpu.parallel.pipeline import TwoStagePipeline  # noqa: F401
