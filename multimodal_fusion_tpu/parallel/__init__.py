from multimodal_fusion_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    make_mesh_2d,
    replicate,
    replicated,
    shard_batch,
)
