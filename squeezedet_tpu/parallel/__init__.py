"""Parallelism layer: device meshes and sharded step construction."""

from squeezedet_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    image_sharding,
    make_mesh,
    make_mesh_2d,
    replicated_sharding,
    shard_batch,
)
from squeezedet_tpu.parallel.spatial import (  # noqa: F401
    spatial_predict_fn,
)
