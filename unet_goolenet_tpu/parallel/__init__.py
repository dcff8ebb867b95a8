"""Multi-chip scaling via jax.sharding (SPMD over a device mesh)."""

from unet_goolenet_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    make_sharded_seg_train_step,
    make_sharded_pipeline,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "make_sharded_seg_train_step",
    "make_sharded_pipeline",
]
