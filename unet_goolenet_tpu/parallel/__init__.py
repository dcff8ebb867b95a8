"""Multi-chip scaling via jax.sharding (SPMD over a device mesh)."""

from unet_goolenet_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    make_sharded_seg_train_step,
    make_tp_dp_seg_train_step,
    make_sharded_cls_train_step,
    make_tp_dp_cls_train_step,
    make_sharded_pipeline,
)
from unet_goolenet_tpu.parallel.multihost import (
    init_distributed,
    is_main,
    stripe,
    global_batch,
    replicate_global,
    local_replica,
    process_mean,
    process_sum,
    sync,
)
from unet_goolenet_tpu.parallel.pp import make_pp_pipeline, make_stage_mesh
from unet_goolenet_tpu.parallel.tp import make_param_shardings, shard_params

__all__ = [
    "init_distributed",
    "is_main",
    "stripe",
    "global_batch",
    "replicate_global",
    "local_replica",
    "process_mean",
    "process_sum",
    "sync",
    "make_mesh",
    "shard_batch",
    "replicate",
    "make_sharded_seg_train_step",
    "make_tp_dp_seg_train_step",
    "make_sharded_cls_train_step",
    "make_tp_dp_cls_train_step",
    "make_sharded_pipeline",
    "make_pp_pipeline",
    "make_stage_mesh",
    "make_param_shardings",
    "shard_params",
]
