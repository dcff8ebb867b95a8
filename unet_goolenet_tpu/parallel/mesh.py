"""Device-mesh parallelism (the layer the reference never had — SURVEY.md §2: no
DP/TP/PP anywhere; the `--n_gpu` flag is parsed and never read).

Design (scaling-book recipe): pick a mesh, annotate shardings, let XLA insert the
collectives.

  * mesh axes ('data', 'model'): batch dimension sharded over 'data';
    'model' reserved for tensor-parallel sharding of the transformer bottleneck
    (heads divide over 'model') — at these model sizes DP is the win, so the
    default mesh is (n_devices, 1).
  * parameters are replicated; gradients are reduced by XLA-emitted psums from the
    sharded-batch jit — no hand-written collectives.
  * inference shards the image batch the same way (streaming config 5 of
    BASELINE.json: bf16 two-stage, data-parallel over v5e-8).

Everything uses plain jax.jit with NamedSharding in/out specs (pjit is jit now).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Place a host batch pytree with the leading axis sharded over 'data'."""
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params/opt state) across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def _batch_spec(mesh: Mesh):
    return NamedSharding(mesh, P("data"))


def make_sharded_seg_train_step(model, tx, mesh: Mesh, *, loss_fn=None, n_refine=2):
    """Data-parallel version of train.seg.make_seg_train_step: batch sharded over
    'data', state replicated; XLA inserts the gradient all-reduce.

    NOTE on BatchNorm: each shard computes batch statistics from its local batch
    inside the jitted graph; XLA's SPMD partitioner reduces the moments globally
    because the batch axis is a sharded dimension of one program — semantics equal
    to single-device training on the full batch (unlike torch DDP's per-replica BN).
    """
    from unet_goolenet_tpu.train.seg import make_seg_train_step
    from unet_goolenet_tpu.train.losses import dc_and_bce_loss

    step = make_seg_train_step(
        model, tx, loss_fn=loss_fn or dc_and_bce_loss, n_refine=n_refine
    )
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(rep, data, data),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_tp_dp_seg_train_step(model, tx, mesh: Mesh, *, loss_fn=None, n_refine=2):
    """tp+dp train step: batch sharded over 'data', parameters sharded by the
    tensor-parallel rules in parallel.tp over 'model' (replicated where no rule).

    Placement contract: the caller shards params with tp.shard_params and builds
    opt_state AFTER sharding (optax zeros_like inherits shardings); jit then
    infers in/out shardings from the committed inputs and XLA SPMD inserts the
    collectives.
    """
    from unet_goolenet_tpu.train.seg import make_seg_train_step
    from unet_goolenet_tpu.train.losses import dc_and_bce_loss

    step = make_seg_train_step(
        model, tx, loss_fn=loss_fn or dc_and_bce_loss, n_refine=n_refine
    )
    return jax.jit(step, donate_argnums=(0,))


def make_sharded_cls_train_step(model, tx, mesh: Mesh, *, n_refine=2,
                                aux_weight: float = 0.0):
    """Data-parallel stage-2 train step (分类/ROI_main.py:198-241 semantics via
    train.cls.make_cls_train_step): imgs/labels/se_out sharded over 'data', state
    and rng replicated; XLA SPMD emits the gradient all-reduce. `aux_weight`
    forwards to the aux-loss extension (needs aux_logits=True on the model)."""
    from unet_goolenet_tpu.train.cls import make_cls_train_step

    step = make_cls_train_step(model, tx, n_refine=n_refine,
                               aux_weight=aux_weight)
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(rep, data, data, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_tp_dp_cls_train_step(model, tx, mesh: Mesh, *, n_refine=2):
    """tp+dp stage-2 train step: batch over 'data', GoogLeNet wide-tail branch
    convs column-sharded over 'model' by parallel.tp's rules. Same placement
    contract as make_tp_dp_seg_train_step (params sharded by the caller with
    tp.shard_params, opt_state built after sharding).

    NB `mesh` is intentionally unused (kept for API symmetry with the dp
    factories): no in/out shardings are applied here — placement comes entirely
    from GSPMD propagation of the caller-sharded params/batch, as tests/test_tp
    verifies. The same holds for make_tp_dp_seg_train_step above."""
    from unet_goolenet_tpu.train.cls import make_cls_train_step

    del mesh  # see docstring
    step = make_cls_train_step(model, tx, n_refine=n_refine)
    return jax.jit(step, donate_argnums=(0,))


def make_sharded_pipeline(pipeline, mesh: Mesh, *, source: str = "gray"):
    """Shard the fused two-stage inference over 'data': returns a callable with
    the batch axis divided across the mesh (state replicated). `source` picks
    the pipeline entry point:

      * "gray"   — fused-from-gray graph (raw (N,H,W) grayscale -> output dict;
                   分类/test.py:122-134 re-architected, the north-star path)
      * "rgb"    — host-preprocessed (N,S,S,3) pseudo-RGB -> output dict
                   (apps/infer_e2e's default ingest path)
      * "grades" — fused-from-gray, returns ONLY the (N,) int grades
                   (streaming/serving: nothing bulky crosses the host link)
      * "grades_padded" — size-bucket serving (edge-padded grays + per-image
                   valid sizes, both sharded over 'data'; apps/infer_e2e
                   --size-buckets --data-parallel)
    """
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    jitted = {"gray": pipeline._e2e, "rgb": pipeline._e2e_from_rgb,
              "grades": pipeline._grades,
              "grades_padded": pipeline._grades_padded}[source]
    n_batch_args = 2 if source == "grades_padded" else 1

    if any(getattr(pipeline, f, False)
           for f in ("fused_up1", "fused_up2", "fused_up34", "fused_down1")):
        # A pallas_call cannot be GSPMD-partitioned, but under shard_map each
        # device traces its OWN per-shard program — the fused Pallas up1 tail
        # runs per-device and only the batch axis is split, so the dp-sharded
        # serving path keeps the single-chip kernel wins (grade parity vs the
        # single-device pipeline:
        # tests/test_parallel.py::test_sharded_pipeline_fused_up1_parity)
        fn = jax.jit(jax.shard_map(
            jitted.__wrapped__, mesh=mesh,
            in_specs=(P(), P()) + (P("data"),) * n_batch_args,
            out_specs=P("data"),
            # pallas_call outputs carry no varying-mesh-axes annotation
            check_vma=False,
        ))
    else:
        fn = jax.jit(
            jitted.__wrapped__,
            in_shardings=(rep, rep) + (data,) * n_batch_args,
            out_shardings=data,
        )

    # Pin the replicated var trees ONCE (re-pinned only if the pipeline's
    # trees are swapped): passing pipeline.unet_vars (uncommitted,
    # single-device) straight into the jit would re-broadcast the full
    # weights across the mesh on EVERY call — tens of MB per micro-batch on
    # the serving hot path. Same identity-keyed cache as pp.make_pp_pipeline.
    put = lambda tree: jax.device_put(tree, rep)
    pinned = {}

    def run(*batch_args):
        src = (pipeline.unet_vars, pipeline.gnet_vars)
        cached = pinned.get("src")
        if cached is None or cached[0] is not src[0] or cached[1] is not src[1]:
            pinned["src"] = src
            pinned["vars"] = (put(src[0]), put(src[1]))
        uv, gv = pinned["vars"]
        batch_args = tuple(jnp.asarray(b) for b in batch_args)
        return fn(uv, gv, *batch_args)

    return run
