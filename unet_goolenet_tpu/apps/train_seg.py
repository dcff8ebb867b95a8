"""Stage-1 UNet training CLI (reference: 分割/main.py).

Example:
    python -m unet_goolenet_tpu.apps.train_seg \
        --train-dir BUSI_1/train --val-dir BUSI_1/val \
        --epochs 250 --batch-size 4 --img-size 224 --save-dir checkpoint/seg
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from unet_goolenet_tpu.data import SegDataset, DataLoader
from unet_goolenet_tpu.eval import SegMetrics
from unet_goolenet_tpu.models import UNetTaskAligWeight
from unet_goolenet_tpu.parallel import make_mesh, replicate, shard_batch, \
    make_sharded_seg_train_step
from unet_goolenet_tpu.parallel import multihost as mh
from unet_goolenet_tpu.train import optim
from unet_goolenet_tpu.train.checkpoint import CheckpointManager
from unet_goolenet_tpu.train.seg import (
    TrainState,
    init_seg_state,
    make_seg_train_step,
    make_seg_eval_step,
)
from unet_goolenet_tpu.utils import seed_everything, MetricLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train the stage-1 segmentation UNet")
    p.add_argument("--train-dir", required=True)
    p.add_argument("--val-dir", required=True)
    p.add_argument("--epochs", type=int, default=250)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--save-dir", default="checkpoint/seg")
    p.add_argument("--resume", default=None, help="checkpoint dir to resume from")
    p.add_argument("--warm-start", default=None, help="checkpoint to load weights from")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the batch over all devices")
    p.add_argument("--multihost", action="store_true",
                   help="pod-scale run: one process per host over a global "
                        "mesh (requires --data-parallel; --batch-size is PER "
                        "PROCESS; --save-dir/--resume must be shared storage)")
    p.add_argument("--coordinator", default=None,
                   help="process-0 host:port for --multihost (omit on TPU "
                        "pods: all three process-group args auto-detect)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--device-epoch", action="store_true",
                   help="fully device-resident training: stage the dataset once, "
                        "augment on device, run each epoch as ONE jitted scan "
                        "(augmentation then acts on the resized images rather "
                        "than raw-size ones — semantically close, not identical)")
    p.add_argument("--log-dir", default=None)
    p.add_argument("--hausdorff", action="store_true",
                   help="compute the (host-side) Hausdorff val metric")
    p.add_argument("--engine-forward", action="store_true",
                   help="use the pixel-packed engine train forward "
                        "(pipeline/engine_train.py; single-device path, even "
                        "image size) — same math as flax apply to float "
                        "tolerance, measured faster on TPU")
    p.add_argument("--bf16", action="store_true",
                   help="mixed-precision training: bf16 compute, f32 params/"
                        "optimizer (standard TPU recipe; the reference trains "
                        "f32, so this is an opt-in performance mode)")
    p.add_argument("--remat", default="",
                   help="comma-separated jax.checkpoint scopes for the "
                        "engine forward: up1,up2,inc (per level), all (whole "
                        "forward), first (refinement pass 0 only). Opt-in "
                        "memory/compute trade — measured SLOWER at the "
                        "flagship batch sizes (RESULTS.md queues 6b, 16); "
                        "for memory-limited regimes")
    p.add_argument("--flat-opt", action="store_true",
                   help="AdamW on one raveled parameter vector instead of "
                        "per-leaf (optim.make_adamw_flat; identical update "
                        "rule, different execution schedule). Checkpoints are "
                        "not interchangeable with the default optimizer's — "
                        "resume with the same flag it was saved with")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.multihost:
        if not args.data_parallel:
            raise SystemExit("--multihost requires --data-parallel")
        if args.device_epoch:
            raise SystemExit("--multihost with --device-epoch is not wired "
                             "(the device-resident epoch stages the FULL "
                             "dataset per process)")
        # before any JAX API touches devices
        mh.init_distributed(args.coordinator, args.num_processes,
                            args.process_id)
    key = seed_everything(args.seed)
    main_proc = mh.is_main()
    logger = MetricLogger(args.log_dir if main_proc else None, "train_seg")

    if args.data_parallel and args.engine_forward:
        # the packed engine train forward is only wired into the single-device
        # branch below; silently ignoring the flag would misreport what ran
        raise SystemExit(
            "--engine-forward is a single-device path; it cannot be combined "
            "with --data-parallel (the sharded step uses the flax forward)")
    if args.remat and not args.engine_forward:
        # checked HERE, not only in the single-device branch: --remat
        # --data-parallel would otherwise build the sharded step without
        # remat and silently ignore the flag (ADVICE r4; same class as the
        # --engine-forward guard above)
        raise SystemExit("--remat requires --engine-forward")
    mesh = None
    if args.data_parallel and len(jax.devices()) > 1:
        mesh = make_mesh()
        # multihost: --batch-size is per process, so the divisibility that
        # makes the GLOBAL batch shardable is against the LOCAL device count
        divisor = (jax.local_device_count() if args.multihost
                   else mesh.shape["data"])
        if args.batch_size % divisor:
            raise SystemExit(f"--data-parallel: --batch-size {args.batch_size} "
                             f"must be divisible by the device count {divisor}")
    # on a single-device/single-process rig the flag is inert: every multihost
    # code path below degrades to the plain single-device flow
    multihost = args.multihost and mesh is not None

    rng_np = np.random.default_rng(args.seed)
    train_ds = SegDataset(args.train_dir, img_size=args.img_size, train=True, rng=rng_np)
    val_ds = SegDataset(args.val_dir, img_size=args.img_size, train=False)
    if multihost:
        # per-process contiguous stripes, equalised so collective step counts
        # match across hosts (multihost.stripe docstring)
        train_ds = mh.stripe(train_ds)
        val_ds = mh.stripe(val_ds, even=False)  # local eval: keep the tail
    train_loader = DataLoader(train_ds, args.batch_size, shuffle=True,
                              drop_last=args.data_parallel, seed=args.seed)
    val_loader = DataLoader(val_ds, args.batch_size)

    model = UNetTaskAligWeight(
        n_classes=1, dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    tx = (optim.make_adamw_flat(args.lr) if args.flat_opt
          else optim.make_adamw(args.lr))
    state = init_seg_state(model, tx, key,
                           input_shape=(1, args.img_size, args.img_size, 3))
    mgr = CheckpointManager(args.save_dir)
    start_epoch = 0
    if args.resume:
        state, start_epoch = mgr.restore(args.resume, state)
        print(f"resumed from {args.resume} at epoch {start_epoch}", flush=True)
    elif args.warm_start:
        state, _ = mgr.restore(args.warm_start, state)
        print(f"warm start from {args.warm_start}", flush=True)

    if mesh is not None:
        if multihost:
            # global placement: device_put cannot reach other hosts' devices
            state = mh.replicate_global(mesh, jax.device_get(state))
            put = lambda b: mh.global_batch(mesh, b)
            lr_put = lambda v: mh.replicate_global(mesh, np.float32(v))
        else:
            state = replicate(mesh, state)
            put = lambda b: shard_batch(mesh, b)
            lr_put = lambda v: v
        train_step = make_sharded_seg_train_step(model, tx, mesh)
    else:
        fwd = "engine-packed" if args.engine_forward else "flax"
        remat = tuple(args.remat.split(",")) if args.remat else ()
        train_step = jax.jit(
            make_seg_train_step(model, tx, forward=fwd, remat=remat),
            donate_argnums=0)
        put = lambda b: b
        lr_put = lambda v: v
    eval_step = jax.jit(make_seg_eval_step(model))

    epoch_runner = None
    device_data = None
    if args.device_epoch:
        from unet_goolenet_tpu.data.augment import AugmentConfig
        from unet_goolenet_tpu.data.augment_device import make_device_augment
        from unet_goolenet_tpu.train.epoch import make_epoch_runner

        # stage the full (eval-resized) training set on device once
        eval_ds = SegDataset(args.train_dir, img_size=args.img_size, train=False)
        all_imgs = np.stack([eval_ds[i]["image"] for i in range(len(eval_ds))])
        all_masks = np.stack(
            [eval_ds[i]["se_label"][..., 0] for i in range(len(eval_ds))]
        ).astype(np.int32)
        device_data = (jnp.asarray(all_imgs), jnp.asarray(all_masks))
        augment = make_device_augment(
            AugmentConfig.seg_train(args.img_size), with_mask=True)
        epoch_runner = make_epoch_runner(
            make_seg_train_step(model, tx), args.batch_size)

        def run_device_epoch(state, key):
            akey, skey = jax.random.split(key)
            imgs, masks = augment(akey, *device_data)
            return epoch_runner(
                state, imgs, masks[..., None].astype(jnp.float32), skey)

    plateau = optim.plateau_init(args.lr)
    stopper = optim.EarlyStopper(patience=50, lr_threshold=args.lr, extension=20)
    best_val_loss = float("inf")
    best_dice = 0.0

    epoch_key = jax.random.PRNGKey(args.seed)
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        optim.set_learning_rate(state.opt_state, lr_put(plateau.lr))
        if args.device_epoch:
            epoch_key, sub = jax.random.split(epoch_key)
            state, loss = run_device_epoch(state, sub)
            train_loss = float(loss)
        else:
            train_losses = []
            for batch in train_loader:
                b = put({"imgs": batch["image"], "labels": batch["se_label"]})
                state, metrics = train_step(state, b["imgs"], b["labels"])
                train_losses.append(metrics["loss"])
            train_loss = float(jnp.mean(jnp.stack(train_losses)))

        seg_metrics = SegMetrics(empty_pred_hack=True,
                                 compute_hausdorff=args.hausdorff)
        # multihost: eval each host's val stripe locally (a local replica of
        # the replicated state keeps the jit single-process — global params
        # with local images would mix addressable and non-addressable arrays;
        # pinning it once per epoch avoids re-uploading the tree per batch),
        # then weight-average losses/scores across processes so every host's
        # plateau / early-stop / best-checkpoint control flow stays identical
        eval_state = TrainState(params=mh.local_replica(state.params),
                                batch_stats=mh.local_replica(state.batch_stats),
                                opt_state=None) if multihost else state
        val_losses = []
        for batch in val_loader:
            loss, masks = eval_step(eval_state, jnp.asarray(batch["image"]),
                                    jnp.asarray(batch["se_label"]))
            val_losses.append(float(loss))
            seg_metrics.update(masks, batch["se_label"])
        val_loss = float(np.mean(val_losses))
        scores = seg_metrics.aggregate()
        if multihost:
            w = float(len(val_ds))
            val_loss = mh.process_mean(val_loss, w)
            scores = {  # NaN = undefined on this stripe -> weight 0
                k: mh.process_mean(0.0 if np.isnan(v) else float(v),
                                   0.0 if np.isnan(v) else w)
                for k, v in scores.items()}

        plateau = optim.plateau_step(plateau, jnp.float32(train_loss))
        logger.log(epoch, train_loss=train_loss, val_loss=val_loss,
                   lr=float(plateau.lr), secs=time.time() - t0, **{
                       k: v for k, v in scores.items() if not np.isnan(v)})

        # multihost: EVERY process calls the save methods (orbax saves are
        # collective — primary-only calls deadlock at orbax's save_start
        # barrier); the decisions below are lockstep because val_loss/scores
        # are process-averaged above. --save-dir must be shared storage.
        if val_loss < best_val_loss:
            best_val_loss = val_loss
            mgr.save_best_loss(state, epoch)
        if scores["dice"] > best_dice:
            best_dice = scores["dice"]
            mgr.save_best_metric(state, epoch, tag="seg")
        if stopper.update(val_loss, float(plateau.lr)):
            print(f"early stop at epoch {epoch}", flush=True)
            break
    print(f"done: best_val_loss={best_val_loss:.4f} best_dice={best_dice:.4f}",
          flush=True)
    if multihost:
        # hold fast hosts until process 0 finishes checkpoint writes — an
        # early exit trips jax.distributed's shutdown barrier (multihost.sync)
        mh.sync("train_seg_done")


if __name__ == "__main__":
    main()
