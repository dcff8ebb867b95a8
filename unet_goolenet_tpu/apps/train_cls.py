"""Stage-2 GoogLeNet training CLI (reference: 分类/ROI_main.py).

Architecture difference from the reference (the TPU win): the reference runs the
frozen UNet *inside Dataset.__getitem__* one image at a time on the GPU, forcing
num_workers=0 (ROI_main.py:290-291). Here the loader yields batches of wavelet
pseudo-RGB images and ONE jitted graph does frozen-UNet -> mask -> bbox -> crop for
the whole batch on device; the GoogLeNet train step (with the refinement feedback
from the full-image seg logits, ROI_main.py:209-226) consumes the crops directly.
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from unet_goolenet_tpu.data import ClsDataset, DataLoader
from unet_goolenet_tpu.eval import ClsMetrics
from unet_goolenet_tpu.models import UNetTaskAligWeight, GoogLeNetClassifier
from unet_goolenet_tpu.parallel import multihost as mh
from unet_goolenet_tpu.pipeline.two_stage import extract_roi
from unet_goolenet_tpu.train import optim
from unet_goolenet_tpu.train.checkpoint import CheckpointManager
from unet_goolenet_tpu.train.cls import (
    init_cls_state,
    make_cls_train_step,
    make_cls_eval_step,
)
from unet_goolenet_tpu.train.seg import TrainState, init_seg_state
from unet_goolenet_tpu.utils import seed_everything, MetricLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train the stage-2 GoogLeNet grader")
    p.add_argument("--train-dir", required=True)
    p.add_argument("--val-dir", required=True)
    p.add_argument("--unet-checkpoint", required=True,
                   help="frozen stage-1 checkpoint used for ROI extraction")
    p.add_argument("--epochs", type=int, default=250)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--save-dir", default="checkpoint/cls")
    p.add_argument("--resume", default=None)
    p.add_argument("--warm-start", default=None)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--num-classes", type=int, default=6)
    p.add_argument("--crop-augment", choices=["device", "none"], default="device",
                   help="augment ROI crops on device (flips/rot/blur/jitter)")
    p.add_argument("--aux-weight", type=float, default=0.0,
                   help=">0 enables GoogLeNet aux heads + paper-style aux CE loss")
    p.add_argument("--bf16", action="store_true",
                   help="mixed-precision training: bf16 compute, f32 params/"
                        "optimizer (opt-in performance mode; reference is f32)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard train batches (and the frozen-UNet ROI "
                        "extraction) over all devices, state replicated; XLA "
                        "inserts the gradient all-reduce. Requires --batch-size "
                        "divisible by the device count; short final train "
                        "batches are dropped")
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
                   help="fully device-resident training: stage the wavelet images "
                        "once; each epoch runs frozen-UNet ROI extraction, crop "
                        "augmentation, and ALL train steps as compiled programs")
    p.add_argument("--engine-roi", choices=["auto", "on", "off"], default="auto",
                   help="run the frozen-UNet ROI extraction through the packed "
                        "engine forward (pipeline/engine.py) instead of the flax "
                        "apply — same numerics up to f32 summation order, "
                        "measured faster on TPU (benchmarks/RESULTS.md r2b). "
                        "'auto' = on for TPU backends with an even --img-size")
    return p.parse_args(argv)


def make_roi_extractor(unet, unet_vars, img_size: int, *, engine: bool,
                       fused: bool = False):
    """The batched frozen-UNet -> masks -> (crops, full-image logits) graph
    (the reference runs this per image inside Dataset.__getitem__,
    分类/ROI_main.py:142-162 + util/roi.py:12-51).

    engine=True swaps the flax apply for the packed engine forward
    (numerically identical up to f32 summation order, tests/test_engine.py);
    fused=True additionally enables the fused Pallas decoder/encoder levels —
    single-device serving only (pallas_call does not partition under a GSPMD
    jit; the dp extract path relies on GSPMD propagation, so dp keeps
    fused=False just like parallel/mesh.make_sharded_pipeline's shard_map
    note)."""
    if engine:
        from unet_goolenet_tpu.pipeline import engine as _engine

        def unet_fwd(v, imgs):
            return _engine.unet_forward_packed(
                v, imgs, fused_up1=fused, fused_up2=fused,
                fused_up34=fused, fused_down1=fused)
    else:
        def unet_fwd(v, imgs):
            return unet.apply(v, imgs, train=False)

    @jax.jit
    def extract(imgs):
        logits = unet_fwd(unet_vars, imgs)
        masks = (jax.nn.sigmoid(logits[..., 0]) > 0.5).astype(jnp.float32)
        crops, _ = extract_roi(imgs, masks, out_hw=(img_size, img_size))
        return crops, logits

    return extract


def main(argv=None):
    args = parse_args(argv)
    if args.data_parallel and args.device_epoch:
        # the device-epoch runner stages/steps on one device; silently ignoring
        # either flag would misreport what ran
        raise SystemExit("--data-parallel cannot be combined with --device-epoch")
    if args.multihost:
        if not args.data_parallel:
            raise SystemExit("--multihost requires --data-parallel")
        # before any JAX API touches devices
        mh.init_distributed(args.coordinator, args.num_processes,
                            args.process_id)
    if args.engine_roi == "on" and args.img_size % 2 != 0:
        # the packed engine forward needs an even width; silently falling back
        # to the flax extractor would misreport what ran (same contract as the
        # --engine-forward/--data-parallel guard in train_seg.py)
        raise SystemExit("--engine-roi on requires an even --img-size "
                         f"(got {args.img_size}); use --engine-roi auto/off")
    key = seed_everything(args.seed)
    main_proc = mh.is_main()
    logger = MetricLogger(args.log_dir if main_proc else None, "train_cls")

    mesh = None
    if args.data_parallel and len(jax.devices()) > 1:
        from unet_goolenet_tpu.parallel import make_mesh

        mesh = make_mesh()
        # multihost: --batch-size is per process, so the divisibility that
        # makes the GLOBAL batch shardable is against the LOCAL device count
        divisor = (jax.local_device_count() if args.multihost
                   else mesh.shape["data"])
        if args.batch_size % divisor:
            raise SystemExit(f"--data-parallel: --batch-size {args.batch_size} "
                             f"must be divisible by the device count "
                             f"{divisor}")
    # on a single-device/single-process rig the flag is inert: every multihost
    # code path below degrades to the plain single-device flow
    multihost = args.multihost and mesh is not None

    rng_np = np.random.default_rng(args.seed)
    train_ds = ClsDataset(args.train_dir, img_size=args.img_size, train=True, rng=rng_np)
    val_ds = ClsDataset(args.val_dir, img_size=args.img_size, train=False)
    if multihost:
        # per-process contiguous stripes, equalised so collective step counts
        # match across hosts (multihost.stripe docstring)
        train_ds = mh.stripe(train_ds)
        val_ds = mh.stripe(val_ds, even=False)  # local eval: keep the tail
    train_loader = DataLoader(train_ds, args.batch_size, shuffle=True, seed=args.seed,
                              drop_last=mesh is not None)
    val_loader = DataLoader(val_ds, args.batch_size)

    # frozen stage-1 model
    unet = UNetTaskAligWeight(n_classes=1)
    seg_tx = optim.make_adamw()
    seg_state = init_seg_state(unet, seg_tx, key,
                               input_shape=(1, args.img_size, args.img_size, 3))
    seg_mgr = CheckpointManager(".")
    seg_state, _ = seg_mgr.restore(args.unet_checkpoint, seg_state)
    unet_vars = {"params": seg_state.params, "batch_stats": seg_state.batch_stats}
    unet_vars_host = None
    if mesh is not None:
        from unet_goolenet_tpu.parallel import replicate

        # frozen-UNet ROI extraction shards by GSPMD propagation: vars
        # replicated on the mesh + batch sharded over 'data' below
        if multihost:
            # global placement: device_put cannot reach other hosts' devices.
            # Keep a host copy for the LOCAL eval extractor below (a jit over
            # global vars with this host's val images would mix addressable
            # and non-addressable arrays).
            unet_vars_host = jax.device_get(unet_vars)
            unet_vars = mh.replicate_global(mesh, unet_vars_host)
        else:
            unet_vars = replicate(mesh, unet_vars)

    use_engine = args.img_size % 2 == 0 and (
        args.engine_roi == "on"
        or (args.engine_roi == "auto" and jax.default_backend() not in ("cpu",)))
    extract = make_roi_extractor(
        unet, unet_vars, args.img_size, engine=use_engine,
        # the fused Pallas up1 tail compiles on TPU only (pltpu primitives)
        fused=use_engine and mesh is None
        and jax.default_backend() == "tpu")
    # multihost eval runs each host's val stripe through a LOCAL extractor
    # (no collectives, so stripes need not stay in lockstep batch-for-batch)
    extract_eval = extract
    if multihost:
        extract_eval = make_roi_extractor(
            unet, unet_vars_host, args.img_size, engine=use_engine, fused=False)

    # device-resident ROI-crop augmentation (the reference does this on host per
    # item, ROI_main.py:117-122; here it joins the jitted batch path)
    crop_augment = None
    if args.crop_augment == "device":
        from unet_goolenet_tpu.data.augment import AugmentConfig
        from unet_goolenet_tpu.data.augment_device import make_device_augment

        crop_augment = make_device_augment(AugmentConfig.cls_train(args.img_size))

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = GoogLeNetClassifier(num_classes=args.num_classes,
                                aux_logits=args.aux_weight > 0, dtype=dtype)
    tx = optim.make_adamw(args.lr)
    state = init_cls_state(model, tx, key,
                           input_shape=(1, args.img_size, args.img_size, 3))
    mgr = CheckpointManager(args.save_dir, periodic_every=10)
    start_epoch = 0
    if args.resume:
        state, start_epoch = mgr.restore(args.resume, state)
    elif args.warm_start:
        state, _ = mgr.restore(args.warm_start, state)

    if mesh is not None:
        from unet_goolenet_tpu.parallel import (
            make_sharded_cls_train_step, replicate)

        if multihost:
            state = mh.replicate_global(mesh, jax.device_get(state))
            lr_put = lambda v: mh.replicate_global(mesh, np.float32(v))
        else:
            state = replicate(mesh, state)
            lr_put = lambda v: v
        train_step = make_sharded_cls_train_step(model, tx, mesh,
                                                 aux_weight=args.aux_weight)
    else:
        train_step = jax.jit(
            make_cls_train_step(model, tx, aux_weight=args.aux_weight),
            donate_argnums=0)
        lr_put = lambda v: v
    eval_step = jax.jit(make_cls_eval_step(model))

    epoch_runner = None
    staged = None
    if args.device_epoch:
        from unet_goolenet_tpu.train.epoch import make_cls_epoch_runner

        all_imgs = np.stack([train_ds[i]["image"] for i in range(len(train_ds))])
        all_labels = np.asarray(
            [train_ds[i]["cl_label"] for i in range(len(train_ds))], np.int32)
        staged = (jnp.asarray(all_imgs), jnp.asarray(all_labels))
        epoch_runner = make_cls_epoch_runner(
            make_cls_train_step(model, tx, aux_weight=args.aux_weight),
            args.batch_size)

        def run_device_epoch(state, key):
            imgs, labels = staged
            crops, se_out = extract(imgs)
            if crop_augment is not None:
                key, akey = jax.random.split(key)
                crops = crop_augment(akey, crops)
            return epoch_runner(state, crops, labels, se_out, key)

    plateau = optim.plateau_init(args.lr)
    stopper = optim.EarlyStopper(patience=300, lr_threshold=args.lr, extension=20)
    best_val_loss = float("inf")
    best_acc = 0.0
    rng = jax.random.PRNGKey(args.seed)

    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        optim.set_learning_rate(state.opt_state, lr_put(plateau.lr))
        if args.device_epoch:
            rng, sub = jax.random.split(rng)
            state, loss = run_device_epoch(state, sub)
            train_loss = float(loss)
        else:
            train_losses = []
            for batch in train_loader:
                if multihost:
                    # this host's stripe of the global batch -> global arrays
                    imgs, labels = mh.global_batch(
                        mesh, (np.asarray(batch["image"]),
                               np.asarray(batch["cl_label"])))
                else:
                    imgs = jnp.asarray(batch["image"])
                    labels = jnp.asarray(batch["cl_label"])
                    if mesh is not None:
                        from unet_goolenet_tpu.parallel import shard_batch

                        imgs, labels = shard_batch(mesh, (imgs, labels))
                crops, se_out = extract(imgs)
                rng, sub = jax.random.split(rng)
                if crop_augment is not None:
                    rng, asub = jax.random.split(rng)
                    if multihost:
                        # keys are identical on every process (same seed, same
                        # split sequence); make the placement explicit so the
                        # global-array jits never mix in committed local arrays
                        asub = mh.replicate_global(mesh, np.asarray(asub))
                    crops = crop_augment(asub, crops)
                if multihost:
                    sub = mh.replicate_global(mesh, np.asarray(sub))
                state, metrics = train_step(state, crops, labels, se_out, sub)
                train_losses.append(metrics["loss"])
            train_loss = float(jnp.mean(jnp.stack(train_losses)))

        cls_metrics = ClsMetrics(num_classes=args.num_classes)
        # multihost: eval each host's val stripe locally on a local replica of
        # the replicated state (keeps the jits single-process; pinned once per
        # epoch so the tree is not re-uploaded per batch), then weight-average
        # losses/scores across processes so every host's plateau / early-stop /
        # best-checkpoint control flow stays identical
        eval_state = TrainState(params=mh.local_replica(state.params),
                                batch_stats=mh.local_replica(state.batch_stats),
                                opt_state=None) if multihost else state
        val_losses = []
        for batch in val_loader:
            crops, _ = extract_eval(jnp.asarray(batch["image"]))
            loss, logits = eval_step(eval_state, crops,
                                     jnp.asarray(batch["cl_label"]))
            val_losses.append(float(loss))
            cls_metrics.update(logits, batch["cl_label"])
        val_loss = float(np.mean(val_losses))
        scores = cls_metrics.aggregate()
        if multihost:
            from unet_goolenet_tpu.eval.metrics import macro_accuracy, macro_f1

            w = float(len(val_ds))
            val_loss = mh.process_mean(val_loss, w)
            # confusion is COUNTS: sum it globally and recompute f1/accuracy
            # EXACTLY from the global matrix (a weighted mean of per-stripe
            # macro scores diverges whenever stripes see different class
            # subsets, e.g. a class-ordered label.txt under contiguous
            # striping). auroc is rank-based and not cm-recoverable, so it
            # stays a weighted mean of the per-stripe values.
            cm = mh.process_sum(scores["confusion"])
            auroc = scores["auroc"]
            scores = {
                "f1": macro_f1(cm),
                "accuracy": macro_accuracy(cm),
                "auroc": mh.process_mean(
                    0.0 if np.isnan(auroc) else float(auroc),
                    0.0 if np.isnan(auroc) else w),
                "confusion": cm,
            }

        plateau = optim.plateau_step(plateau, jnp.float32(train_loss))
        logger.log(epoch, train_loss=train_loss, val_loss=val_loss,
                   f1=scores["f1"], acc=scores["accuracy"], auroc=scores["auroc"],
                   lr=float(plateau.lr), secs=time.time() - t0)

        # multihost: EVERY process calls the save methods (orbax saves are
        # collective — primary-only calls deadlock at orbax's save_start
        # barrier); the decisions below are lockstep because val_loss/scores
        # are process-averaged above. --save-dir must be shared storage.
        if val_loss < best_val_loss:
            best_val_loss = val_loss
            mgr.save_best_loss(state, epoch)
        if scores["accuracy"] > best_acc:
            best_acc = scores["accuracy"]
            mgr.save_best_metric(state, epoch, tag="acc")
        mgr.save_periodic(state, epoch)
        if stopper.update(val_loss, float(plateau.lr)):
            print(f"early stop at epoch {epoch}", flush=True)
            break
    print(f"done: best_val_loss={best_val_loss:.4f} best_acc={best_acc:.4f}",
          flush=True)
    if multihost:
        # hold fast hosts until process 0 finishes checkpoint writes — an
        # early exit trips jax.distributed's shutdown barrier (multihost.sync)
        mh.sync("train_cls_done")


if __name__ == "__main__":
    main()
