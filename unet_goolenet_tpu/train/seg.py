"""Stage-1 (segmentation) training: the iterative-refinement train step, jitted.

Reproduces 分割/main.py:149-189 exactly, but as ONE compiled XLA graph per batch
instead of n=2 eager passes with a host round trip:

  pass 0: out0 = model(imgs); loss; optimizer update          (params θ0 -> θ1)
  pass 1: p = sigmoid(stop_grad(out0))                        (detach+cpu in the ref)
          conf_i = mean(|0.5 - p_i| * 2) per image            (main.py:172-174)
          imgs' = imgs + p * conf                             (confidence feedback)
          out1 = model_θ1(imgs'); loss; optimizer update      (θ1 -> θ2)

BatchNorm batch_stats advance through both passes sequentially, as in the reference.
The returned loss matches main.py:187-189: mean of both passes.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.flatten_util  # ravel_pytree lives under the explicit import
import jax.numpy as jnp
import optax

from unet_goolenet_tpu.train.losses import dc_and_bce_loss


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any


def make_seg_train_step(
    model,
    tx: optax.GradientTransformation,
    *,
    loss_fn: Callable = dc_and_bce_loss,
    n_refine: int = 2,
    forward: str = "flax",
    remat: tuple = (),
    unravel: Callable = None,
) -> Callable:
    """Build a jittable train step: (state, imgs NHWC, labels (N,H,W,1)) ->
    (state, metrics dict).

    forward="engine-packed" swaps the flax apply for the hand-scheduled
    pixel-packed train forward (pipeline/engine_train.py) — same math to float
    tolerance, measured faster on TPU (benchmarks/RESULTS.md); flagship
    UNetTaskAligWeight with even image width only. remat selects engine
    levels to jax.checkpoint (see unet_forward_packed_train), ("all",) to
    rematerialise the whole forward, or ("first",) to checkpoint ONLY the
    refinement's pass-0 forward (pass 1 keeps its activations — the
    refinement-scoped HBM trade, VERDICT r3 ask #7); identical values,
    backward trades HBM loads of saved activations for recompute.

    unravel (from flatten_seg_state) switches the step to FLAT-STATE training:
    state.params is ONE raveled f32 vector, unravel()'d inside the loss so
    autodiff emits the gradient flat (the unravel's adjoint is one
    concat pass) and the optimizer runs as a handful of full-vector kernels
    instead of 169 per-leaf ones. Pair with optim.make_adamw_flat, whose
    ravel_pytree of an already-flat vector is a no-op — unlike the --flat-opt
    A/B (RESULTS.md queue 8), no per-step tree<->vector copies exist. Same
    update rule to the bit (test_train.py flat parity tests). Measured
    NEGATIVE on chip (RESULTS.md queue 10): the optimizer/glue do compress,
    but the unravel's param slicing breaks XLA's backward fusion (bwd 12.92
    -> 16.05 ms at b8) — stays opt-in; the default tree step is faster."""

    if forward in ("engine-packed", "engine-packed-dense-up1"):
        from unet_goolenet_tpu.pipeline.engine_train import (
            unet_forward_packed_train,
        )
        bad = set(remat) - {"all", "up1", "up2", "inc", "first"}
        if bad:
            raise ValueError(f"unknown remat level(s) {sorted(bad)}; "
                             f"choose from up1, up2, inc, all, first")
        level_remat = tuple(r for r in remat if r not in ("all", "first"))
        dense_up1 = forward == "engine-packed-dense-up1"

        def fwd(p, batch_stats, imgs):
            # the engine's compute dtype is the input dtype; honour the
            # model's configured dtype (bf16 mixed precision) like flax does
            return unet_forward_packed_train(
                p, batch_stats, imgs.astype(model.dtype), remat=level_remat,
                dense_up1=dense_up1)

        if "all" in remat:
            fwd = jax.checkpoint(fwd)
    elif forward == "flax":
        if remat:
            # same silent-flag-combination class as train_seg's
            # --engine-forward + --data-parallel guard (ADVICE r2)
            raise ValueError("remat= applies to forward='engine-packed' only")

        def fwd(p, batch_stats, imgs):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                imgs,
                train=True,
                mutable=["batch_stats"],
            )
            return out, mut["batch_stats"]
    else:
        raise ValueError(f"unknown forward {forward!r}")

    remat_first = forward == "engine-packed" and "first" in remat

    if unravel is not None:
        tree_fwd = fwd

        def fwd(p, batch_stats, imgs):
            return tree_fwd(unravel(p), batch_stats, imgs)

    def one_pass(params, batch_stats, opt_state, imgs, labels,
                 fwd_fn=None):
        fwd_fn = fwd_fn or fwd

        def losses(p):
            out, new_stats = fwd_fn(p, batch_stats, imgs)
            return loss_fn(out, labels), (out, new_stats)

        (loss, (out, new_stats)), grads = jax.value_and_grad(losses, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss, out

    def train_step(state: TrainState, imgs: jax.Array, labels: jax.Array):
        params, stats, opt_state = state
        total = jnp.float32(0.0)
        temp = None  # the reference's tempPred: set from pass 0, re-sigmoided and
        cur_imgs = imgs  # compounded onto the (mutated) imgs every later pass
        for i in range(n_refine):
            if i > 0:
                temp = jax.nn.sigmoid(temp)  # main.py:164 — re-applied each pass
                conf = jnp.mean(
                    jnp.abs(0.5 - temp) * 2.0,
                    axis=tuple(range(1, temp.ndim)), keepdims=True,
                )
                cur_imgs = cur_imgs + temp * conf  # main.py:175: imgs compound
            # remat=('first',): checkpoint ONLY pass 0's forward — its
            # backward recomputes activations instead of holding a second
            # full activation set in HBM alongside pass 1's, the refinement-
            # scoped alternative to the measured-negative whole-graph remat
            # (RESULTS.md queue 6b; VERDICT r3 ask #7)
            pass_fwd = jax.checkpoint(fwd) if (remat_first and i == 0) else None
            params, stats, opt_state, loss, out = one_pass(
                params, stats, opt_state, cur_imgs, labels, fwd_fn=pass_fwd
            )
            if i == 0:
                temp = jax.lax.stop_gradient(out)  # main.py:162 detach
            total = total + loss
        metrics = {"loss": total / n_refine, "seg_loss": total}
        return TrainState(params, stats, opt_state), metrics

    return train_step


def make_seg_eval_step(model, *, loss_fn: Callable = dc_and_bce_loss) -> Callable:
    """Jittable val step (main.py:106-146): loss + thresholded masks."""

    def eval_step(state: TrainState, imgs: jax.Array, labels: jax.Array):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            imgs,
            train=False,
        )
        loss = loss_fn(out, labels)
        masks = (jax.nn.sigmoid(out) > 0.5).astype(jnp.float32)
        return loss, masks

    return eval_step


def init_seg_state(model, tx, rng, input_shape=(1, 224, 224, 3)) -> TrainState:
    variables = model.init({"params": rng}, jnp.zeros(input_shape), train=False)
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )


def flatten_seg_state(state: TrainState, tx_flat) -> Tuple[TrainState, Callable]:
    """Convert a tree-params TrainState into the flat-state form: params as
    ONE raveled f32 vector, opt_state re-initialised for it (tx_flat =
    optim.make_adamw_flat; moments start at zero, so convert BEFORE training —
    a mid-run conversion would drop the accumulated moments). Returns
    (flat_state, unravel); pass unravel to make_seg_train_step. Unravel the
    params for eval/checkpointing with unravel(state.params)."""
    flat, unravel = jax.flatten_util.ravel_pytree(state.params)
    return TrainState(
        params=flat,
        batch_stats=state.batch_stats,
        opt_state=tx_flat.init(flat),
    ), unravel
