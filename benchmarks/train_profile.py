"""Per-segment profile of the seg train step (VERDICT r2 weak #2: explain the
flat batch-8->32 scaling and the fwd-vs-train roofline gap).

Times, scan-amortised on the default (TPU) backend:
  fwd        one train-mode forward (BN batch stats), flax or packed engine
  fwd+bwd    value_and_grad of the loss through that forward
  step       the full n=2 refinement train step (2x fwd+bwd + 2 optimizer
             updates, 分割/main.py:149-189 semantics)

Usage: python benchmarks/train_profile.py [--batch 8] [--bf16] [--packed]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def scan_time(fn, state, args, iters=20):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(state, args):
        def body(st, _):
            st, out = fn(st, *args)
            return st, out
        st, outs = jax.lax.scan(body, state, None, length=iters)
        return st, outs

    _ = jax.tree_util.tree_map(np.asarray, run(state, args)[1])  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.tree_util.tree_map(np.asarray, run(state, args)[1])
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1000


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--packed", action="store_true")
    ap.add_argument("--flat-opt", action="store_true",
                    help="AdamW on one raveled vector (optim.make_adamw_flat)")
    ap.add_argument("--flat-state", action="store_true",
                    help="flat-state training: params stay one raveled vector "
                         "(seg.flatten_seg_state) — no per-step tree<->vector "
                         "copies, unlike --flat-opt")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from unet_goolenet_tpu.models import UNetTaskAligWeight
    from unet_goolenet_tpu.train import optim
    from unet_goolenet_tpu.train.losses import dc_and_bce_loss
    from unet_goolenet_tpu.train.seg import (
        flatten_seg_state,
        init_seg_state,
        make_seg_train_step,
    )

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = UNetTaskAligWeight(n_classes=1, dtype=dtype)
    tx = (optim.make_adamw_flat(1e-4) if (args.flat_opt or args.flat_state)
          else optim.make_adamw(1e-4))
    state = init_seg_state(model, tx, jax.random.PRNGKey(0),
                           input_shape=(1, 224, 224, 3))
    unravel = None
    if args.flat_state:
        state, unravel = flatten_seg_state(state, tx)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (args.batch, 224, 224, 3))
    labels = (jax.random.uniform(jax.random.PRNGKey(2),
                                 (args.batch, 224, 224, 1)) > 0.7
              ).astype(jnp.float32)

    if args.packed:
        from unet_goolenet_tpu.pipeline.engine_train import (
            unet_forward_packed_train,
        )

        def fwd(p, stats, x):
            return unet_forward_packed_train(p, stats, x.astype(dtype))
    else:
        def fwd(p, stats, x):
            out, mut = model.apply({"params": p, "batch_stats": stats}, x,
                                   train=True, mutable=["batch_stats"])
            return out, mut["batch_stats"]

    if unravel is not None:
        tree_fwd = fwd

        def fwd(p, stats, x):
            return tree_fwd(unravel(p), stats, x)

    # -- fwd only: carry batch_stats so the scan has a real dependency chain
    def fwd_step(st, x):
        out, new_stats = fwd(st.params, st.batch_stats, x)
        return st._replace(batch_stats=new_stats), jnp.sum(
            out.astype(jnp.float32))

    t_fwd = scan_time(fwd_step, state, (imgs,), args.iters)

    # -- fwd+bwd: grads computed, params NOT updated (isolates optimizer cost)
    def fb_step(st, x, y):
        def losses(p):
            out, new_stats = fwd(p, st.batch_stats, x)
            return dc_and_bce_loss(out, y), new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            losses, has_aux=True)(st.params)
        gnorm = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                    for g in jax.tree_util.tree_leaves(grads))
        return st._replace(batch_stats=new_stats), (loss, gnorm)

    t_fb = scan_time(fb_step, state, (imgs, labels), args.iters)

    # -- optimizer only: tx.update + apply_updates on frozen grads (uses the
    # params themselves as a stand-in grad tree — same shapes/dtypes, and the
    # carried opt_state/params keep the scan's dependency chain real). Times
    # ONE update; the n=2 step pays this twice.
    def opt_step(st, grads):
        updates, opt_state = tx.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        return st._replace(params=params, opt_state=opt_state), jnp.float32(0)

    t_opt = scan_time(opt_step, state, (state.params,), args.iters)

    # -- refinement glue alone: sigmoid -> per-image conf -> imgs compound
    # (main.py:164-175), carried so scan can't elide it
    def glue_step(carry, _unused):
        temp, cur = carry
        temps = jax.nn.sigmoid(temp)
        conf = jnp.mean(jnp.abs(0.5 - temps) * 2.0,
                        axis=tuple(range(1, temps.ndim)), keepdims=True)
        cur = cur + temps * conf
        return (temp + 1.0, cur), jnp.float32(0)

    glue_carry = (jnp.zeros((args.batch, 224, 224, 1), dtype), imgs.astype(dtype))
    t_glue = scan_time(glue_step, glue_carry, (jnp.float32(0),), args.iters)

    # -- full refinement step
    step = make_seg_train_step(
        model, tx, forward="engine-packed" if args.packed else "flax",
        unravel=unravel)

    def full_step(st, x, y):
        st, metrics = step(st, x, y)
        return st, metrics["loss"]

    t_full = scan_time(full_step, state, (imgs, labels), args.iters)

    print(json.dumps({
        "batch": args.batch, "bf16": bool(args.bf16),
        "packed": bool(args.packed), "flat_opt": bool(args.flat_opt),
        "flat_state": bool(args.flat_state),
        "fwd_ms": round(t_fwd, 2),
        "fwd_bwd_ms": round(t_fb, 2),
        "full_step_ms": round(t_full, 2),
        "bwd_only_ms": round(t_fb - t_fwd, 2),
        "non_fb_ms": round(t_full - 2 * t_fb, 2),
        "opt_ms": round(t_opt, 2),
        "glue_ms": round(t_glue, 2),
        "unattributed_ms": round(t_full - 2 * t_fb - 2 * t_opt - t_glue, 2),
        "img_per_s": round(args.batch / (t_full / 1000), 1),
    }))


if __name__ == "__main__":
    main()
