"""Pipeline parallelism for the two-stage graph (GPipe-style, shard_map+ppermute).

The reference has no parallelism of any kind (SURVEY.md §2); the natural
pipeline decomposition of its serving path (分类/test.py:122-134) is

    stage 0: gray -> wavelet -> resize -> UNet -> mask -> bbox -> crop
    stage 1: crop -> GoogLeNet -> argmax grade

This module maps the two stages onto a ('stage',) mesh axis of size 2 and
streams microbatches through them: each scan tick, device 0 runs stage 0 on
microbatch t while device 1 runs stage 1 on microbatch t-1, with the crop
buffer handed off over ICI by `jax.lax.ppermute` — the textbook bubble of a
depth-2 pipeline (1 tick fill, 1 tick drain).

Measured reality check (benchmarks/RESULTS.md r2): the UNet is ~94% of the
fused graph's time, so a 2-stage pipeline is utilisation-bound at ~53% on the
stage-1 device and **data parallelism remains the production layout** for this
model family (parallel/mesh.make_sharded_pipeline). PP is provided as a
first-class topology for deployments where stage 2 grows to parity (bigger
classifier heads, ensembles) — and as the `pp` leg of the distributed test
matrix (tests/test_pp.py asserts grade-parity vs the single-device pipeline).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from unet_goolenet_tpu.pipeline import engine as _engine
from unet_goolenet_tpu.pipeline.two_stage import (
    extract_roi,
    preprocess_gray,
)


def make_stage_mesh(devices=None) -> Mesh:
    """A ('stage',) mesh over two devices (the pipeline depth is fixed at 2:
    the reference graph has exactly two models)."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= 2, "pipeline parallelism needs >= 2 devices"
    return Mesh(np.asarray(devices[:2]), axis_names=("stage",))


def make_pp_pipeline(pipeline, mesh: Mesh) -> Callable:
    """Build the pipeline-parallel runner for a TwoStagePipeline.

    Returns run(grays: (M, b, H, W) float32) -> grades (M, b) int32 — M
    microbatches of b images each; numerics identical to the single-device
    fused graph (tests/test_pp.py).
    """
    assert mesh.shape["stage"] == 2
    size = pipeline.img_size
    hw = (size, size)
    dtype = pipeline.dtype
    use_packed = size % 2 == 0

    def stage0(unet_vars, gray):
        imgs = preprocess_gray(
            gray, out_hw=hw,
            mxu_layout=getattr(pipeline, "mxu_preprocess", False)).astype(dtype)
        if pipeline.use_engine:
            # shard_map traces a per-device program, so the fused Pallas up1
            # tail stays available here just like in the dp runner (mesh.py)
            fwd = (partial(_engine.unet_forward_packed,
                           fused_up1=pipeline.fused_up1,
                           fused_up2=getattr(pipeline, "fused_up2", False),
                           fused_up34=getattr(pipeline, "fused_up34", False),
                           fused_down1=getattr(pipeline, "fused_down1",
                                               False))
                   if use_packed else _engine.unet_forward)
            logits = fwd(unet_vars, imgs)
        else:
            logits = pipeline.unet.apply(unet_vars, imgs, train=False)
        masks = (jax.nn.sigmoid(logits[..., 0]) > 0.5).astype(jnp.float32)
        # same ROI-crop form as the single-device graph (mxu_roi picks the
        # weight-matrix crop) so the documented grade parity holds on TPU too
        crops, _ = extract_roi(imgs, masks, padding=pipeline.padding, out_hw=hw,
                               matmul=getattr(pipeline, "mxu_roi", False))
        return crops

    def stage1(gnet_vars, crops):
        if pipeline.use_engine:
            cls_logits = _engine.gnet_forward(
                gnet_vars, crops,
                s2d_stem=getattr(pipeline, "s2d_stem", False))
        else:
            cls_logits = pipeline.gnet.apply(gnet_vars, crops, train=False)
        return jnp.argmax(cls_logits, axis=-1).astype(jnp.int32)

    def spmd(unet_vars, gnet_vars, grays):
        # runs identically on both 'stage' devices; lax.cond picks each
        # device's role, ppermute moves the crop buffer 0 -> 1 each tick
        idx = jax.lax.axis_index("stage")
        m, b = grays.shape[0], grays.shape[1]
        zero_crops = jnp.zeros((b, size, size, 3), dtype)
        pad_tick = jnp.zeros((1,) + grays.shape[1:], grays.dtype)
        stream = jnp.concatenate([grays, pad_tick], axis=0)  # drain tick

        vary = lambda x: jax.lax.pcast(x, ("stage",), to="varying")

        def tick(buf, g_t):
            g_t = vary(g_t)  # each device branches on its role -> varying
            my_crops = jax.lax.cond(
                idx == 0, lambda: stage0(unet_vars, g_t),
                lambda: vary(zero_crops))
            grades = jax.lax.cond(
                idx == 1, lambda: stage1(gnet_vars, buf),
                lambda: vary(jnp.zeros((b,), jnp.int32)))
            buf = jax.lax.ppermute(my_crops, "stage", perm=[(0, 1)])
            return buf, grades

        # the carry becomes device-varying after cond/ppermute — mark the
        # initial value varying over 'stage' so scan's carry types line up
        buf0 = jax.lax.pcast(zero_crops, ("stage",), to="varying")
        _, grades = jax.lax.scan(tick, buf0, stream)  # (M+1, b)
        # device 1 emitted microbatch t's grades at tick t+1; make both
        # devices return them so the output is replicated
        grades = jax.lax.psum(grades, "stage")  # dev0's zeros + dev1's values
        return grades[1:]

    fn = jax.jit(shard_map(
        spmd, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        # pallas_call outputs carry no varying-mesh-axes annotation (the
        # fused up1 tail); the pcast role-branching stays valid without the
        # checker (same pattern as make_sharded_pipeline in mesh.py)
        check_vma=False,
    ))

    rep = jax.NamedSharding(mesh, P())

    def _pin(x):
        # reshard onto THIS mesh (the vars may live on a different/larger mesh,
        # e.g. the dp mesh in __graft_entry__'s dryrun). device_put reshards
        # device-to-device when the runtime allows; the device_get fallback
        # covers cross-backend copies (it round-trips the weights through the
        # host, which is slow on the ~1 MB/s dev tunnel — once per var tree).
        try:
            return jax.device_put(x, rep)
        except (ValueError, jax.errors.JaxRuntimeError):
            return jax.device_put(jax.device_get(x), rep)

    put = lambda tree: jax.tree_util.tree_map(_pin, tree)
    pinned = {}  # re-read pipeline.*_vars each run(); re-pin only when swapped

    def run(grays):
        # cache key = the source trees themselves, compared by identity; the
        # held references keep the old trees alive, so a swapped-in tree can
        # never alias a freed one's id (an id()-tuple key could)
        src = (pipeline.unet_vars, pipeline.gnet_vars)
        cached = pinned.get("src")
        if cached is None or cached[0] is not src[0] or cached[1] is not src[1]:
            pinned["src"] = src
            pinned["vars"] = (put(src[0]), put(src[1]))
        uv, gv = pinned["vars"]
        return fn(uv, gv, jax.device_put(grays, rep))

    return run
