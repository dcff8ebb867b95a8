"""The fused segment -> crop -> classify pipeline (the BASELINE.json north star).

The reference's end-to-end path (分类/test.py:122-134 + 分类/util/roi.py:12-51)
crosses host<->device 4+ times per image: wavelet+resize on host, UNet on device,
mask back to host, bbox+crop on host, crop back to device for GoogLeNet. Here the
entire path is ONE jitted XLA graph:

    gray (N,H,W) --wavelet_enhance--> pseudo-RGB --resize 224--> UNet -->
    sigmoid>0.5 --> bbox(+pad 30, centre fallback) --> crop-and-resize 224 -->
    R/B channel swap (the reference's BGR2RGB, roi.py:44) --> GoogLeNet --> grades

Zero host round trips; bf16 variants for streaming throughput.

Semantics notes:
  * the reference runs `wavelet_enhance` at the original resolution and then
    PIL-resizes to 224 (test.py:128-130); `preprocess_gray` mirrors that order.
  * stage-2 crops are taken from the SAME 224 pseudo-RGB tensor the UNet saw
    (roi.py:39), then channel-swapped — so the classifier sees (B, G, R) of the
    wavelet image. Quirk preserved.
  * empty masks fall back to a centre crop (roi.py:26-31).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from unet_goolenet_tpu import ops
from unet_goolenet_tpu.pipeline import engine as _engine


def preprocess_gray(
    gray: jax.Array, *, out_hw: Tuple[int, int] = (224, 224),
    quantize_uint8: bool = True, mxu_layout: bool = False,
    fast_resize: bool = False,
) -> jax.Array:
    """(N, H, W) raw grayscale [0,255] -> (N, oh, ow, 3) wavelet pseudo-RGB in [0,1].

    wavelet at native resolution, then PIL-semantics (antialiased) bilinear resize —
    the order and kernels of 分类/test.py:127-130.

    mxu_layout=True runs the separable resize in NCHW: the weight-matrix dots
    keep the image width as the minor dim instead of the 3-channel stack
    (which lane-pads 3 -> 128 on TPU); only the small (oh, ow) output is
    transposed back. Same math per channel — parity in
    tests/test_pipeline.py."""
    enhanced = jax.vmap(partial(ops.wavelet_enhance, quantize_uint8=quantize_uint8,
                                channel_first=mxu_layout,
                                # uint8 wavelet->resize boundary: BIT-exact
                                # (the resize dequantizes with the identical
                                # /255 division) and 4x less HBM — measured
                                # −0.75 ms at b128 (RESULTS.md queue 19)
                                out_uint8=mxu_layout and quantize_uint8))(gray)
    if mxu_layout:
        out = ops.resize_bilinear(
            enhanced, out_hw, antialias=True, channel_first=True,
            precision="default" if fast_resize else "highest")
        return jnp.moveaxis(out, 1, -1)
    return ops.resize_bilinear(enhanced, out_hw, antialias=True)


def preprocess_gray_padded(
    gray: jax.Array, valid_hw: jax.Array, *,
    out_hw: Tuple[int, int] = (224, 224), quantize_uint8: bool = True,
    mxu_layout: bool = False,
) -> jax.Array:
    """Size-bucket variant of preprocess_gray: gray is (N, H, W) with each
    image edge-padded (np.pad mode='edge') into the shared bucket buffer and
    valid_hw (N, 2) carrying the true per-image sizes. Wavelet + min-max run
    mask-aware over the valid region, and the final antialiased resize anchors
    to it — so normalisation and geometry match the exact-shape path
    (分类/test.py:127-130) up to boundary-kernel effects."""

    def one(g, vhw):
        rgb = ops.wavelet_enhance_padded(g, vhw, quantize_uint8=quantize_uint8,
                                         channel_first=mxu_layout)
        return ops.resize_bilinear_valid(rgb, vhw, out_hw, antialias=True,
                                         channel_first=mxu_layout)

    out = jax.vmap(one)(gray, valid_hw)
    return jnp.moveaxis(out, 1, -1) if mxu_layout else out


def segment(unet, unet_vars, imgs: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """UNet forward + threshold: returns (logits (N,H,W,1), masks (N,H,W))."""
    logits = unet.apply(unet_vars, imgs, train=False)
    masks = (jax.nn.sigmoid(logits[..., 0]) > 0.5).astype(jnp.float32)
    return logits, masks


def extract_roi(
    imgs: jax.Array, masks: jax.Array, *, padding: int = 30,
    out_hw: Tuple[int, int] = (224, 224), swap_rb: bool = True,
    matmul: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Batched mask->bbox->crop with the reference's R/B swap. Returns
    (crops (N,oh,ow,3), boxes (N,4)). matmul=True uses the MXU-form crop
    (ops.bbox.crop_and_resize_matmul — TwoStagePipeline's TPU default)."""
    crops, boxes = jax.vmap(
        lambda i, m: ops.roi_from_mask(i, m, padding=padding, out_hw=out_hw,
                                       matmul=matmul)
    )(imgs, masks)
    if swap_rb:
        crops = crops[..., ::-1]
    return crops, boxes


class TwoStagePipeline:
    """Bundles the two models into fused, jitted inference callables.

    Typical use:
        pipe = TwoStagePipeline(unet, unet_vars, gnet, gnet_vars)
        grades, masks, boxes = pipe.infer_from_gray(gray_batch)   # e2e, one jit
        masks = pipe.infer_masks(rgb_batch)                       # stage 1 only
    """

    def __init__(self, unet, unet_vars, gnet, gnet_vars, *, img_size: int = 224,
                 padding: int = 30, dtype=jnp.float32, use_engine: bool = True,
                 fused_up1: bool = None, fused_up2: bool = None,
                 fused_up34: bool = None, fused_down1: bool = None,
                 dense_batch_min: int = None, dense_fused_up1: bool = None,
                 dense_up2: str = "dense", dense_up34: bool = False,
                 mxu_preprocess: bool = None, mxu_roi: bool = None,
                 s2d_stem: bool = None, fast_resize: bool = False,
                 gnet_merge_1x1: bool = False):
        self.unet = unet
        self.gnet = gnet
        self.unet_vars = unet_vars
        self.gnet_vars = gnet_vars
        self.img_size = img_size
        self.padding = padding
        self.dtype = dtype
        self.use_engine = use_engine
        if fused_up1 is None:
            # the Pallas up1 kernel compiles on TPU only (pltpu primitives);
            # measured 1.5x over the XLA packed level (RESULTS.md r3) -> on.
            fused_up1 = jax.default_backend() == "tpu"
        if fused_up2 is None:
            # the ISOLATED level A/B favours the fused kernel (7.60 vs 8.80 ms
            # @ batch 64 bf16, RESULTS.md queue 3), but the WHOLE-forward A/B
            # (queue 5) has it losing at both batch 64 (47.40 vs 45.90 ms) and
            # batch 128 (96.42 vs 92.15): the Pallas call breaks XLA's
            # cross-level fusion with up1's deconv, which outweighs the
            # in-level win -> off.
            fused_up2 = False
        if fused_up34 is None:
            # up3/up4 fused kernels still fail the real Mosaic lowering
            # (dma_start in the dense halo copy; the CPU cross-lowering gate
            # passes, so the reject is backend-version specific) and XLA runs
            # those dense levels at 64-78% roofline anyway -> off.
            fused_up34 = False
        if fused_down1 is None:
            # measured on chip 2026-08-19: fused 5.45 ms vs XLA 4.14 @ batch
            # 64 — the pool+down1 level is MXU-bound and XLA wins -> off.
            fused_down1 = False
        self.fused_up1 = fused_up1
        self.fused_up2 = fused_up2
        self.fused_up34 = fused_up34
        self.fused_down1 = fused_down1
        if dense_batch_min is None:
            # queue-5 whole-forward A/B (bf16): packed+fused-up1 wins at
            # batch 64 (45.90 vs dense 57.18 ms), dense wins at batch 128
            # (86.26 vs 92.15). 128 = the first measured point where dense
            # leads. CPU keeps the packed path (the parity-tested default).
            dense_batch_min = 128 if jax.default_backend() == "tpu" else None
        elif dense_batch_min <= 0:
            dense_batch_min = None
        self.dense_batch_min = dense_batch_min
        if dense_fused_up1 is None:
            # HYBRID default, measured queue 9 (RESULTS.md): the dense trunk
            # with the packed fused up1+outc Pallas tail beats plain dense at
            # the official batch 128 — e2e 1325.6 vs 1313.6 img/s, level-scale
            # fused tail 25.97 ms vs dense up1 30.36. TPU-only (pltpu kernel).
            dense_fused_up1 = jax.default_backend() == "tpu"
        self.dense_fused_up1 = dense_fused_up1
        # where the dense branch switches to packed layout: "dense" keeps
        # dense up2 (queue-9 default), "packed"/"fused"/"fused_dense" run up2
        # packed-XLA / Pallas ahead of the fused up1 tail (A/B knob,
        # engine.unet_forward)
        self.dense_up2 = dense_up2
        # dense fused Pallas up3/up4 in the dense branch (runnable since the
        # sublane-alignment fix; A/B knob BENCH_UP34, RESULTS.md queue 20)
        self.dense_up34 = dense_up34
        if mxu_preprocess is None:
            # NCHW-layout preprocess resize: same per-channel math (parity in
            # tests/test_pipeline.py), better lane use on TPU
            mxu_preprocess = jax.default_backend() not in ("cpu",)
        self.mxu_preprocess = mxu_preprocess
        # opt-in: bf16-precision antialias resize dots (−1.5 ms at b128,
        # value delta ~1 uint8 level — NOT reference parity; ops/resize.py)
        self.fast_resize = fast_resize and mxu_preprocess
        if mxu_roi is None:
            # weight-matrix-form ROI crop (ops.bbox.crop_and_resize_matmul)
            mxu_roi = jax.default_backend() not in ("cpu",)
        self.mxu_roi = mxu_roi
        if s2d_stem is None:
            # GoogLeNet 7x7/2 stem in space-to-depth matmul form
            s2d_stem = jax.default_backend() not in ("cpu",)
        self.s2d_stem = s2d_stem
        # each inception module's three same-input 1x1 convs as ONE conv
        # (exact math, tests/test_engine.py) — A/B knob, benchmarks/gnet_attr
        self.gnet_merge_1x1 = gnet_merge_1x1

        hw = (img_size, img_size)

        # serving path: the BN-folded engine forwards (pipeline/engine.py) save
        # one full normalisation pass over every conv activation; numerics match
        # model.apply to float tolerance (tests/test_engine.py), and the flax
        # path stays available with use_engine=False for bit-level debugging.
        # The 64-channel levels additionally run in pixel-packed layout
        # (ops/packed.py; measured 1.13x on the whole UNet forward) whenever
        # the image width is even; fused_up1/fused_up2 run those decoder
        # levels as single VMEM-resident Pallas kernels (ops/pallas/up{1,2}).
        # The packed/fused layout win is BATCH-DEPENDENT (queue-5 profile,
        # RESULTS.md): at batch 64 packed(+fused up1/up2) is fastest, at batch
        # 128 the plain dense forward wins (86.3 vs 96.4 ms whole-fwd bf16).
        # dense_batch_min selects the crossover: batches >= it take the dense
        # forward, smaller ones the packed(+fused) one. jit re-traces per
        # batch shape, so the Python branch below is free at runtime.
        unet_engine_fwd_packed = (
            partial(_engine.unet_forward_packed, fused_up1=fused_up1,
                    fused_up2=fused_up2, fused_up34=fused_up34,
                    fused_down1=fused_down1)
            if img_size % 2 == 0 else None)

        def unet_engine_fwd(unet_vars, imgs):
            n = imgs.shape[0]
            # A jax.export symbolic batch dim (shape_poly) is not an int and
            # can't be compared against the crossover — one exported graph
            # must serve every batch. Ship the packed graph (the
            # below-crossover default); exporters can force the dense one by
            # building the pipeline with dense_batch_min=1.
            dense = unet_engine_fwd_packed is None or (
                dense_batch_min is not None and isinstance(n, int)
                and n >= dense_batch_min) or (
                dense_batch_min is not None and dense_batch_min <= 1)
            if dense:
                return _engine.unet_forward(unet_vars, imgs,
                                            fused_up1=dense_fused_up1,
                                            up2=dense_up2,
                                            fused_up34=dense_up34)
            return unet_engine_fwd_packed(unet_vars, imgs)

        def _seg(unet_vars, imgs):
            if use_engine:
                logits = unet_engine_fwd(unet_vars, imgs)
                masks = (jax.nn.sigmoid(logits[..., 0]) > 0.5).astype(jnp.float32)
                return logits, masks
            return segment(self.unet, unet_vars, imgs)

        def _cls(gnet_vars, crops):
            if use_engine:
                return _engine.gnet_forward(gnet_vars, crops,
                                            s2d_stem=s2d_stem,
                                            merge_1x1=gnet_merge_1x1)
            return self.gnet.apply(gnet_vars, crops, train=False)

        def _e2e(unet_vars, gnet_vars, gray):
            imgs = preprocess_gray(gray, out_hw=hw,
                                   mxu_layout=mxu_preprocess,
                                   fast_resize=self.fast_resize).astype(dtype)
            logits, masks = _seg(unet_vars, imgs)
            crops, boxes = extract_roi(imgs, masks, padding=padding, out_hw=hw,
                                       matmul=mxu_roi)
            cls_logits = _cls(gnet_vars, crops)
            grades = jnp.argmax(cls_logits, axis=-1)
            return {
                "grades": grades,
                "cls_logits": cls_logits,
                "masks": masks,
                "boxes": boxes,
                "seg_logits": logits,
            }

        def _e2e_from_rgb(unet_vars, gnet_vars, imgs):
            logits, masks = _seg(unet_vars, imgs.astype(dtype))
            crops, boxes = extract_roi(imgs.astype(dtype), masks,
                                       padding=padding, out_hw=hw,
                                       matmul=mxu_roi)
            cls_logits = _cls(gnet_vars, crops)
            return {
                "grades": jnp.argmax(cls_logits, axis=-1),
                "cls_logits": cls_logits,
                "masks": masks,
                "boxes": boxes,
                "seg_logits": logits,
            }

        def _masks(unet_vars, imgs):
            _, masks = _seg(unet_vars, imgs.astype(dtype))
            return masks

        def _grades_only(unet_vars, gnet_vars, gray):
            # bench/streaming variant: returns ONLY the (N,) grades so no bulky
            # intermediate leaves the device (host links can be slow; on the axon
            # dev tunnel, returning the full dict costs seconds of transfer)
            return _e2e(unet_vars, gnet_vars, gray)["grades"]

        def _grades_padded(unet_vars, gnet_vars, gray, valid_hw):
            # size-bucket serving: mixed native resolutions share one compiled
            # graph per bucket (apps/infer_e2e --size-buckets)
            imgs = preprocess_gray_padded(
                gray, valid_hw, out_hw=hw,
                mxu_layout=mxu_preprocess).astype(dtype)
            _, masks = _seg(unet_vars, imgs)
            crops, _ = extract_roi(imgs, masks, padding=padding, out_hw=hw,
                                   matmul=mxu_roi)
            return jnp.argmax(_cls(gnet_vars, crops), axis=-1)

        self._e2e = jax.jit(_e2e)
        self._e2e_from_rgb = jax.jit(_e2e_from_rgb)
        self._masks = jax.jit(_masks)
        self._grades = jax.jit(_grades_only)
        self._grades_padded = jax.jit(_grades_padded)

    def infer_from_gray(self, gray: jax.Array) -> dict:
        """Full pipeline from raw grayscale (N, H, W) in [0, 255]."""
        return self._e2e(self.unet_vars, self.gnet_vars, gray)

    def infer_grades(self, gray: jax.Array) -> jax.Array:
        """Throughput variant: raw grayscale -> (N,) int grades, nothing else."""
        return self._grades(self.unet_vars, self.gnet_vars, gray)

    def infer_grades_padded(self, gray: jax.Array, valid_hw) -> jax.Array:
        """Size-bucket variant: (N, H, W) edge-padded grays + (N, 2) valid
        sizes -> (N,) grades. One compile per bucket shape."""
        return self._grades_padded(self.unet_vars, self.gnet_vars, gray,
                                   jnp.asarray(valid_hw, jnp.int32))

    def infer_from_rgb(self, imgs: jax.Array) -> dict:
        """Pipeline from already-preprocessed (N, S, S, 3) images in [0, 1]."""
        return self._e2e_from_rgb(self.unet_vars, self.gnet_vars, imgs)

    def infer_masks(self, imgs: jax.Array) -> jax.Array:
        """Stage 1 only (分割/predict.py path)."""
        return self._masks(self.unet_vars, imgs)
