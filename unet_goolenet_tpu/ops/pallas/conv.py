"""Pallas TPU kernels for the UNet's hot ops (SURVEY.md §3.5: the conv stack is
~85% of FLOPs), with custom VJPs (BASELINE.json: backward conv/transposed-conv
Pallas kernels).

Design notes (per the Pallas TPU guide):
  * conv3x3 is lowered as NINE shifted (TH*W, Cin) @ (Cin, Cout) matmuls over a
    row-tile — the MXU-native formulation; no im2col materialisation. Each tap
    is a separate BlockSpec-pipelined view of the padded input (nine-view
    formulation): zero in-kernel DMA/slicing, so Mosaic alignment constraints
    never apply. Row tiles are chosen against a lane-padded VMEM budget.
  * the BatchNorm epilogue (scale*conv+bias, folded running stats) and ReLU fuse
    into the same kernel — one HBM round trip for the whole ConvBatchNorm block.
  * backward dx reuses the forward kernel with rotated/transposed weights (a
    stride-1 conv's input grad is itself a stride-1 conv); backward dw is a
    Pallas kernel accumulating 9 (Cin, Cout) matmuls across a sequential grid
    (TPU grids are sequential, so output revisiting is safe).
  * f32 accumulation always; activations may be bf16.

Shapes are restricted to stride 1 / pad 1 / H divisible by the row tile; the
wrapper falls back to the XLA path otherwise (parity oracle: ops.conv2d).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unet_goolenet_tpu.ops import conv as xla_conv

_INTERPRET = False  # flipped by tests on CPU


def _row_tile(h: int, *, budget_bytes: Optional[int] = None) -> Optional[int]:
    for th in (16, 8, 4, 2, 1):
        if h % th == 0 and (budget_bytes is None or budget_bytes(th) < 12_000_000):
            return th
    return None


def _conv_tile(h: int, w: int, cin: int, cout: int, itemsize: int) -> Optional[int]:
    """Largest row tile whose double-buffered nine views + output + f32
    accumulator fit the ~16MB VMEM (12MB budget leaves headroom)."""

    # Mosaic pads the lane (last) dim to 128, so VMEM cost uses padded channels
    cin_p = -(-cin // 128) * 128
    cout_p = -(-cout // 128) * 128

    def bytes_for(th):
        views = 9 * 2 * th * w * cin_p * itemsize     # double-buffered inputs
        out = 2 * th * w * cout_p * itemsize
        acc = th * w * cout_p * 4                      # f32 accumulator
        wts = 9 * cin_p * cout_p * itemsize + 8 * cout_p
        return views + out + acc + wts

    return _row_tile(h, budget_bytes=bytes_for)


# ------------------------------------------------------------------ forward


def _shifted_views(x: jax.Array):
    """Nine tap-aligned views of the zero-padded input, each (N, H, W, C).

    Trading 9x input reads for a kernel with ZERO in-kernel slicing/DMA: every
    tap is a plain BlockSpec-pipelined operand, so Mosaic's tiling/alignment
    constraints never bite (the halo-DMA formulation trips them — see module
    docstring history). Input bytes are small next to conv FLOPs at these
    shapes, so the extra traffic is in the noise.
    """
    n, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return [
        jax.lax.slice(xp, (0, dy, dx, 0), (n, dy + h, dx + wd, c))
        for dy in range(3)
        for dx in range(3)
    ]


def _fwd_kernel(*refs, th, w, cin, cout, relu):
    tap_refs = refs[:9]
    w_ref, sb_ref, out_ref = refs[9], refs[10], refs[11]
    acc = jnp.zeros((th * w, cout), jnp.float32)
    for t in range(9):
        xv = tap_refs[t][0].reshape(th * w, cin)
        acc += jnp.dot(xv, w_ref[t // 3, t % 3],
                       preferred_element_type=jnp.float32)
    scale = sb_ref[0]
    bias = sb_ref[1]
    y = acc * scale[None, :] + bias[None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.reshape(th, w, cout).astype(out_ref.dtype)


def _fused_conv3x3_fwd_impl(
    x: jax.Array, w: jax.Array, scale: jax.Array, bias: jax.Array, relu: bool
) -> jax.Array:
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    th = _conv_tile(h, wd, cin, cout, x.dtype.itemsize)
    views = _shifted_views(x)
    sb = jnp.stack([scale.astype(jnp.float32), bias.astype(jnp.float32)])
    kernel = functools.partial(
        _fwd_kernel, th=th, w=wd, cin=cin, cout=cout, relu=relu
    )
    block = pl.BlockSpec((1, th, wd, cin), lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=[block] * 9 + [
            pl.BlockSpec((3, 3, cin, cout), lambda ni, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cout), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wd, cout), lambda ni, i: (ni, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype),
        interpret=_INTERPRET,
    )(*views, w.astype(x.dtype), sb)


# ------------------------------------------------------------------ backward


def _dw_kernel(*refs, th, w, cin, cout):
    tap_refs = refs[:9]
    g_ref, dw_ref = refs[9], refs[10]
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    gv = g_ref[0].reshape(th * w, cout).astype(jnp.float32)
    for t in range(9):
        xv = tap_refs[t][0].reshape(th * w, cin).astype(jnp.float32)
        dw_ref[t // 3, t % 3] += jnp.dot(
            xv.T, gv, preferred_element_type=jnp.float32
        ).astype(dw_ref.dtype)


def _conv3x3_dw_impl(x: jax.Array, g: jax.Array) -> jax.Array:
    """dw[dy,dx,ci,co] = sum_{n,y,x} x_pad[n,y+dy,x+dx,ci] * g[n,y,x,co].
    Same nine-view formulation as the forward; the (3,3,Cin,Cout) output block is
    revisited across the sequential TPU grid and accumulated in place."""
    n, h, wd, cin = x.shape
    cout = g.shape[-1]
    th = _conv_tile(h, wd, cin, cout, x.dtype.itemsize)
    views = _shifted_views(x)
    kernel = functools.partial(_dw_kernel, th=th, w=wd, cin=cin, cout=cout)
    block = pl.BlockSpec((1, th, wd, cin), lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM)
    gblock = pl.BlockSpec((1, th, wd, cout), lambda ni, i: (ni, i, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=[block] * 9 + [gblock],
        out_specs=pl.BlockSpec((3, 3, cin, cout), lambda ni, i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 3, cin, cout), jnp.float32),
        interpret=_INTERPRET,
    )(*views, g)


# ------------------------------------------------------------- public op + VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_conv3x3(x, w, scale, bias, relu=True):
    """y = [relu](conv3x3_p1(x, w) * scale + bias).

    `scale`/`bias` carry folded inference-mode BatchNorm (ops.fold_batchnorm) or
    plain (ones, conv-bias)."""
    return _fused_conv3x3_fwd_impl(x, w, scale, bias, relu)


def _fused_fwd(x, w, scale, bias, relu):
    y = _fused_conv3x3_fwd_impl(x, w, scale, bias, relu)
    return y, (x, w, scale, bias, y)


def _fused_bwd(relu, res, gy):
    x, w, scale, bias, y = res
    gy = gy.astype(jnp.float32)
    if relu:
        gy = gy * (y > 0)
    # epilogue grads
    spatial = (0, 1, 2)
    gbias = jnp.sum(gy, axis=spatial)
    # conv output = (y' - bias)/scale pre-epilogue; recompute conv for gscale:
    # gscale = sum(gy * conv_out); conv_out = (y - bias)/scale for non-relu parts —
    # for relu outputs, y>0 region has conv_out=(y-bias)/scale; y==0 region has
    # gy==0 so the value there is irrelevant.
    conv_out = (y.astype(jnp.float32) - bias) / scale
    gscale = jnp.sum(gy * conv_out, axis=spatial)
    g_conv = gy * scale  # grad w.r.t. raw conv output
    g_conv = g_conv.astype(x.dtype)
    # dx: stride-1 conv with rotated, io-transposed weights
    w_rot = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    ones = jnp.ones((x.shape[-1],), jnp.float32)
    zeros = jnp.zeros((x.shape[-1],), jnp.float32)
    dx = _fused_conv3x3_fwd_impl(g_conv, w_rot, ones, zeros, False)
    dw = _conv3x3_dw_impl(x, g_conv).astype(w.dtype)
    return dx.astype(x.dtype), dw, gscale.astype(scale.dtype), gbias.astype(bias.dtype)


fused_conv3x3.defvjp(_fused_fwd, _fused_bwd)


def fused_conv3x3_or_fallback(x, w, scale, bias, relu=True):
    """Dispatch: Pallas when shapes qualify (stride1/pad1, tileable H), XLA
    otherwise."""
    n, h, wd, cin = x.shape
    if _conv_tile(h, wd, cin, w.shape[-1], x.dtype.itemsize) is None or w.shape[:2] != (3, 3):
        y = xla_conv.conv2d(x, w, None, stride=1, padding=1)
        y = y * scale + bias
        return jax.nn.relu(y) if relu else y
    return fused_conv3x3(x, w, scale, bias, relu)


# ------------------------------------------------------ fused ConvStack pair


def _stack2_kernel(x_ref, w1_ref, sb1_ref, w2_ref, sb2_ref, out_ref, *, h, w,
                   cin, cmid, cout):
    """Both ConvBatchNorm blocks of a ConvStack (basicUnet.py:17-23) in one VMEM
    residency: the (H+2, W+2) intermediate never touches HBM.

    x_ref is the zero-padded image (1, H+2, W+2, Cin); taps are STATIC slices of
    the loaded value (register ops — no ref-level DMA, so Mosaic alignment rules
    don't bite). The intermediate is re-zero-padded in VMEM for the second conv.
    """
    xp = x_ref[0]

    def conv9(src, w_ref, sb_ref, th, tw, ci, co):
        acc = jnp.zeros((th * tw, co), jnp.float32)
        for t in range(9):
            dy, dx = t // 3, t % 3
            v = jax.lax.slice(src, (dy, dx, 0), (dy + th, dx + tw, ci))
            acc += jnp.dot(v.reshape(th * tw, ci), w_ref[dy, dx],
                           preferred_element_type=jnp.float32)
        y = acc * sb_ref[0][None, :] + sb_ref[1][None, :]
        return jnp.maximum(y, 0.0).reshape(th, tw, co)

    y1 = conv9(xp, w1_ref, sb1_ref, h, w, cin, cmid)
    y1p = jnp.pad(y1.astype(x_ref.dtype), ((1, 1), (1, 1), (0, 0)))
    out_ref[0] = conv9(y1p, w2_ref, sb2_ref, h, w, cmid, cout).astype(out_ref.dtype)


def _stack2_fits(h: int, w: int, cin: int, cmid: int, cout: int,
                 itemsize: int) -> bool:
    """Whole-image VMEM budget: padded input (double-buffered), intermediate,
    f32 accumulator, output, weights."""
    pad = lambda c: -(-c // 128) * 128
    hp, wp = h + 2, w + 2
    need = (
        2 * hp * wp * pad(cin) * itemsize          # input block, double-buffered
        + hp * wp * pad(cmid) * itemsize           # intermediate (padded)
        + h * w * pad(max(cmid, cout)) * 4         # f32 accumulator
        + 2 * h * w * pad(cout) * itemsize         # output, double-buffered
        + 9 * (pad(cin) * pad(cmid) + pad(cmid) * pad(cout)) * itemsize
    )
    # 12MB of the ~16MB VMEM: raising to 13.6MB compiles but fails at RUN time
    # (JaxRuntimeError on the 56^2x512 stack) — 12MB is the proven-safe budget
    # (benchmarks/pallas_stack_bench.py)
    return need < 12_000_000


def fused_convstack2(x, w1, scale1, bias1, w2, scale2, bias2):
    """y = CBN2(CBN1(x)) — a whole ConvStack(n=2) with folded-BN epilogues in ONE
    Pallas kernel, one HBM round trip (the UNet hot block, basicUnet.py:25-52).
    Shapes must pass `stack2_fits`; dispatch via fused_convstack2_or_fallback."""
    n, h, wd, cin = x.shape
    cmid, cout = w1.shape[-1], w2.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    sb1 = jnp.stack([scale1.astype(jnp.float32), bias1.astype(jnp.float32)])
    sb2 = jnp.stack([scale2.astype(jnp.float32), bias2.astype(jnp.float32)])
    kernel = functools.partial(_stack2_kernel, h=h, w=wd, cin=cin, cmid=cmid,
                               cout=cout)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + 2, wd + 2, cin), lambda ni: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, cmid), lambda ni: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cmid), lambda ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cmid, cout), lambda ni: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cout), lambda ni: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wd, cout), lambda ni: (ni, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype),
        interpret=_INTERPRET,
    )(xp, w1.astype(x.dtype), sb1, w2.astype(x.dtype), sb2)


def fused_convstack2_or_fallback(x, w1, scale1, bias1, w2, scale2, bias2):
    """Pallas pair fusion when the whole image fits VMEM, XLA otherwise."""
    n, h, wd, cin = x.shape
    cmid, cout = w1.shape[-1], w2.shape[-1]
    if (w1.shape[:2] == (3, 3) and w2.shape[:2] == (3, 3)
            and _stack2_fits(h, wd, cin, cmid, cout, x.dtype.itemsize)):
        return fused_convstack2(x, w1, scale1, bias1, w2, scale2, bias2)
    y = xla_conv.conv2d(x, w1, None, stride=1, padding=1)
    y = jax.nn.relu(y * scale1 + bias1).astype(x.dtype)
    y = xla_conv.conv2d(y, w2, None, stride=1, padding=1)
    return jax.nn.relu(y * scale2 + bias2).astype(x.dtype)


# ------------------------------------------------------- transposed conv 2x2/s2


def _deconv_kernel(x_ref, w_ref, b_ref, out_ref, *, th, w, cin, cout):
    xv = x_ref[0].reshape(th * w, cin)
    y = jnp.dot(xv, w_ref[...], preferred_element_type=jnp.float32)
    y = y + b_ref[0][None, :].repeat(4, 0).reshape(1, 4 * cout)
    y = y.reshape(th, w, 2, 2, cout)
    y = y.transpose(0, 2, 1, 3, 4).reshape(th * 2, w * 2, cout)
    out_ref[0] = y.astype(out_ref.dtype)


@jax.custom_vjp
def conv_transpose2x2_pallas(x, w, b):
    """ConvTranspose k2/s2 as one matmul + depth-to-space, in Pallas.
    x (N,H,W,Cin), w (2,2,Cin,Cout) -> (N,2H,2W,Cout)."""
    return _deconv_fwd_impl(x, w, b)


def _deconv_fwd_impl(x, w, b):
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    th = _row_tile(h) or h
    wmat = w.transpose(2, 0, 1, 3).reshape(cin, 4 * cout)  # (Cin, kh*kw*Cout)
    kernel = functools.partial(_deconv_kernel, th=th, w=wd, cin=cin, cout=cout)
    return pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec((1, th, wd, cin), lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, 4 * cout), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda ni, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * th, 2 * wd, cout),
                               lambda ni, i: (ni, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * wd, cout), x.dtype),
        interpret=_INTERPRET,
    )(x, wmat.astype(x.dtype), b.reshape(1, cout).astype(x.dtype))


def _deconv_fwd(x, w, b):
    return _deconv_fwd_impl(x, w, b), (x, w)


def _deconv_tile(h: int, w: int, cin: int, cout: int, itemsize: int) -> Optional[int]:
    """Row tile for the deconv backward kernels: double-buffered gy (2th x 2w)
    and x blocks, the (4Cout, Cin) weight, and the f32 (Cin, 4Cout) accumulator
    must fit the VMEM budget (lane dims padded to 128)."""
    cin_p = -(-cin // 128) * 128
    cout_p = -(-cout // 128) * 128

    def bytes_for(th):
        g = 2 * (2 * th) * (2 * w) * cout_p * itemsize
        xb = 2 * th * w * cin_p * itemsize
        wts = 4 * cout * cin_p * itemsize
        out = 2 * th * w * max(cin_p, 4 * cout_p) * 4
        acc = cin * 4 * cout_p * 4
        return g + xb + wts + out + acc

    return _row_tile(h, budget_bytes=bytes_for)


def _inv_d2s(g, th, w, cout):
    """(2th, 2w, Cout) -> (th*w, 4*Cout): inverse of the forward's
    depth-to-space, cell layout (kh, kw, Cout) matching wmat's column order."""
    return g.reshape(th, 2, w, 2, cout).transpose(0, 2, 1, 3, 4).reshape(
        th * w, 4 * cout)


def _deconv_dx_kernel(g_ref, wt_ref, out_ref, *, th, w, cin, cout):
    g = _inv_d2s(g_ref[0], th, w, cout)
    dx = jnp.dot(g, wt_ref[...], preferred_element_type=jnp.float32)
    out_ref[0] = dx.reshape(th, w, cin).astype(out_ref.dtype)


def _deconv_dwdb_kernel(x_ref, g_ref, dw_ref, db_ref, *, th, w, cin, cout):
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    xv = x_ref[0].reshape(th * w, cin).astype(jnp.float32)
    g = _inv_d2s(g_ref[0], th, w, cout).astype(jnp.float32)
    dw_ref[...] += jnp.dot(xv.T, g, preferred_element_type=jnp.float32)
    db_ref[...] += jnp.sum(g, axis=0, keepdims=True)


def _deconv_bwd(res, gy):
    """Backward transposed-conv as Pallas kernels (BASELINE.json config 4):
    dx = inverse-depth-to-space(gy) @ wmat.T (one MXU matmul per row tile);
    dw/db accumulate across the sequential TPU grid (output revisiting)."""
    x, w = res
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    th = _deconv_tile(h, wd, cin, cout, gy.dtype.itemsize) or h
    wmat = w.transpose(2, 0, 1, 3).reshape(cin, 4 * cout)

    gblock = pl.BlockSpec((1, 2 * th, 2 * wd, cout), lambda ni, i: (ni, i, 0, 0),
                          memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        functools.partial(_deconv_dx_kernel, th=th, w=wd, cin=cin, cout=cout),
        grid=(n, h // th),
        in_specs=[
            gblock,
            pl.BlockSpec((4 * cout, cin), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wd, cin), lambda ni, i: (ni, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cin), x.dtype),
        interpret=_INTERPRET,
    )(gy, wmat.T.astype(gy.dtype))

    dwmat, db4 = pl.pallas_call(
        functools.partial(_deconv_dwdb_kernel, th=th, w=wd, cin=cin, cout=cout),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec((1, th, wd, cin), lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM),
            gblock,
        ],
        out_specs=[
            pl.BlockSpec((cin, 4 * cout), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * cout), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cin, 4 * cout), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * cout), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(x, gy)
    dw = dwmat.reshape(cin, 2, 2, cout).transpose(1, 2, 0, 3)
    db = db4.reshape(4, cout).sum(axis=0)
    return dx.astype(x.dtype), dw.astype(w.dtype), db.astype(jnp.float32)


conv_transpose2x2_pallas.defvjp(_deconv_fwd, _deconv_bwd)


# ------------------------------------------------------------------- maxpool


def _pool_kernel(x_ref, out_ref, *, th, w, c):
    x = x_ref[0].reshape(th, 2, w, 2, c)
    out_ref[0] = jnp.max(jnp.max(x, axis=3), axis=1)


@jax.custom_vjp
def max_pool2x2_pallas(x):
    """2x2/s2 maxpool (UNet DownBlock) as a Pallas reshape-max."""
    return _pool_fwd_impl(x)


def _pool_fwd_impl(x):
    n, h, wd, c = x.shape
    oh, ow = h // 2, wd // 2
    th = _row_tile(oh) or oh
    kernel = functools.partial(_pool_kernel, th=th, w=ow, c=c)
    return pl.pallas_call(
        kernel,
        grid=(n, oh // th),
        in_specs=[pl.BlockSpec((1, 2 * th, wd, c), lambda ni, i: (ni, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th, ow, c), lambda ni, i: (ni, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, c), x.dtype),
        interpret=_INTERPRET,
    )(x)


def _pool_fwd(x):
    y = _pool_fwd_impl(x)
    return y, (x, y)


def _pool_bwd(res, gy):
    x, _ = res
    n, h, wd, c = x.shape
    # Route the gradient to the FIRST maximum in each window (row-major window
    # order) — bit-matching torch's MaxPool2d backward and XLA's
    # select-and-scatter tie-break, including on exact ties.
    xw = x.reshape(n, h // 2, 2, wd // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(n, h // 2, wd // 2, 4, c)
    idx = jnp.argmax(xw, axis=3)  # argmax returns the first tied index
    sel = jax.nn.one_hot(idx, 4, axis=3, dtype=gy.dtype)
    gw = gy[:, :, :, None, :] * sel  # (n, h/2, w/2, 4, c)
    gx = gw.reshape(n, h // 2, wd // 2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return (gx.reshape(n, h, wd, c).astype(x.dtype),)


max_pool2x2_pallas.defvjp(_pool_fwd, _pool_bwd)
