"""Fused pool+down1 Pallas kernel — the encoder-side HBM collapse.

XLA runs maxpool(x1) -> ConvBatchNorm -> ConvBatchNorm as three HBM round
trips (reference 分割/nets/basicUnet.py DownBlock at the 112^2 level), with
the pool pure HBM-bound (reads the whole 224^2 64ch activation) and the
64-in conv at half lane occupancy. This kernel runs the level per
(batch, row-tile) grid step, VMEM-resident:

    pool2x2(x1_p) -> h = relu(conv3x3(pool) + b1) -> relu(conv3x3(h) + b2)

x1_p arrives in the 224^2 pixel-packed layout (ops/packed.py) straight from
the inc conv; the vertical pool is a row-pair max, the horizontal pool a
lane-half max (the packed column already holds the pixel pair). The convs
use the dense cat9 form (ops/pallas/up2.py): for a 64->128 conv the K dim
is 9*64=576 operand lanes — no activation-lane padding waste, exact logical
FLOPs. HBM traffic collapses to read(x1_p) + write(h2).

Oracle: tests/test_pallas.py::TestFusedDown1 vs
P.max_pool2x2_p_to_dense + the XLA conv stack.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unet_goolenet_tpu.ops.pallas import up1 as _up1
from unet_goolenet_tpu.ops.pallas.up1 import (
    _halo_start, _halo_wait, _row_mask, pick_tile,
)
from unet_goolenet_tpu.ops.pallas.up2 import _cat9, _lr, make_cat9_weights

# candidate tiles + min_tile implied by the halo copy: the kernel DMAs the
# packed input with (tile=2*th, halo=4) -> th >= 2 (up1.pick_tile docs)
DOWN1_TILES = (28, 14, 8, 4, 2)
DOWN1_MIN_TILE = 2


def down1_supported(h_pooled: int) -> bool:
    """True when fused_pool_down1 has a valid row tile for an h_pooled-row
    (post-pool) output."""
    return pick_tile(h_pooled, DOWN1_TILES,
                     min_tile=DOWN1_MIN_TILE) is not None


def _pool_down1_kernel(x_ref, w1_ref, w2_ref, bias_ref, out_ref, xbuf, sems,
                       *, th, h, wp, c, co, dtype):
    """out rows [a, a+th) @ (h, wp) dense co; x1_p rows [2a-4, 2a+2th+4) of
    the packed (2h, wp, 2c) input. c = pooled channels (64), co = output
    channels (128)."""
    ni = pl.program_id(0)
    i = pl.program_id(1)
    n_im = pl.num_programs(0)
    n_t = pl.num_programs(1)
    a = i * th

    t = ni * n_t + i
    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        _halo_start(x_ref, xbuf.at[slot], sems.at[slot], ni, i, n_t,
                    2 * th, 4)

    nt = t + 1

    @pl.when(nt < n_im * n_t)
    def _():
        _halo_start(x_ref, xbuf.at[1 - slot], sems.at[1 - slot],
                    nt // n_t, jax.lax.rem(nt, n_t), n_t, 2 * th, 4)

    _halo_wait(x_ref, xbuf.at[slot], sems.at[slot], ni, i, n_t, 2 * th, 4)

    # ---- pool: x rows [2a-4, 2a+2th+4) -> pool rows [a-2, a+th+2) ----
    # vertical = row-pair max, horizontal = lane-half max (packed columns
    # hold the pixel pair). inc output is post-relu (>= 0), so the zero-
    # filled out-of-image halo rows pool to exactly 0 = conv zero padding.
    n_p = th + 4
    x = xbuf[slot].reshape(th + 4, 2, wp, 2 * c)     # outer-dim split: free
    v = jnp.maximum(x[:, 0], x[:, 1])                # (n_p, wp, 2c)
    poolf = jnp.maximum(v[..., :c], v[..., c:]).astype(jnp.float32)

    # ---- conv1 64->co: out rows [a-1, a+th+1) ----
    pool = poolf.astype(dtype)
    pl_, pr = _lr(poolf, wp, dtype)
    n_h = th + 2
    cat = _cat9(pool, pl_, pr, n_h, 0, wp, c)
    acc = jnp.dot(cat, w1_ref[:], preferred_element_type=jnp.float32)
    m_full = _row_mask(n_p, a - 2, h, wp)
    acc = jnp.maximum(acc + bias_ref[0][None, :], 0.0)
    acc = acc * m_full[wp:(1 + n_h) * wp]
    hhf = acc.reshape(n_h, wp, co)
    hh = hhf.astype(dtype)

    # ---- conv2 co->co: out rows [a, a+th) ----
    hl, hr = _lr(hhf, wp, dtype)
    cat = _cat9(hh, hl, hr, th, 0, wp, co)
    acc = jnp.dot(cat, w2_ref[:], preferred_element_type=jnp.float32)
    y = jnp.maximum(acc + bias_ref[1][None, :], 0.0)
    out_ref[0] = y.reshape(th, wp, co).astype(out_ref.dtype)


def fused_pool_down1(x1_p: jax.Array, w1: jax.Array, b1: jax.Array,
                     w2: jax.Array, b2: jax.Array,
                     *, tile_rows: Optional[int] = None) -> jax.Array:
    """maxpool2x2 + the down1 ConvStack in one kernel.

    x1_p: (N, 2H, Wp, 2C) packed post-relu inc output (2H=224, Wp=112,
    2C=128); w1/b1: folded (3,3,C,co)/(co,) block0; w2/b2: (3,3,co,co)/(co,)
    block1. Returns dense (N, H, Wp, co)."""
    n, h2, wp, c2 = x1_p.shape
    h = h2 // 2
    c = c2 // 2
    co = w1.shape[-1]
    dtype = x1_p.dtype

    if tile_rows is None:
        tile_rows = pick_tile(h, DOWN1_TILES, min_tile=DOWN1_MIN_TILE)
    th = tile_rows
    if (th is None or h % th != 0
            or (th < DOWN1_MIN_TILE and th != h)):
        raise ValueError(
            f"fused_pool_down1: no valid row tile for pooled h={h} "
            f"(tile_rows={tile_rows}; need dividing h and >= "
            f"{DOWN1_MIN_TILE} for the x-halo DMA (tile=2*th, halo=4) "
            f"unless tile == h); use the XLA path")

    w1c = make_cat9_weights(w1, dtype)               # (9c, co)
    w2c = make_cat9_weights(w2, dtype)               # (9co, co)
    biases = jnp.stack([b1.astype(jnp.float32), b2.astype(jnp.float32)])

    kernel = functools.partial(_pool_down1_kernel, th=th, h=h, wp=wp, c=c,
                               co=co, dtype=dtype)
    return pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9 * c, co), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * co, co), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, co), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wp, co), lambda ni, i: (ni, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wp, co), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * th + 8, wp, c2), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_up1._INTERPRET,
    )(x1_p, w1c, w2c, biases)
