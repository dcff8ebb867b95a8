"""Cross-platform Mosaic lowering gate for every fused Pallas kernel.

Interpret-mode oracles (tests/test_pallas.py) validate semantics but accept
programs the real Mosaic TPU lowering rejects — two such rejects cost on-chip
queue time on 2026-08-19 (a lane-merging reshape and a 1D partial bias slice,
see ops/pallas/up2.py:221-234). jax's AOT API can run the full
Mosaic lowering on a CPU-only host via ``lowering_platforms=("tpu",)``
(compilation is what needs the device; lowering is in-process), so this test
lowers each production-shape fused kernel for TPU and fails on any reject —
no tunnel required.

Covers the fused serving kernels at their production shapes/tiles
(reference hot blocks: 分割/nets/basicUnet.py:115-129,201-231).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_goolenet_tpu.ops import packed as P
from unet_goolenet_tpu.ops.pallas import up1 as U1
from unet_goolenet_tpu.ops.pallas import up2 as U2
from unet_goolenet_tpu.ops.pallas.down1 import fused_pool_down1

DT = jnp.bfloat16


def _lower(fn, *args):
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def _r(*shape):
    return jnp.zeros(shape, DT)


def _ws(c, cq):
    f = jnp.float32
    return dict(w_up=jnp.zeros((2, 2, c, c), f), b_up=jnp.zeros(c, f),
                w_e1=jnp.zeros((3, 3, c, c), f), b_e1=jnp.zeros(c, f),
                w_d2=jnp.zeros((3, 3, c, c), f), b_d2=jnp.zeros(c, f),
                w_pair=jnp.zeros((3, 3, 2 * c, cq), f),
                b_pair=jnp.zeros(cq, f),
                w_blk1=jnp.zeros((3, 3, cq, cq), f), b_blk1=jnp.zeros(cq, f))


@pytest.mark.parametrize("tile", [56, 28])
def test_fused_up1_outc_lowers(tile):
    c = 64
    ws = _ws(c, c)
    w_outc, b_outc = jnp.zeros((c, 1)), jnp.zeros((1,))

    def chain(x_p, x1_p):
        e1, avg, mx = U1.fused_cbn_stats(x1_p, ws["w_e1"], ws["b_e1"])
        gate_p1 = jnp.tile(1.0 + jax.nn.sigmoid(avg + mx).astype(DT)[:, 0, 0],
                           (1, 2))
        from unet_goolenet_tpu.ops import pallas as pk
        return pk.fused_up1_outc(
            x_p, e1, gate_p1, ws["w_up"], ws["b_up"], ws["w_d2"], ws["b_d2"],
            ws["w_pair"], ws["b_pair"], ws["w_blk1"], ws["b_blk1"],
            w_outc, b_outc, tile_rows=tile)

    _lower(chain, _r(2, 112, 56, 128), _r(2, 224, 112, 128))


def test_fused_up2_lowers():
    ws = _ws(128, 64)

    def chain(x, skip):
        e1, avg, mx = U2.fused_cbn_stats_dense(skip, ws["w_e1"], ws["b_e1"])
        gate = jax.nn.sigmoid(avg + mx).astype(DT)
        return U2.fused_up2(x, e1, 1.0 + gate[:, 0, 0, :],
                            ws["w_up"], ws["b_up"], ws["w_d2"], ws["b_d2"],
                            ws["w_pair"], ws["b_pair"],
                            ws["w_blk1"], ws["b_blk1"], tile_rows=28)

    _lower(chain, _r(2, 56, 56, 128), _r(2, 112, 112, 128))


@pytest.mark.parametrize("c,cq,h,tile", [(256, 128, 56, 28),
                                         (512, 256, 28, 14)])
def test_fused_up_dense_lowers(c, cq, h, tile):
    ws = _ws(c, cq)

    def chain(x, skip):
        e1, avg, mx = U2.fused_cbn_stats_dense(skip, ws["w_e1"], ws["b_e1"])
        gate = jax.nn.sigmoid(avg + mx).astype(DT)
        return U2.fused_up_dense(x, e1, 1.0 + gate[:, 0, 0, :],
                                 ws["w_up"], ws["b_up"], ws["w_d2"],
                                 ws["b_d2"], ws["w_pair"], ws["b_pair"],
                                 ws["w_blk1"], ws["b_blk1"], tile_rows=tile)

    _lower(chain, _r(2, h // 2, h // 2, c), _r(2, h, h, c))


def test_fused_pool_down1_lowers():
    f = jnp.float32
    ws = dict(w1=jnp.zeros((3, 3, 64, 128), f), b1=jnp.zeros(128, f),
              w2=jnp.zeros((3, 3, 128, 128), f), b2=jnp.zeros(128, f))

    def chain(x1_p):
        return fused_pool_down1(x1_p, ws["w1"], ws["b1"], ws["w2"], ws["b2"],
                                tile_rows=28)

    _lower(chain, _r(2, 224, 112, 128))


def test_gate_pass_lowers():
    c = 64
    f = jnp.float32
    w, b = jnp.zeros((3, 3, c, c), f), jnp.zeros(c, f)

    def packed(x1_p):
        return U1.fused_cbn_stats(x1_p, w, b)

    _lower(packed, _r(2, 224, 112, 128))

    cd = 128
    wd, bd = jnp.zeros((3, 3, cd, cd), f), jnp.zeros(cd, f)

    def dense(skip):
        return U2.fused_cbn_stats_dense(skip, wd, bd)

    _lower(dense, _r(2, 112, 112, 128))
