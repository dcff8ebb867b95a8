"""Fused up2 Pallas kernel — the second serving hot spot.

The flagship UNet's up2 level (deconv 128ch @56^2 -> CoordAtt3 gate @112^2
-> split-sum conv pair emitting the packed 64ch tail, reference
分割/nets/basicUnet.py:115-129,201-231 at the 112^2 level) ran as ~6 XLA HBM
round trips over (N,112,112,128)-sized intermediates after the r2b packed
tail. Same treatment as up1 (ops/pallas/up1.py):

  * gate pass (`fused_cbn_stats_dense`): e1 = ConvBatchNorm(skip) + its
    global (H,W) mean/max in one sweep — the global reduction forces the
    level to split here;
  * main kernel (`fused_up2`), per (batch, row-tile) grid step, entirely
    VMEM-resident:
        deconv(y3) -> d2 = ConvBatchNorm(up) -> gated = e1 + (1+gate)*d2
        -> hh = relu(conv(up,Wa) + conv(gated,Wb) + b)   (split-sum concat)
        -> repack hh to the 64ch pixel-packed layout
        -> y_p = ConvBatchNorm_packed(hh_p)              (nConvs.block1)
    HBM traffic collapses to read(y3) + read(e1) + write(y_p).

Unlike up1 (64 channels, pixel-packed S/U decomposition), the 128-channel
operands here already fill the 128 MXU lanes, so packing would only add its
1.33x FLOP overhead. Dense convs instead use the cat9 form: one
(M, 9C) @ (9C, Cout) matmul per conv over [S | L | R] x 3 ky row-windows,
where L/R are the +-1 column rolls with edge zeroing — EXACT logical conv
FLOPs at full lane occupancy. The one packed-form conv (block1, 64ch) reuses
up1's S/U machinery on the repacked tile.

Oracle: tests/test_pallas.py::TestFusedUp2 vs the XLA chain
(pipeline/engine's up2 section), interpret mode on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unet_goolenet_tpu.ops.pallas.up1 import (
    _halo_start, _halo_wait, _row_mask,
)
from unet_goolenet_tpu.ops.pallas import up1 as _up1

# candidate tiles + the min_tile implied by the halo copies (the kernel DMAs
# the x input with (tile=th//2, halo=2) -> th >= 4, same shape as up1's;
# see up1.pick_tile for the constraint's derivation)
UP_TILES = (28, 14, 8, 4, 2)
UP_MIN_TILE = 4
GATE_TILES_DENSE = (56, 28, 16, 14, 8, 4, 2, 1)


def up_level_supported(h: int) -> bool:
    """True when the fused decoder-level kernel (fused_up2/fused_up_dense)
    has a valid row tile for an h-row OUTPUT level."""
    return (h % 2 == 0
            and _up1.pick_tile(h, UP_TILES, min_tile=UP_MIN_TILE,
                               even=True) is not None
            and _up1.pick_tile(h, GATE_TILES_DENSE) is not None)


# ------------------------------------------------------------ weight prep


def make_dense_deconv_weights(w: jax.Array):
    """(2, 2, Cin, Cout) transposed-conv kernel -> (Wd0, Wd1), each
    (Cin, 2*Cout): dense input col j emits output cols (2j, 2j+1) as
    x[j] @ [w[di,0] | w[di,1]] for output row parity di; reshaping the
    (.., 2*Cout) product to (.., 2, Cout) interleaves the output columns."""
    return (jnp.concatenate([w[0, 0], w[0, 1]], axis=-1),
            jnp.concatenate([w[1, 0], w[1, 1]], axis=-1))


def make_cat9_weights(w: jax.Array, dtype):
    """(3, 3, Cin, Cout) logical conv kernel -> (9*Cin, Cout) cat-operand
    weights for dense convs, rows grouped to match _cat9's piece order
    ([S ky=0..2 | L ky=0..2 | R ky=0..2]; S=center kx, L holds col j-1 so it
    takes kx=0 taps, R holds col j+1 -> kx=2)."""
    pieces = [w[ky, 1] for ky in range(3)]
    pieces += [w[ky, 0] for ky in range(3)]
    pieces += [w[ky, 2] for ky in range(3)]
    return jnp.concatenate(pieces, axis=0).astype(dtype)


def _lr(sf, wp, out_dtype):
    """The +-1 column rolls of a dense (R, wp, C) f32 tile with conv-padding
    edge zeroing (L[j] = S[j-1], col 0 zero; R[j] = S[j+1], col wp-1 zero).
    f32 in (Mosaic rotate is 32-bit only), out_dtype out.

    Width-padded tiles (wp > the real image width) need no extra edge logic
    here: every stage keeps pad columns EXACTLY zero (the _rc_mask multiplies
    below), so R at the last real column reads a zero pad column — the same
    value conv zero-padding gives."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
    l = jnp.where(col > 0, pltpu.roll(sf, 1, 1), 0.0)
    r = jnp.where(col < wp - 1, pltpu.roll(sf, wp - 1, 1), 0.0)
    return l.astype(out_dtype), r.astype(out_dtype)


def _rc_mask(n_rows, start, h, wp, w):
    """(n_rows*wp, 1) f32 mask: row-validity ([0, h) after `start` offset,
    up1._row_mask semantics) AND column-validity (col < w) for width-padded
    tiles. Falls back to the row-only mask when the width is unpadded
    (compile-time branch: zero cost for aligned geometries)."""
    if w == wp:
        return _row_mask(n_rows, start, h, wp)
    gi = jax.lax.broadcasted_iota(jnp.int32, (n_rows * wp, 1), 0)
    gr = gi // wp + start
    gc = jax.lax.rem(gi, wp)
    return jnp.where((gr >= 0) & (gr < h) & (gc < w), 1.0, 0.0)


def _cat9(s, l, r, n_out, src_off, wp, c):
    """The dense cat-operand [S(ky=0..2) | L(0..2) | R(0..2)],
    (n_out*wp, 9c). Out row k's center tap is source row src_off + k + 1."""
    ps = [t[src_off + ky:src_off + ky + n_out].reshape(n_out * wp, c)
          for t in (s, l, r) for ky in range(3)]
    return jnp.concatenate(ps, axis=1)


# ------------------------------------------------------------ gate pass


def fused_cbn_stats_dense(x: jax.Array, w: jax.Array, b: jax.Array,
                          *, tile_rows: Optional[int] = None):
    """Dense ConvBatchNorm (folded w, b; relu) + global per-channel mean/max
    in ONE pass — up2's gate pass (CoordAtt3 conv1_e + squeeze stats,
    分割/nets/tasks.py CoordAtt3) without re-reading the activation from HBM.

    x: (N, H, W, C); w: (3, 3, C, C) folded kernel; b: (C,).
    Returns (e1 (N, H, W, C), mean (N,1,1,C), max (N,1,1,C)).
    """
    n, h, w_real, c = x.shape
    dtype = x.dtype
    th = tile_rows
    if th is None:
        th = _up1.pick_tile(h, GATE_TILES_DENSE)
    if th is None or h % th != 0:
        raise ValueError(
            f"fused_cbn_stats_dense: no valid row tile for h={h} "
            f"(tile_rows={tile_rows}); use the XLA path")

    # sublane alignment: unaligned widths (up4's 28-wide skip) zero-pad to a
    # multiple of 8; pad columns are re-zeroed after the relu (post mask) so
    # the global sum/max stay exact, and e1 is sliced back.
    wp = -(-w_real // 8) * 8
    if wp != w_real:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, wp - w_real), (0, 0)))

    wcat = make_cat9_weights(w, dtype)
    bias = b.astype(jnp.float32)[None]            # (1, C)

    # shares up1's gate-pass kernel + pallas_call plumbing; only the conv
    # operand build (dense cat9 vs packed cat6) differs
    def make_cat(s):
        l, r = _lr(s.astype(jnp.float32), wp, s.dtype)
        return _cat9(s, l, r, th, 0, wp, c)

    post = None
    if wp != w_real:
        def post(y):
            return y * _rc_mask(th, 0, th, wp, w_real)

    e1, stats = _up1._launch_cbn_stats(x, wcat, bias, th, make_cat, post=post)
    if wp != w_real:
        e1 = e1[:, :, :w_real, :]

    mean = stats[:, 0] / (h * w_real)
    return e1, mean[:, None, None, :], stats[:, 1][:, None, None, :]


# ------------------------------------------------------------ main kernel


def _up2_kernel(x_ref, e1_ref, gate_ref, wd_ref, wup2_ref, wpg_ref,
                wblk1_ref, bias_ref, bpair_ref, b1_ref, out_ref, xbuf, e1buf,
                sems,
                *, th, h, wp, w, c, cq, dtype):
    """One (image, row-tile) step: deconv -> d2 -> gate -> pair -> block1,
    all VMEM-resident, dense output. wp = (possibly sublane-padded) tile
    width, w = the REAL image width (wp == w when the geometry is aligned;
    up3/up4 widths 28/14 are not multiples of the 8-sublane tiling and
    arrive zero-padded from the wrapper — Mosaic rejects any slice of an
    unaligned-width memref with 'Slice shape along dimension 2 must be
    aligned to tiling (8)', measured on-chip 2026-08-20), c = dense
    channels, cq = block1 output channels (64 for up2 — packed by the
    wrapper's XLA epilogue; >= 128 for up3/up4, already lane-filling)."""
    ni = pl.program_id(0)
    i = pl.program_id(1)
    n_im = pl.num_programs(0)
    n_t = pl.num_programs(1)
    a = i * th
    rx = th // 2 + 4

    t = ni * n_t + i
    slot = jax.lax.rem(t, 2)

    def start_in(ni_, i_, s_):
        _halo_start(x_ref, xbuf.at[s_], sems.at[s_, 0], ni_, i_, n_t,
                    th // 2, 2)
        _halo_start(e1_ref, e1buf.at[s_], sems.at[s_, 1], ni_, i_, n_t,
                    th, 2)

    @pl.when(t == 0)
    def _():
        start_in(ni, i, slot)

    nt = t + 1

    @pl.when(nt < n_im * n_t)
    def _():
        start_in(nt // n_t, jax.lax.rem(nt, n_t), 1 - slot)

    _halo_wait(x_ref, xbuf.at[slot], sems.at[slot, 0], ni, i, n_t,
               th // 2, 2)

    # ---- deconv: x rows [a/2-2, a/2+th/2+2) -> up rows [a-4, a+th+4) ----
    x = xbuf[slot]                                   # (rx, wp//2, c)
    xm = x.reshape(rx * (wp // 2), c)
    o0 = jnp.dot(xm, wd_ref[0], preferred_element_type=jnp.float32)
    o1 = jnp.dot(xm, wd_ref[1], preferred_element_type=jnp.float32)
    o0 = o0.reshape(rx, wp, c)                       # (.., 2, C) interleave
    o1 = o1.reshape(rx, wp, c)
    upf = jnp.stack([o0, o1], axis=1).reshape(2 * rx, wp, c)
    # row AND pad-column validity: pad columns must stay EXACTLY zero at
    # every stage so the column rolls see conv-style zero padding (_lr note)
    m_full = _rc_mask(2 * rx, a - 4, h, wp, w)
    upm = m_full.reshape(2 * rx, wp, 1)
    upf = upf + bias_ref[1][None, None, :] * upm
    up = upf.astype(dtype)
    upl, upr = _lr(upf, wp, dtype)                   # shared by d2 + pair

    # ---- merged d2 + pair-up conv: out rows [a-2, a+th+2), one
    # (M, 9C) @ (9C, C+cq) dot (the pair conv's up-operand contribution is
    # row-sliced below, same trick as up1's wup2) ----
    n_d2 = th + 4
    cat = _cat9(up, upl, upr, n_d2, 1, wp, c)
    acc2 = jnp.dot(cat, wup2_ref[:], preferred_element_type=jnp.float32)
    accd = jnp.maximum(acc2[:, :c] + bias_ref[0][None, :], 0.0)
    accd = accd * m_full[2 * wp:(2 + n_d2) * wp]
    d2 = accd.astype(dtype).reshape(n_d2, wp, c)
    pair_up = acc2[:, c:]                            # (n_d2*wp, cq) f32

    # ---- gated = e1 + (1 + gate) * d2, rows [a-2, a+th+2) ----
    _halo_wait(e1_ref, e1buf.at[slot], sems.at[slot, 1], ni, i, n_t, th, 2)
    gated = e1buf[slot] + (gate_ref[0, 0][None, None, :] * d2).astype(dtype)
    gl, gr = _lr(gated.astype(jnp.float32), wp, dtype)

    # ---- hh = relu(conv(up,Wa) + conv(gated,Wb) + b), rows [a-1, a+th+1) --
    n_h = th + 2
    acc = pair_up[wp:(1 + n_h) * wp]
    cat = _cat9(gated, gl, gr, n_h, 0, wp, c)
    acc = acc + jnp.dot(cat, wpg_ref[:], preferred_element_type=jnp.float32)
    acc = jnp.maximum(acc + bpair_ref[0][None, :], 0.0)
    acc = acc * m_full[3 * wp:(3 + n_h) * wp]

    # dense block1 for BOTH output modes (cq >= 128 fills the lanes for
    # up3/up4; up2's cq=64 half-fills them, but the in-kernel dense->packed
    # repack `(n_h*wp, cq) -> (n_h, wp/2, 2cq)` is a lane-merging shape cast
    # Mosaic cannot lower — measured compile failure on the v5e 2026-08-19;
    # interpret mode accepted it. The packed layout for up2 is produced by an
    # XLA pack epilogue in the wrapper instead (exact channels-minor reshape).
    hhf = acc.reshape(n_h, wp, cq)
    hh = hhf.astype(dtype)
    hl, hr = _lr(hhf, wp, dtype)
    cat = _cat9(hh, hl, hr, th, 0, wp, cq)
    acc = jnp.dot(cat, wblk1_ref[:], preferred_element_type=jnp.float32)
    # b1 rides its own exact-width (1, cq) input: a partial 1D slice of the
    # shared (rows, c) bias stack (`bias_ref[2][None, :cq]`) lowers to a 1D
    # gather, which Mosaic rejects ("Only 2D gather is supported" — measured
    # on-chip 2026-08-19); full-width slices of exact-width refs lower clean
    y = jnp.maximum(acc + b1_ref[0][None, :], 0.0)
    out_ref[0] = y.reshape(th, wp, cq).astype(out_ref.dtype)


def fused_up2(x: jax.Array, e1: jax.Array, gate_p1: jax.Array,
              w_up: jax.Array, b_up: jax.Array,
              w_d2: jax.Array, b_d2: jax.Array,
              w_pair: jax.Array, b_pair: jax.Array,
              w_blk1: jax.Array, b_blk1: jax.Array,
              *, tile_rows: Optional[int] = None) -> jax.Array:
    """The up2 level as one fused kernel (after the gate pass).

    x: (N, H/2, W/2, C) dense bottom input (the up3 output);
    e1: (N, H, W, C) dense ConvBatchNorm(skip) from the gate pass;
    gate_p1: (N, C) per-image (1 + sigmoid gate);
    w_up/b_up: (2,2,C,C)/(C,) transposed conv; w_d2/b_d2: folded (3,3,C,C)
    CoordAtt3 conv2_e; w_pair/b_pair: folded (3,3,2C,cq) nConvs.block0
    (input = concat[up, gated]); w_blk1/b_blk1: folded (3,3,cq,cq)
    nConvs.block1. Returns the PACKED (N, H, W/2, 2*cq) level output.
    """
    return _fused_up_level(x, e1, gate_p1, w_up, b_up, w_d2, b_d2, w_pair,
                           b_pair, w_blk1, b_blk1, tile_rows=tile_rows,
                           packed_out=True)


def fused_up_dense(x: jax.Array, e1: jax.Array, gate_p1: jax.Array,
                   w_up: jax.Array, b_up: jax.Array,
                   w_d2: jax.Array, b_d2: jax.Array,
                   w_pair: jax.Array, b_pair: jax.Array,
                   w_blk1: jax.Array, b_blk1: jax.Array,
                   *, tile_rows: Optional[int] = None) -> jax.Array:
    """A decoder level (up3/up4) as one fused kernel: same structure as
    fused_up2 but with a DENSE (N, H, W, cq) output — at cq >= 128 the lanes
    are already full, so block1 stays in the cat9 dense form instead of
    repacking."""
    return _fused_up_level(x, e1, gate_p1, w_up, b_up, w_d2, b_d2, w_pair,
                           b_pair, w_blk1, b_blk1, tile_rows=tile_rows,
                           packed_out=False)


def _fused_up_level(x, e1, gate_p1, w_up, b_up, w_d2, b_d2, w_pair, b_pair,
                    w_blk1, b_blk1, *, tile_rows, packed_out):
    n, h2, wq2, c = x.shape
    h, w = 2 * h2, 2 * wq2
    cq = w_pair.shape[-1]
    dtype = x.dtype

    # sublane alignment (Mosaic: slices of an 8-unaligned second-minor dim
    # reject — the round-3/4 up3/up4 `dma_start` blocker, root-caused
    # 2026-08-20): zero-pad the width to a multiple of 16 (so the halved x
    # width is a multiple of 8 too); the kernel's _rc_mask keeps pad columns
    # exactly zero and the output is sliced back below.
    wq2p = -(-wq2 // 8) * 8
    if wq2p != wq2:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, wq2p - wq2), (0, 0)))
        e1 = jnp.pad(e1, ((0, 0), (0, 0), (0, 2 * (wq2p - wq2)), (0, 0)))
    wp = 2 * wq2p

    if tile_rows is None:
        tile_rows = _up1.pick_tile(h, UP_TILES, min_tile=UP_MIN_TILE,
                                   even=True)
    th = tile_rows
    if (th is None or h % th != 0 or th % 2 != 0
            or (th < UP_MIN_TILE and th != h)):
        raise ValueError(
            f"fused up level: no valid row tile for h={h} "
            f"(tile_rows={tile_rows}; need even, dividing h, and >= "
            f"{UP_MIN_TILE} for the x-halo DMA unless tile == h); "
            f"use the XLA path")

    wd0, wd1 = make_dense_deconv_weights(w_up.astype(dtype))
    wd = jnp.stack([wd0, wd1])
    wup2 = jnp.concatenate([make_cat9_weights(w_d2, dtype),
                            make_cat9_weights(w_pair[:, :, :c], dtype)],
                           axis=1)                   # (9C, C+cq)
    wpg = make_cat9_weights(w_pair[:, :, c:], dtype)  # (9C, cq)
    wblk1 = make_cat9_weights(w_blk1, dtype)          # (9cq, cq)
    b1 = b_blk1.astype(jnp.float32)
    out_spec = pl.BlockSpec((1, th, wp, cq), lambda ni, i: (ni, i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, h, wp, cq), dtype)
    biases = jnp.stack([
        b_d2.astype(jnp.float32),
        b_up.astype(jnp.float32),
    ])                                                # (2, C)
    bpair = b_pair.astype(jnp.float32)[None]          # (1, cq)
    b1 = b1[None]                                     # (1, cq)

    gate = gate_p1.astype(dtype)[:, None, :]          # (N, 1, C)

    kernel = functools.partial(
        _up2_kernel, th=th, h=h, wp=wp, w=w, c=c, cq=cq, dtype=dtype)
    y = pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, c), lambda ni, i: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c, 2 * c), lambda ni, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, c + cq), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, cq), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wblk1.shape, lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cq), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cq), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, th // 2 + 4, wp // 2, c), dtype),
            pltpu.VMEM((2, th + 4, wp, c), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_up1._INTERPRET,
    )(x, e1, gate, wd, wup2, wpg, wblk1, biases, bpair, b1)
    if wp != w:
        y = y[:, :, :w, :]
    if packed_out:
        # XLA pack epilogue (exact channels-minor reshape, ops/packed.pack):
        # the in-kernel repack is a Mosaic-unsupported lane-merging cast
        from unet_goolenet_tpu.ops import packed as _P
        return _P.pack(y)
    return y
