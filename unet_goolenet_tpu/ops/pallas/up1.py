"""Fused packed up1 + outc Pallas kernel — the serving hot spot.

The flagship UNet's last decoder level (up1: ConvTranspose 64->64 @112^2 ->
CoordAtt3 gate -> concat+double ConvBatchNorm @224^2, reference
分割/nets/basicUnet.py:115-129,201-231) is ~40% of the fused e2e graph at
~28% of the matmul roofline in the XLA packed form (benchmarks/RESULTS.md
r2b): eight HBM round trips over (N,224,112,128)-sized tensors dominate.

This kernel runs the whole level in two passes:

  * gate pass (plain XLA, pipeline/engine.py): e1 = ConvBatchNorm(skip) and
    its global (H,W) mean/max -> the 1x1 squeeze-excite gate. The global
    reduction forces the split: no output tile can be produced before the
    gate is known.
  * THIS kernel, per (batch, row-tile) grid step, entirely VMEM-resident:
        deconv(x) -> d2 = ConvBatchNorm(up) -> gated = e1 + (1+gate)*d2
        -> h = relu(conv(up,Wa) + conv(gated,Wb) + b)   (split-sum concat)
        -> y = ConvBatchNorm(h) -> logits = y @ w_outc + b_outc
    HBM traffic collapses to read(x) + read(e1) + write(logits) — the
    (N,224,112,128) intermediates up/d2/gated/h never leave VMEM.

Packed-conv math: the XLA packed path pays 2x logical FLOPs (expanded
weights with half-zero blocks, ops/packed.py). Here each packed 3x3 conv is
6 dense-ish (M,128)@(128,128) matmuls per row-tile via the (S, U)
decomposition:

    S = the packed tile itself; per ky, S @ Wc covers every tap that stays
        inside the same packed column (even-out dx=0,+1; odd-out dx=-1,0) —
        Wc is fully dense;
    U = [S_odd shifted one column right | S_even shifted one column left]
        built once per source tensor; per ky, U @ Wu covers the two
        cross-column taps (even-out dx=-1, odd-out dx=+1) — Wu is half
        dense.

FLOPs = 6*128*128 per output packed column per ky vs logical 2px*3dx*64*64
-> 1.33x, with every matmul at full 128-lane MXU occupancy.

Halos: output row tile [a, a+TH) needs up rows [a-3, a+TH+3) and e1 rows
[a-2, a+TH+2); inputs arrive UNPADDED and the manual async-copies clamp the
row window per boundary case (_halo_start), zero-filling out-of-image halo
rows in VMEM — an XLA jnp.pad of each operand measured 2.73 ms per
(64,224,112,128) bf16 tensor on the v5e, a full HBM round trip before the
kernel even started. Each stage adds its bias only on rows inside the real
image (so out-of-image halo rows stay exactly zero, matching conv zero
padding). The 2x2/s2 deconv needs no halo of its own (output row pair
2i,2i+1 depends only on input row i).

Oracle: tests/test_pallas.py::TestFusedUp1 vs the XLA packed chain
(pipeline/engine._up_alig_p + ops.packed.conv1x1_p), interpret mode on CPU
and the same tolerance class as test_packed.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU
# Perf-ablation switch for bench harnesses (NEVER set in production: math
# becomes wrong). Tokens: nobuild (U := S, skips the roll/select builds),
# nomask (skip halo row-mask multiplies), nodma (skip input copies; stale
# scratch data).
_ABLATE: frozenset = frozenset()


# ------------------------------------------------------------ tile picking


def pick_tile(h: int, candidates, *, min_tile: int = 1,
              even: bool = False):
    """Largest candidate row-tile that divides `h` AND satisfies the DMA-halo
    constraint: the interior branches of `_halo_branches` read the window
    [i*tile - halo, ...) of the source buffer, so `tile >= halo` (expressed
    here as `tile >= min_tile` in the picker's units) or the copy start goes
    negative — a clamped/out-of-bounds DMA that silently corrupts rows (or
    wedges the TPU worker). A single-tile grid (`tile == h`) takes the
    dedicated whole-array branch and is exempt. Returns None when no
    candidate is valid; launchers raise and callers keep the XLA path
    (pipeline/engine.py gates each fused level on the *_supported helpers)."""
    for t in candidates:
        if h % t != 0 or (even and t % 2):
            continue
        if t >= min_tile or t == h:
            return t
    return None


# candidate tiles per kernel (largest-first; 56 measured best for up1 on the
# v5e, benchmarks/up1_bench.py sweep) and the min_tile implied by each
# kernel's halo copies: fused_up1_outc DMAs the packed x input with
# (tile=th//2, halo=2) -> th >= 4; the gate pass uses (th, halo=1) -> any th.
UP1_TILES = (56, 28, 16, 14, 8, 4, 2)
UP1_MIN_TILE = 4
# 112 first: the queue-17 gate sweep measured t112 0.87 vs t56 0.93 ms at
# b128 (fewer grid steps amortise the per-step cat-build better; the gate
# kernel's halo is 1 so any tile is DMA-safe)
GATE_TILES = (112, 56, 32, 28, 16, 8, 4, 2, 1)


def up1_supported(h: int) -> bool:
    """True when the fused up1+outc kernel has a valid row tile for an
    h-row output level (even h with a tile >= the DMA halo)."""
    return (h % 2 == 0
            and pick_tile(h, UP1_TILES, min_tile=UP1_MIN_TILE,
                          even=True) is not None
            and pick_tile(h, GATE_TILES) is not None)


# ------------------------------------------------------------ weight prep


def make_su_weights(w: jax.Array):
    """Logical (3, 3, C, C) conv kernel -> (Wc, Wu), each (3, 2C, 2C).

    Wc[ky] rows 0:C   (even-in, col 2j)  -> [even-out dx=0: W[ky,1] | odd-out dx=-1: W[ky,0]]
    Wc[ky] rows C:2C  (odd-in, col 2j+1) -> [even-out dx=+1: W[ky,2] | odd-out dx=0: W[ky,1]]
    Wu[ky] rows 0:C   (odd(j-1))         -> [even-out dx=-1: W[ky,0] | 0]
    Wu[ky] rows C:2C  (even(j+1))        -> [0 | odd-out dx=+1: W[ky,2]]
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3) and cin == cout
    c = cin
    wc = jnp.zeros((3, 2 * c, 2 * c), w.dtype)
    wu = jnp.zeros((3, 2 * c, 2 * c), w.dtype)
    for ky in range(3):
        wc = wc.at[ky, :c, :c].set(w[ky, 1])
        wc = wc.at[ky, :c, c:].set(w[ky, 0])
        wc = wc.at[ky, c:, :c].set(w[ky, 2])
        wc = wc.at[ky, c:, c:].set(w[ky, 1])
        wu = wu.at[ky, :c, :c].set(w[ky, 0])
        wu = wu.at[ky, c:, c:].set(w[ky, 2])
    return wc, wu


def make_deconv_weights(w: jax.Array):
    """(2, 2, C, C) transposed-conv kernel -> (Wd0, Wd1), each (2C, 4C).

    For output row parity di, input packed col c holds logical cols 2c (lanes
    0:C) and 2c+1 (lanes C:2C); logical col j emits out packed col P=j with
    lanes [dj=0 | dj=1] = x[j] @ [w[di,0] | w[di,1]]. Reshaping the (.., 4C)
    product to (.., 2, 2C) interleaves even/odd out packed cols contiguously.
    """
    _, _, cin, cout = w.shape
    assert cin == cout
    c = cin
    outs = []
    for di in range(2):
        wcat = jnp.concatenate([w[di, 0], w[di, 1]], axis=-1)  # (C, 2C)
        w2 = jnp.zeros((2 * c, 4 * c), w.dtype)
        w2 = w2.at[:c, :2 * c].set(wcat).at[c:, 2 * c:].set(wcat)
        outs.append(w2)
    return outs[0], outs[1]


# ------------------------------------------------------------ kernel


def _halo_branches(i_, n_t, tile, halo):
    """The four boundary cases for a row window [i_*tile - halo,
    i_*tile + tile + halo) over a [0, n_t*tile) array: (cond, src_start,
    dst_offset, size, zero_top, zero_bottom) per case."""
    first = i_ == 0
    last = i_ == n_t - 1
    a = i_ * tile
    if n_t == 1:
        # single-tile grid: the other branches would trace copies larger
        # than the whole array (statically out of bounds even under pl.when)
        return [(first, 0, halo, tile, True, True)]
    return [
        (first & last, 0, halo, tile, True, True),
        (first & jnp.logical_not(last), 0, halo, tile + halo, True, False),
        (last & jnp.logical_not(first), a - halo, 0, tile + halo, False, True),
        (jnp.logical_not(first) & jnp.logical_not(last), a - halo, 0,
         tile + 2 * halo, False, False),
    ]


def _halo_start(src_ref, dst, sem, ni_, i_, n_t, tile, halo):
    """Start the async copy of src_ref[ni_]'s row window into dst
    (tile + 2*halo rows), zero-filling halo rows outside the image — this
    replaces an XLA jnp.pad of the whole input, which measured 2.73 ms per
    (64,224,112,128)-bf16 operand on the v5e (a full HBM read+write before
    the kernel even starts)."""
    for cond, s0, d0, sz, ztop, zbot in _halo_branches(i_, n_t, tile, halo):
        @pl.when(cond)
        def _(s0=s0, d0=d0, sz=sz, ztop=ztop, zbot=zbot):
            pltpu.make_async_copy(src_ref.at[ni_, pl.ds(s0, sz)],
                                  dst.at[d0:d0 + sz], sem).start()
            if ztop:
                dst[0:halo] = jnp.zeros_like(dst[0:halo])
            if zbot:
                dst[tile + halo:] = jnp.zeros_like(dst[tile + halo:])


def _halo_wait(src_ref, dst, sem, ni_, i_, n_t, tile, halo):
    """Wait for the copy issued by the matching _halo_start (the descriptor
    must match the started copy's byte count, hence the same branching)."""
    for cond, s0, d0, sz, _zt, _zb in _halo_branches(i_, n_t, tile, halo):
        @pl.when(cond)
        def _(s0=s0, d0=d0, sz=sz):
            pltpu.make_async_copy(src_ref.at[ni_, pl.ds(s0, sz)],
                                  dst.at[d0:d0 + sz], sem).wait()


def _sel_masks(wp, c2):
    """The two (1, wp, c2) lane/column selectors for the U operand, built
    ONCE per kernel invocation (v1 rebuilt two full-size iotas per conv call
    — pure VPU waste on the hot path)."""
    c = c2 // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, wp, c2), 2)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, wp, c2), 1)
    sel_a = (lane < c) & (col > 0)
    sel_b = (lane >= c) & (col < wp - 1)
    return sel_a, sel_b


def _build_u(s, sel_a, sel_b, out_dtype):
    """U operand: U[j] = [S_odd(j-1) | S_even(j+1)] via layout-preserving
    rolls + lane selects (Mosaic cannot concatenate vectors whose lane
    offsets differ on a non-concat dim — measured compile error, so no
    pad+slice+concat forms here).

    Pass `s` as the f32 pre-downcast value when the producing stage has one
    (deconv/conv accumulators): Mosaic rotate is 32-bit only ("Rotate with
    non-32-bit data: not implemented", measured on-chip at bf16), so a bf16
    input costs an extra upcast pass here.
    """
    if jnp.dtype(s.dtype).itemsize < 4:
        s = s.astype(jnp.float32)
    c2 = s.shape[-1]
    wp = s.shape[1]
    sr = pltpu.roll(s, c2 // 2, 2)         # halves swapped: [odd | even]
    a = pltpu.roll(sr, 1, 1)               # [odd(j-1) | even(j-1)]
    b = pltpu.roll(sr, wp - 1, 1)          # [odd(j+1) | even(j+1)] (shift>=0)
    u = jnp.where(sel_a, a, jnp.where(sel_b, b, jnp.zeros_like(b)))
    return u.astype(out_dtype)


def _cat6(s, u, n_out, src_off, wp, c2):
    """The lane-concat conv operand [S(ky=0)|S(1)|S(2)|U(0)|U(1)|U(2)],
    (n_out*wp, 6*c2): ONE K=6C matmul then replaces six K=2C dots plus five
    f32 accumulate adds per conv (the six-dot form measured ~2.6 ms of
    dot-issue/add slack over MXU-ideal across the th=56 grid). s/u: the
    (R, wp, c2) source and its prebuilt U operand (R >= src_off + n_out + 2);
    out row k's center tap is row src_off + k + 1. Prebuilding U lets
    sources feeding two convs (up -> d2 AND the pair conv) pay the
    roll/select cost once. All six pieces start at lane offset 0 of their
    tiles, so the lane-concat lowers to plain VMEM copies (no shifts)."""
    ps = [s[src_off + ky:src_off + ky + n_out].reshape(n_out * wp, c2)
          for ky in range(3)]
    ps += [u[src_off + ky:src_off + ky + n_out].reshape(n_out * wp, c2)
           for ky in range(3)]
    return jnp.concatenate(ps, axis=1)


def make_cat_weights(w: jax.Array, dtype):
    """(3, 3, C, C) logical conv kernel -> (6*2C, 2C) cat-operand weights
    (rows grouped to match _cat6's piece order)."""
    wc, wu = make_su_weights(w.astype(dtype))
    return jnp.concatenate([wc[0], wc[1], wc[2], wu[0], wu[1], wu[2]], axis=0)


def _row_mask(n_rows, start, h, wp):
    """(n_rows*wp, 1) f32 mask of rows whose global index is inside [0, h).

    Built directly in the final 2D shape from a 32-bit iota: Mosaic cannot
    reshape i1 vectors with minor-dim insertion (measured compile error)."""
    gr = jax.lax.broadcasted_iota(jnp.int32, (n_rows * wp, 1), 0) // wp + start
    return jnp.where((gr >= 0) & (gr < h), 1.0, 0.0)


def _up1_kernel(x_ref, e1_ref, gate_ref, wd_ref, wup2_ref, wgy_ref,
                bias_ref, w1_ref, b1_ref, out_ref, xbuf, e1buf, sems, *,
                th, h, wp, c2, ncls2, dtype):
    ni = pl.program_id(0)
    i = pl.program_id(1)
    n_im = pl.num_programs(0)
    n_t = pl.num_programs(1)
    a = i * th
    rx = th // 2 + 4

    # Double-buffered input DMAs: issue the NEXT grid step's copies before
    # waiting on this step's, so HBM reads ride under this step's compute
    # (v1 start+wait'ed inside the step — every step ate the full DMA
    # latency cold).
    t = ni * n_t + i
    slot = jax.lax.rem(t, 2)

    def start_in(ni_, i_, s_):
        _halo_start(x_ref, xbuf.at[s_], sems.at[s_, 0], ni_, i_, n_t,
                    th // 2, 2)
        _halo_start(e1_ref, e1buf.at[s_], sems.at[s_, 1], ni_, i_, n_t,
                    th, 2)

    if "nodma" not in _ABLATE:
        @pl.when(t == 0)
        def _():
            start_in(ni, i, slot)

        nt = t + 1

        @pl.when(nt < n_im * n_t)
        def _():
            start_in(nt // n_t, jax.lax.rem(nt, n_t), 1 - slot)

    sel_a, sel_b = _sel_masks(wp, c2)
    if "nodma" not in _ABLATE:
        _halo_wait(x_ref, xbuf.at[slot], sems.at[slot, 0], ni, i, n_t,
                   th // 2, 2)
    build = ((lambda s, out_dt: s.astype(out_dt)) if "nobuild" in _ABLATE
             else (lambda s, out_dt: _build_u(s, sel_a, sel_b, out_dt)))

    # ---- deconv: x rows [a/2-2, a/2+th/2+2) -> up rows [a-4, a+th+4) ----
    x = xbuf[slot]                                  # (rx, wp//2, c2)
    xm = x.reshape(rx * (wp // 2), c2)
    o0 = jnp.dot(xm, wd_ref[0], preferred_element_type=jnp.float32)
    o1 = jnp.dot(xm, wd_ref[1], preferred_element_type=jnp.float32)
    o0 = o0.reshape(rx, wp, c2)                     # (.., 2, 2C) col-interleave
    o1 = o1.reshape(rx, wp, c2)
    upf = jnp.stack([o0, o1], axis=1).reshape(2 * rx, wp, c2)
    # ONE row-validity mask for the whole step: rows [a-4, a+th+4) cover
    # every stage's window; the per-stage masks below are row slices of it
    # (three separate iota+div+cmp builds measured ~1 ms across the grid)
    m_full = _row_mask(2 * rx, a - 4, h, wp)
    upm = m_full.reshape(2 * rx, wp, 1)
    if "nomask" not in _ABLATE:
        upf = upf + bias_ref[3][None, None, :] * upm
    up = upf.astype(dtype)
    u_up = build(upf, dtype)                        # shared by d2 + pair conv

    # ---- merged d2 + pair-up conv: rows [a-2, a+th+2), one K=6C N=4C dot
    # (the pair conv's up-operand contribution is computed on d2's slightly
    # wider row window and row-sliced below — 2 extra rows of FLOPs buys
    # sharing ONE cat operand between both convs) ----
    # Halo rows outside the real image must be ZERO (the next conv's zero
    # padding): the window overlaps real rows there, so mask the whole
    # output, not just the bias.
    n_d2 = th + 4
    cat = _cat6(up, u_up, n_d2, 1, wp, c2)
    acc2 = jnp.dot(cat, wup2_ref[:], preferred_element_type=jnp.float32)
    accd = jnp.maximum(acc2[:, :c2] + bias_ref[0][None, :], 0.0)
    if "nomask" not in _ABLATE:
        accd = accd * m_full[2 * wp:(2 + n_d2) * wp]
    d2 = accd.astype(dtype).reshape(n_d2, wp, c2)
    pair_up = acc2[:, c2:].reshape(n_d2, wp, c2)

    # ---- gated = e1 + (1 + gate) * d2, rows [a-2, a+th+2) ----
    if "nodma" not in _ABLATE:
        _halo_wait(e1_ref, e1buf.at[slot], sems.at[slot, 1], ni, i, n_t,
                   th, 2)
    gated = e1buf[slot] + (gate_ref[0, 0][None, None, :] * d2).astype(dtype)
    u_gated = build(gated, dtype)

    # ---- h = relu(conv(up, Wa) + conv(gated, Wb) + b), rows [a-1, a+th+1) --
    n_h = th + 2
    acc = pair_up[1:1 + n_h].reshape(n_h * wp, c2)
    cat = _cat6(gated, u_gated, n_h, 0, wp, c2)
    acc = acc + jnp.dot(cat, wgy_ref[0], preferred_element_type=jnp.float32)
    acc = jnp.maximum(acc + bias_ref[1][None, :], 0.0)
    if "nomask" not in _ABLATE:
        acc = acc * m_full[3 * wp:(3 + n_h) * wp]
    hhf = acc.reshape(n_h, wp, c2)
    hh = hhf.astype(dtype)
    u_hh = build(hhf, dtype)

    # ---- y = relu(conv(h) + b), rows [a, a+th); then outc 1x1 ----
    cat = _cat6(hh, u_hh, th, 0, wp, c2)
    acc = jnp.dot(cat, wgy_ref[1], preferred_element_type=jnp.float32)
    y = jnp.maximum(acc + bias_ref[2][None, :], 0.0).astype(dtype)
    logits = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32)
    logits = logits + b1_ref[0][None, :]
    out_ref[0] = logits.reshape(th, wp, ncls2).astype(out_ref.dtype)


# ---------------------------------------------------- gate-pass kernel


def _cbn_stats_kernel(x_ref, wcat_ref, bias_ref, e1_ref, stat_ref,
                      xbuf, sems, *, th, wp, cs, dtype, make_cat,
                      post=None):
    """relu(conv3x3(x) + b) + running per-image (sum, max) over (H, W).

    stat_ref is revisited across the sequential row-tile grid (the TPU grid
    is sequential, same pattern as the conv backward dw kernel): row 0
    accumulates the channel sums, row 1 the channel maxes, per lane(-half).
    Input DMA double-buffered across grid steps like _up1_kernel.

    Shared between the packed up1 gate pass and up2's dense gate pass
    (up2.fused_cbn_stats_dense) — only the conv-operand build differs, so the
    caller injects it as make_cat(s) -> the (rows, K) cat operand for the
    single dot against wcat.
    """
    ni = pl.program_id(0)
    i = pl.program_id(1)
    n_im = pl.num_programs(0)
    n_t = pl.num_programs(1)
    t = ni * n_t + i
    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        _halo_start(x_ref, xbuf.at[slot], sems.at[slot], ni, i, n_t, th, 1)

    nt = t + 1

    @pl.when(nt < n_im * n_t)
    def _():
        _halo_start(x_ref, xbuf.at[1 - slot], sems.at[1 - slot],
                    nt // n_t, jax.lax.rem(nt, n_t), n_t, th, 1)

    _halo_wait(x_ref, xbuf.at[slot], sems.at[slot], ni, i, n_t, th, 1)

    cat = make_cat(xbuf[slot])
    acc = jnp.dot(cat, wcat_ref[:], preferred_element_type=jnp.float32)
    y = jnp.maximum(acc + bias_ref[0][None, :], 0.0)
    if post is not None:
        # width-padded dense gate pass: zero the pad columns so they cannot
        # pollute the running sum/max (relu(bias) otherwise leaks in)
        y = post(y)
    e1_ref[0] = y.reshape(th, wp, cs).astype(dtype)

    tile_sum = jnp.sum(y, axis=0, keepdims=True)
    tile_max = jnp.max(y, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        stat_ref[0, 0:1] = tile_sum
        stat_ref[0, 1:2] = tile_max

    @pl.when(i > 0)
    def _():
        stat_ref[0, 0:1] = stat_ref[0, 0:1] + tile_sum
        stat_ref[0, 1:2] = jnp.maximum(stat_ref[0, 1:2], tile_max)


def _launch_cbn_stats(x, wcat, bias, th, make_cat, post=None):
    """pallas_call plumbing shared by the packed (up1) and dense (up2) gate
    passes: (N, H, Wp, Cs) input -> (e1 same shape, (N, 2, Cs) f32 sum/max)."""
    n, h, wp, cs = x.shape
    dtype = x.dtype
    kernel = functools.partial(_cbn_stats_kernel, th=th, wp=wp, cs=cs,
                               dtype=dtype, make_cat=make_cat, post=post)
    return pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(wcat.shape, lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cs), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, th, wp, cs), lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, cs), lambda ni, i: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, wp, cs), dtype),
            jax.ShapeDtypeStruct((n, 2, cs), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wp, cs), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(x, wcat, bias)


def fused_cbn_stats(x_p: jax.Array, w: jax.Array, b: jax.Array,
                    *, tile_rows: Optional[int] = None):
    """Packed ConvBatchNorm (folded w, b; relu) + global per-channel mean/max
    in ONE pass — the up1 gate pass (CoordAtt3's conv1_e + squeeze stats,
    分割/nets/tasks.py CoordAtt3) without re-reading the activation from HBM.

    x_p: (N, H, Wp, 2C); w: (3, 3, C, C) logical folded kernel; b: (C,).
    Returns (e1_p (N, H, Wp, 2C), mean (N,1,1,C), max (N,1,1,C)).
    """
    n, h, wp, c2 = x_p.shape
    c = c2 // 2
    dtype = x_p.dtype
    th = tile_rows
    if th is None:
        # biggest divisor tile first: the ablation bench measured the th=16
        # grid (896 steps at batch 64) at ~27% MXU from per-step overheads
        # alone; 56-row tiles run the same conv at ~4x fewer steps
        th = pick_tile(h, GATE_TILES)
    if th is None or h % th != 0:
        raise ValueError(
            f"fused_cbn_stats: no valid row tile for h={h} "
            f"(tile_rows={tile_rows}); use the XLA path")

    wcat = make_cat_weights(w, dtype)
    bias = jnp.tile(b.astype(jnp.float32), 2)[None]       # (1, 2C)

    def make_cat(s):
        sel_a, sel_b = _sel_masks(wp, c2)
        u = _build_u(s, sel_a, sel_b, s.dtype)
        return _cat6(s, u, th, 0, wp, c2)

    e1, stats = _launch_cbn_stats(x_p, wcat, bias, th, make_cat)

    mean = ((stats[:, 0, :c] + stats[:, 0, c:]) / (h * 2 * wp))
    mx = jnp.maximum(stats[:, 1, :c], stats[:, 1, c:])
    return e1, mean[:, None, None, :], mx[:, None, None, :]


# ------------------------------------------------------------ wrapper


def fused_up1_outc(x_p: jax.Array, e1_p: jax.Array, gate_p1: jax.Array,
                   w_up: jax.Array, b_up: jax.Array,
                   w_d2: jax.Array, b_d2: jax.Array,
                   w_pair: jax.Array, b_pair: jax.Array,
                   w_blk1: jax.Array, b_blk1: jax.Array,
                   w_outc: jax.Array, b_outc: jax.Array,
                   *, tile_rows: Optional[int] = None) -> jax.Array:
    """Packed up1 level + outc as one fused kernel.

    x_p: (N, H/2, Wp/2, 2C) packed input (the up2 tail output);
    e1_p: (N, H, Wp, 2C) packed ConvBatchNorm(skip) from the gate pass;
    gate_p1: (N, 2C) per-image (1 + sigmoid gate), channel-tiled;
    w_up/b_up: (2,2,C,C)/(C,) transposed conv; w_d2/b_d2: folded (3,3,C,C)
    CoordAtt3 conv2_e; w_pair/b_pair: folded (3,3,2C,C) nConvs.block0 (input
    = concat[up, gated]); w_blk1/b_blk1: folded (3,3,C,C) nConvs.block1;
    w_outc/b_outc: (C, ncls)/(ncls,) 1x1.
    Returns packed logits (N, H, Wp, 2*ncls).
    """
    n, h2, wp2, c2 = x_p.shape
    h, wp = 2 * h2, 2 * wp2
    c = c2 // 2
    ncls = w_outc.shape[-1]
    dtype = x_p.dtype

    if tile_rows is None:
        # 56-row tiles measured best on the v5e (benchmarks/up1_bench.py
        # sweep); the raised vmem_limit makes them compile
        tile_rows = pick_tile(h, UP1_TILES, min_tile=UP1_MIN_TILE, even=True)
    th = tile_rows
    if (th is None or h % th != 0 or th % 2 != 0
            or (th < UP1_MIN_TILE and th != h)):
        raise ValueError(
            f"fused_up1_outc: no valid row tile for h={h} "
            f"(tile_rows={tile_rows}; need even, dividing h, and >= "
            f"{UP1_MIN_TILE} for the x-halo DMA unless tile == h); "
            f"use the XLA path")

    wd0, wd1 = make_deconv_weights(w_up.astype(dtype))
    wd = jnp.stack([wd0, wd1])
    # cat-operand weights: d2 and the pair conv's up-half share the up
    # operand, so their columns concatenate into ONE (6*2C, 4C) matrix
    wup2 = jnp.concatenate([make_cat_weights(w_d2, dtype),
                            make_cat_weights(w_pair[:, :, :c], dtype)], axis=1)
    wgy = jnp.stack([make_cat_weights(w_pair[:, :, c:], dtype),
                     make_cat_weights(w_blk1, dtype)])   # (2, 6*2C, 2C)
    biases = jnp.stack([
        jnp.tile(b_d2.astype(jnp.float32), 2),
        jnp.tile(b_pair.astype(jnp.float32), 2),
        jnp.tile(b_blk1.astype(jnp.float32), 2),
        jnp.tile(b_up.astype(jnp.float32), 2),
    ])                                         # (4, 2C)
    ncls2 = 2 * ncls
    w1 = jnp.zeros((c2, ncls2), dtype)
    w1 = w1.at[:c, :ncls].set(w_outc.astype(dtype))
    w1 = w1.at[c:, ncls:].set(w_outc.astype(dtype))
    b1 = jnp.tile(b_outc.astype(jnp.float32), 2)[None]   # (1, 2*ncls)

    # (N, 1, 2C): a batch-indexed block needs its second-minor dim to equal
    # the full array dim (Pallas TPU block-shape rule), so give the gate a
    # singleton row dim instead of blocking (1, 2C) out of (N, 2C)
    gate = gate_p1.astype(dtype)[:, None, :]

    kernel = functools.partial(
        _up1_kernel, th=th, h=h, wp=wp, c2=c2, ncls2=ncls2, dtype=dtype)
    rep = lambda ni, i: (0, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, c2), lambda ni, i: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c2, 2 * c2), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((6 * c2, 2 * c2), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 6 * c2, c2), lambda ni, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, c2), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c2, ncls2), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ncls2), lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wp, ncls2), lambda ni, i: (ni, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wp, ncls2), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th // 2 + 4, wp // 2, c2), dtype),
            pltpu.VMEM((2, th + 4, wp, c2), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(x_p, e1_p, gate, wd, wup2, wgy, biases, w1, b1)
