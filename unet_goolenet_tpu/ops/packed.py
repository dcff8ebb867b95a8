"""Pixel-packed (2px-per-128-lane) layout for 64-channel conv levels.

Why: TPU v5e tiles the minor (channel) dim to 128 lanes. The flagship UNet's
finest levels (inc / up1 @224^2, up2's tail @112^2 — reference
分割/nets/basicUnet.py:136-199's 64-channel decoder) therefore waste half the
MXU and HBM tile on padding. Packing two horizontally-adjacent pixels'
64 channels into one 128-lane row makes every tile dense:

    x:(N, H, W, 64)  ->  x_p:(N, H, W//2, 128)   [exact reshape, channels minor]

A 3x3 conv in packed layout becomes a 3x3 conv over packed columns with
block-expanded weights: output pixel 2j+p (parity p) tap dx reads input pixel
t = 2j + p + dx, i.e. packed column j + (p+dx)//2, lane-half (p+dx) % 2. Half
the expanded weight blocks are zero — the MXU pays 2x the logical FLOPs but at
full 128-lane utilisation, which measures ~1.2x FASTER than the padded dense
64-channel conv on chip, and every elementwise/BN/gate pass between convs
moves half the HBM tiles (benchmarks/RESULTS.md round-2 packed table).

The mixed variant (unpacked 64/128/256-channel input -> packed output) is a
stride-(1,2) conv with a (3,4) kernel — only 4/3 the logical FLOPs at full
lane use — used at chain heads where the input is already unpacked.

All variants accumulate in f32 (`preferred_element_type`) and are exact (the
extra weight blocks are zeros; only f32 summation order differs from the dense
conv). Oracle-tested against ops.conv2d in tests/test_packed.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def pack(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, H, W//2, 2C). Exact reshape; channels minor."""
    n, h, w, c = x.shape
    assert w % 2 == 0, f"width {w} must be even to pack"
    return x.reshape(n, h, w // 2, 2 * c)


def unpack(x_p: jax.Array) -> jax.Array:
    """(N, H, Wp, 2C) -> (N, H, 2*Wp, C)."""
    n, h, wp, c2 = x_p.shape
    return x_p.reshape(n, h, wp * 2, c2 // 2)


def expand_weights_pp(w: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) -> (3, 3, 2Cin, 2Cout) for packed-in -> packed-out.

    Output pixel 2j+p (parity p), logical tap offset dx in {-1,0,1} reads
    input pixel 2j + t with t = p + dx, i.e. packed kernel column
    (t // 2) + 1 and input lane-half t % 2. The unused (column, half)
    combinations stay zero.
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    wp = jnp.zeros((3, 3, 2 * cin, 2 * cout), w.dtype)
    for p in (0, 1):
        for dx in (-1, 0, 1):
            t = p + dx
            kxp = t // 2 + 1
            q = t % 2
            wp = wp.at[:, kxp, q * cin:(q + 1) * cin,
                       p * cout:(p + 1) * cout].set(w[:, dx + 1])
    return wp


def expand_weights_up(w: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) -> (3, 4, Cin, 2Cout) for unpacked-in -> packed-out
    (used with stride (1, 2), padding ((1,1),(1,2))).

    Output pixel 2j+p, tap offset dx reads input column 2j + p + dx; with
    stride 2 the window anchors at column 2j-1, so kernel index
    kx = p + dx + 1 in [0, 3].
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    wp = jnp.zeros((3, 4, cin, 2 * cout), w.dtype)
    for p in (0, 1):
        for dx in (-1, 0, 1):
            kx = p + dx + 1
            wp = wp.at[:, kx, :, p * cout:(p + 1) * cout].set(w[:, dx + 1])
    return wp


def _conv(x, w, stride, padding, dtype, accum=jnp.float32):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w.astype(dtype), stride, padding, dimension_numbers=dn,
        preferred_element_type=accum)


def conv3x3_pp(x_p: jax.Array, w_exp: jax.Array,
               b: Optional[jax.Array] = None, *, relu: bool = False,
               accum=jnp.float32) -> jax.Array:
    """Packed-in -> packed-out 3x3 'same' conv.

    x_p: (N, H, Wp, 2Cin); w_exp from expand_weights_pp (3, 3, 2Cin, 2Cout);
    b: (Cout,) logical bias, tiled over both pixel halves.
    """
    y = _conv(x_p, w_exp, (1, 1), [(1, 1), (1, 1)], x_p.dtype, accum)
    if b is not None:
        y = y + jnp.tile(b, 2).astype(y.dtype)
    y = y.astype(x_p.dtype)
    return jax.nn.relu(y) if relu else y


def conv3x3_up(x: jax.Array, w_exp: jax.Array,
               b: Optional[jax.Array] = None, *, relu: bool = False) -> jax.Array:
    """Unpacked-in -> packed-out 3x3 'same' conv (stride-2 over packed cols).

    x: (N, H, W, Cin) unpacked; w_exp from expand_weights_up (3, 4, Cin, 2Cout).
    Returns (N, H, W//2, 2Cout).
    """
    y = _conv(x, w_exp, (1, 2), [(1, 1), (1, 2)], x.dtype)
    if b is not None:
        y = y + jnp.tile(b, 2).astype(y.dtype)
    y = y.astype(x.dtype)
    return jax.nn.relu(y) if relu else y


def conv3x3_pp2(a_p: jax.Array, wa_exp: jax.Array,
                b_p: jax.Array, wb_exp: jax.Array,
                bias: Optional[jax.Array] = None, *,
                relu: bool = False, accum=jnp.float32) -> jax.Array:
    """conv3x3(concat([a, b], ch)) without materialising the concat.

    Splitting the weight into its block-rows, conv(cat([a,b])) == conv(a, Wa)
    + conv(b, Wb); the packed concat is a 4-way lane shuffle that costs more
    than a whole 64-channel conv on chip (benchmarks/RESULTS.md r2), so the
    split-sum form is the production path for the UNet's decoder concat+conv.
    """
    ya = _conv(a_p, wa_exp, (1, 1), [(1, 1), (1, 1)], a_p.dtype, accum)
    yb = _conv(b_p, wb_exp, (1, 1), [(1, 1), (1, 1)], b_p.dtype, accum)
    y = ya + yb
    if bias is not None:
        y = y + jnp.tile(bias, 2)
    y = y.astype(a_p.dtype)
    return jax.nn.relu(y) if relu else y


def conv3x3_up2(a: jax.Array, wa_exp: jax.Array,
                b: jax.Array, wb_exp: jax.Array,
                bias: Optional[jax.Array] = None, *,
                relu: bool = False, accum=jnp.float32) -> jax.Array:
    """Split-sum form of conv3x3_up(concat([a, b], ch)): unpacked inputs,
    packed output, no materialised concat."""
    ya = _conv(a, wa_exp, (1, 2), [(1, 1), (1, 2)], a.dtype, accum)
    yb = _conv(b, wb_exp, (1, 2), [(1, 1), (1, 2)], b.dtype, accum)
    y = ya + yb
    if bias is not None:
        y = y + jnp.tile(bias, 2)
    y = y.astype(a.dtype)
    return jax.nn.relu(y) if relu else y


def conv3x3_up2_l(a: jax.Array, wa: jax.Array, b_in: jax.Array,
                  wb: jax.Array, bias: jax.Array, *,
                  accum=jnp.float32) -> jax.Array:
    """conv3x3_up2 with LOGICAL (3,3,Cin,Cout) f32 weights and a
    dense-equivalent backward.

    Forward == conv3x3_up2(a, expand_weights_up(wa), b_in,
    expand_weights_up(wb), bias) — the fast stride-(1,2) packed-out head.
    Autodiff of that strided form emits four DILATED convs (dx with
    lhs_dilation=(1,2), dw with rhs_dilation=(1,2)) at the 112² level
    (benchmarks/bwd_profile.py); the exact identity
    conv3x3_up(x, expand(w)) == pack(conv3x3(x, w)) lets the backward run as
    plain dense stride-1 convs instead: da = conv(unpack(g), flip_io(wa)),
    dwa = native dw conv of (a, unpack(g)). Reference head conv:
    分割/nets/basicUnet.py:115-129 (UpBlockAlig nConvs block0)."""
    return _conv3x3_up2_l(jnp.dtype(accum), a, wa, b_in, wb, bias)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(0,))
def _conv3x3_up2_l(accum, a, wa, b_in, wb, bias):
    return conv3x3_up2(a, expand_weights_up(wa).astype(a.dtype),
                       b_in, expand_weights_up(wb).astype(a.dtype),
                       bias.astype(a.dtype), accum=accum)


def _up2l_fwd(accum, a, wa, b_in, wb, bias):
    return _conv3x3_up2_l(accum, a, wa, b_in, wb, bias), (a, b_in, wa, wb)


def _up2l_bwd(accum, res, g_p):
    a, b_in, wa, wb = res
    g = unpack(g_p)  # exact reshape: dense (N, H, W, Cout) cotangent
    # dx: adjoint of a SAME stride-1 3x3 conv = SAME conv with the spatially
    # flipped, io-swapped kernel
    wa_t = wa[::-1, ::-1].swapaxes(2, 3).astype(g.dtype)
    wb_t = wb[::-1, ::-1].swapaxes(2, 3).astype(g.dtype)
    da = _conv(g, wa_t, (1, 1), [(1, 1), (1, 1)], g.dtype, accum)
    db = _conv(g, wb_t, (1, 1), [(1, 1), (1, 1)], g.dtype, accum)

    def dw_of(x):
        # native dw conv via the transpose rule of the dense stride-1 conv
        f = lambda w_: _conv(x, w_, (1, 1), [(1, 1), (1, 1)], x.dtype, accum)
        wshape = jax.ShapeDtypeStruct((3, 3, x.shape[-1], g.shape[-1]),
                                      x.dtype)
        (dw,) = jax.linear_transpose(f, wshape)(g.astype(jnp.dtype(accum)))
        return dw

    dwa = dw_of(a).astype(wa.dtype)
    dwb = dw_of(b_in).astype(wb.dtype)
    dbias = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return (da.astype(a.dtype), dwa, db.astype(b_in.dtype), dwb, dbias)


_conv3x3_up2_l.defvjp(_up2l_fwd, _up2l_bwd)


def conv1x1_p(x_p: jax.Array, w: jax.Array,
              b: Optional[jax.Array] = None, accum=jnp.float32) -> jax.Array:
    """1x1 conv in packed layout: block-diagonal lane matmul.

    w: (Cin, Cout) logical; both pixel halves share it.
    """
    cin, cout = w.shape
    w2 = jnp.zeros((2 * cin, 2 * cout), w.dtype)
    w2 = w2.at[:cin, :cout].set(w).at[cin:, cout:].set(w)
    y = jnp.dot(x_p, w2.astype(x_p.dtype), preferred_element_type=accum)
    if b is not None:
        y = y + jnp.tile(b, 2).astype(y.dtype)
    return y.astype(x_p.dtype)


def max_pool2x2_p(x_p: jax.Array) -> jax.Array:
    """2x2/s2 max pool, packed in and out.

    Out packed col j holds out pixels (2j, 2j+1) <- input packed cols 2j, 2j+1,
    each pooling its own two lane-halves and two rows.

    NB measured SLOWER than the dense reduce_window on chip (the lane-splitting
    reshape de-optimises XLA; RESULTS.md r2b) — production uses
    max_pool2x2_p_to_dense, which is also what the engine's downsample needs.
    Kept as the packed->packed reference implementation.
    """
    n, h, wp, c2 = x_p.shape
    c = c2 // 2
    v = x_p.reshape(n, h // 2, 2, wp // 2, 2, 2, c)
    # axes: (N, H2, row-in-pair, Wp2, packed-col-in-pair, pixel-half, C)
    pooled = jnp.max(jnp.max(v, axis=2), axis=4)  # (N, H2, Wp2, 2, C)
    return pooled.reshape(n, h // 2, wp // 2, c2)


def _mpp_raw(x_p: jax.Array) -> jax.Array:
    c = x_p.shape[-1] // 2
    row = jax.lax.reduce_window(x_p, -jnp.inf, jax.lax.max,
                                (1, 2, 1, 1), (1, 2, 1, 1), "VALID")
    return jnp.maximum(row[..., :c], row[..., c:])


@jax.custom_vjp
def max_pool2x2_p_to_dense(x_p: jax.Array) -> jax.Array:
    """2x2/s2 max pool, packed in -> DENSE out: (N,H,Wp,2C) -> (N,H/2,Wp,C).

    The packed col j holds the horizontal pool pair (pixels 2j, 2j+1), so the
    pool is a rows-only reduce_window (full 128-lane tiles, no padding waste)
    followed by a lane-half max, and the result is already the dense pooled
    tensor (out width == Wp). Measured 2.09 ms vs 5.05 ms for the dense
    reduce_window on the 64-channel 224^2 level; NB strided-slice forms
    (x[:, 0::2]) are ~3x slower than reduce_window on TPU — keep the window op
    (benchmarks/RESULTS.md r2).

    Custom VJP: the autodiff adjoint would be a rows SelectAndScatter (slow on
    TPU, benchmarks/bwd_profile.py) plus a balanced-tie `maximum` grad. The
    custom backward routes the cotangent to the FIRST max in the LOGICAL
    window scan order (r0c0, r0c1, r1c0, r1c1) = (row0 half0, row0 half1,
    row1 half0, row1 half1) with pure elementwise masks — the same tie rule as
    ops.pool.max_pool2x2, so packed and dense training grads agree.
    """
    return _mpp_raw(x_p)


def _mpp_fwd(x_p):
    y = _mpp_raw(x_p)
    return y, (x_p, y)


def _mpp_bwd(res, g):
    x_p, y = res
    n, h2, wp, c = y.shape
    a = x_p.reshape(n, h2, 2, wp, 2 * c)
    e00 = a[:, :, 0, :, :c] == y
    e01 = a[:, :, 0, :, c:] == y
    e10 = a[:, :, 1, :, :c] == y
    e11 = a[:, :, 1, :, c:] == y
    m01 = e01 & ~e00
    m10 = e10 & ~(e00 | e01)
    m11 = e11 & ~(e00 | e01 | e10)
    z = jnp.zeros_like(g)
    row0 = jnp.concatenate([jnp.where(e00, g, z), jnp.where(m01, g, z)],
                           axis=-1)
    row1 = jnp.concatenate([jnp.where(m10, g, z), jnp.where(m11, g, z)],
                           axis=-1)
    return (jnp.stack([row0, row1], axis=2).reshape(x_p.shape),)


max_pool2x2_p_to_dense.defvjp(_mpp_fwd, _mpp_bwd)


def mean_max_hw_p(x_p: jax.Array):
    """Global (H, W) mean and max per logical channel from packed layout.

    Returns ((N,1,1,C), (N,1,1,C)) matching jnp.mean/max(axis=(1,2)) on the
    unpacked tensor.
    """
    n, h, wp, c2 = x_p.shape
    c = c2 // 2
    v = x_p.reshape(n, h, wp, 2, c)
    mean = jnp.mean(v, axis=(1, 2, 3))[:, None, None, :]
    mx = jnp.max(v, axis=(1, 2, 3))[:, None, None, :]
    return mean, mx


def scale_p(x_p: jax.Array, s: jax.Array) -> jax.Array:
    """Multiply packed tensor by a (N,1,1,C) per-channel gate."""
    return x_p * jnp.concatenate([s, s], axis=-1).astype(x_p.dtype)


def concat_channels_p(a_p: jax.Array, b_p: jax.Array) -> jax.Array:
    """Per-pixel channel concat of two packed tensors.

    [px0 a | px1 a] + [px0 b | px1 b] -> [px0 a, px0 b | px1 a, px1 b].
    """
    ca = a_p.shape[-1] // 2
    cb = b_p.shape[-1] // 2
    return jnp.concatenate(
        [a_p[..., :ca], b_p[..., :cb], a_p[..., ca:], b_p[..., cb:]], axis=-1)


def conv_transpose2x2_p(x_p: jax.Array, w: jax.Array,
                        b: Optional[jax.Array] = None,
                        accum=jnp.float32) -> jax.Array:
    """2x2/s2 transposed conv, packed in (N,H,Wp,2C) -> packed out
    (N,2H,2Wp... i.e. (N, 2H, W, 2C)): the matmul + depth-to-space lowering of
    ops.conv_transpose2x2, block-diagonal over the two pixel halves.

    w: (2, 2, Cin, Cout) torch-layout HWIO kernel.
    """
    n, h, wp, c2 = x_p.shape
    cin = c2 // 2
    _, _, wcin, cout = w.shape
    assert wcin == cin
    # per input pixel: 4 sub-outputs (r0c0, r0c1, r1c0, r1c1) x Cout
    wm = w.transpose(2, 0, 1, 3).reshape(cin, 4 * cout)  # (Cin, 4Cout)
    w2 = jnp.zeros((2 * cin, 8 * cout), w.dtype)
    w2 = w2.at[:cin, :4 * cout].set(wm).at[cin:, 4 * cout:].set(wm)
    y = jnp.dot(x_p, w2.astype(x_p.dtype), preferred_element_type=accum)
    if b is not None:
        y = y + jnp.tile(b, 8)  # f32 bias add, matching ops.conv_transpose2x2
    y = y.astype(x_p.dtype)
    # y: (N, H, Wp, 2px * 2row * 2col * Cout) -> packed out (N, 2H, Wp*2, 2Cout)
    y = y.reshape(n, h, wp, 2, 2, 2, cout)  # (.., px, row, col, C)
    y = y.transpose(0, 1, 4, 2, 3, 5, 6)    # (N, H, row, Wp, px, col, C)
    return y.reshape(n, 2 * h, wp * 2, 2 * cout)
