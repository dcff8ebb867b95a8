"""Oracle tests for the pixel-packed 64-channel layout (ops/packed.py).

Every packed op must match its dense counterpart exactly up to f32 summation
order: pack/unpack round-trips, both conv variants vs ops.conv2d, transposed
conv vs ops.conv_transpose2x2, pool/reductions/gates vs jnp on the unpacked
tensor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_goolenet_tpu import ops
from unet_goolenet_tpu.ops import packed as P


def rnd(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


KEYS = jax.random.split(jax.random.PRNGKey(0), 8)


class TestPackUnpack:
    def test_roundtrip(self):
        x = rnd(KEYS[0], (2, 8, 12, 64))
        np.testing.assert_array_equal(P.unpack(P.pack(x)), x)

    def test_lane_layout(self):
        # packed col j = [pixel 2j channels | pixel 2j+1 channels]
        x = rnd(KEYS[0], (1, 4, 6, 64))
        xp = P.pack(x)
        np.testing.assert_array_equal(xp[0, 0, 1, :64], x[0, 0, 2])
        np.testing.assert_array_equal(xp[0, 0, 1, 64:], x[0, 0, 3])


class TestPackedConvs:
    @pytest.mark.parametrize("cin,cout", [(64, 64), (128, 64), (64, 128)])
    def test_conv3x3_pp(self, cin, cout):
        x = rnd(KEYS[1], (2, 8, 12, cin))
        w = rnd(KEYS[2], (3, 3, cin, cout)) * 0.1
        b = rnd(KEYS[3], (cout,))
        ref = jax.nn.relu(ops.conv2d(x, w, b, padding=1))
        got = P.unpack(P.conv3x3_pp(P.pack(x), P.expand_weights_pp(w), b,
                                    relu=True))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("cin,cout", [(64, 64), (128, 64), (256, 64)])
    def test_conv3x3_up(self, cin, cout):
        x = rnd(KEYS[1], (2, 8, 12, cin))
        w = rnd(KEYS[2], (3, 3, cin, cout)) * 0.1
        b = rnd(KEYS[3], (cout,))
        ref = ops.conv2d(x, w, b, padding=1)
        got = P.unpack(P.conv3x3_up(x, P.expand_weights_up(w), b))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_conv1x1_p(self):
        x = rnd(KEYS[1], (2, 6, 8, 64))
        w = rnd(KEYS[2], (64, 32)) * 0.1
        b = rnd(KEYS[3], (32,))
        ref = jnp.dot(x, w) + b
        got = P.unpack(P.conv1x1_p(P.pack(x), w, b))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_conv_transpose2x2_p(self):
        x = rnd(KEYS[1], (2, 6, 8, 64))
        w = rnd(KEYS[2], (2, 2, 64, 64)) * 0.1
        b = rnd(KEYS[3], (64,))
        ref = ops.conv_transpose2x2(x, w, b)
        got = P.unpack(P.conv_transpose2x2_p(P.pack(x), w, b))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


class TestPackedElementwise:
    def test_max_pool2x2_p(self):
        x = rnd(KEYS[4], (2, 8, 12, 64))
        ref = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                    (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        got = P.unpack(P.max_pool2x2_p(P.pack(x)))
        np.testing.assert_array_equal(got, ref)

    def test_mean_max_hw_p(self):
        x = rnd(KEYS[5], (2, 8, 12, 64))
        mean, mx = P.mean_max_hw_p(P.pack(x))
        np.testing.assert_allclose(mean, jnp.mean(x, axis=(1, 2),
                                                  keepdims=True), rtol=1e-5)
        np.testing.assert_array_equal(mx, jnp.max(x, axis=(1, 2),
                                                  keepdims=True))

    def test_scale_p(self):
        x = rnd(KEYS[6], (2, 4, 6, 64))
        s = rnd(KEYS[7], (2, 1, 1, 64))
        np.testing.assert_allclose(P.unpack(P.scale_p(P.pack(x), s)), x * s,
                                   rtol=1e-6)

    def test_concat_channels_p(self):
        a = rnd(KEYS[6], (2, 4, 6, 64))
        b = rnd(KEYS[7], (2, 4, 6, 64))
        ref = jnp.concatenate([a, b], axis=-1)
        got = P.unpack(P.concat_channels_p(P.pack(a), P.pack(b)))
        np.testing.assert_array_equal(got, ref)


class TestSplitSumConvs:
    """conv(concat([a,b])) == conv(a, W[:, :, :ca]) + conv(b, W[:, :, ca:])."""

    def test_conv3x3_pp2(self):
        a = rnd(KEYS[0], (2, 8, 12, 64))
        b = rnd(KEYS[1], (2, 8, 12, 64))
        w = rnd(KEYS[2], (3, 3, 128, 64)) * 0.1
        bias = rnd(KEYS[3], (64,))
        ref = jax.nn.relu(ops.conv2d(jnp.concatenate([a, b], -1), w, bias,
                                     padding=1))
        got = P.unpack(P.conv3x3_pp2(
            P.pack(a), P.expand_weights_pp(w[:, :, :64]),
            P.pack(b), P.expand_weights_pp(w[:, :, 64:]), bias, relu=True))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_conv3x3_up2(self):
        a = rnd(KEYS[0], (2, 8, 12, 128))
        b = rnd(KEYS[1], (2, 8, 12, 128))
        w = rnd(KEYS[2], (3, 3, 256, 64)) * 0.1
        bias = rnd(KEYS[3], (64,))
        ref = jax.nn.relu(ops.conv2d(jnp.concatenate([a, b], -1), w, bias,
                                     padding=1))
        got = P.unpack(P.conv3x3_up2(
            a, P.expand_weights_up(w[:, :, :128]),
            b, P.expand_weights_up(w[:, :, 128:]), bias, relu=True))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_max_pool2x2_p_to_dense(self):
        x = rnd(KEYS[4], (2, 8, 12, 64))
        ref = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                    (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        got = P.max_pool2x2_p_to_dense(P.pack(x))
        np.testing.assert_array_equal(got, ref)

    def test_conv3x3_up2_l_grad(self):
        # the dense-equivalent backward of the logical-weight strided head
        # must match autodiff of the expanded strided composite (same math,
        # different f32 summation order)
        a = rnd(KEYS[0], (2, 8, 12, 32)) * 0.3
        b = rnd(KEYS[1], (2, 8, 12, 32)) * 0.3
        wa = rnd(KEYS[2], (3, 3, 32, 16)) * 0.1
        wb = rnd(KEYS[3], (3, 3, 32, 16)) * 0.1
        bias = rnd(KEYS[4], (16,)) * 0.1

        def f_new(ops_):
            return jnp.sum(P.conv3x3_up2_l(*ops_) ** 2)

        def f_old(ops_):
            a_, wa_, b_, wb_, bias_ = ops_
            return jnp.sum(P.conv3x3_up2(
                a_, P.expand_weights_up(wa_), b_, P.expand_weights_up(wb_),
                bias_) ** 2)

        args = (a, wa, b, wb, bias)
        np.testing.assert_allclose(f_new(args), f_old(args), rtol=1e-6)
        gn = jax.grad(f_new)(args)
        go = jax.grad(f_old)(args)
        for n, o in zip(gn, go):
            np.testing.assert_allclose(np.asarray(n), np.asarray(o),
                                       rtol=1e-4, atol=1e-5)

    def test_max_pool2x2_p_to_dense_grad(self):
        # packed-pool custom VJP must route grads exactly like the dense
        # ops.max_pool2d custom VJP (same first-max tie rule in LOGICAL window
        # order), including on ties — quantise to force collisions.
        x = jnp.round(rnd(KEYS[5], (2, 8, 12, 64)) * 2) / 2
        g = rnd(KEYS[6], (2, 4, 6, 64))

        _, vjp_p = jax.vjp(lambda v: P.max_pool2x2_p_to_dense(P.pack(v)), x)
        _, vjp_d = jax.vjp(lambda v: ops.max_pool2d(v, 2), x)
        np.testing.assert_array_equal(np.asarray(vjp_p(g)[0]),
                                      np.asarray(vjp_d(g)[0]))
