"""Pallas kernel parity tests (interpreter mode on CPU; compiled on real TPU).

Oracles are the XLA ops (ops.conv2d etc.) already validated against torch."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unet_goolenet_tpu import ops
from unet_goolenet_tpu.ops import pallas as pk

pk.interpret_mode(True)

RNG = np.random.default_rng(7)


def rand(*shape):
    return jnp.asarray(RNG.standard_normal(shape).astype(np.float32))


class TestFusedConv3x3:
    def test_forward_matches_xla(self):
        x = rand(2, 16, 24, 8)
        w = rand(3, 3, 8, 16)
        scale = jnp.abs(rand(16)) + 0.5
        bias = rand(16)
        got = pk.fused_conv3x3(x, w, scale, bias, True)
        ref = jax.nn.relu(ops.conv2d(x, w, None, padding=1) * scale + bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_forward_no_relu(self):
        x = rand(1, 8, 8, 4)
        w = rand(3, 3, 4, 4)
        got = pk.fused_conv3x3(x, w, jnp.ones(4), jnp.zeros(4), False)
        ref = ops.conv2d(x, w, None, padding=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_gradients_match_xla(self):
        x = rand(1, 8, 8, 4)
        w = rand(3, 3, 4, 6)
        scale = jnp.abs(rand(6)) + 0.5
        bias = rand(6)

        def f_pallas(x, w, s, b):
            return jnp.sum(pk.fused_conv3x3(x, w, s, b, True) ** 2)

        def f_xla(x, w, s, b):
            return jnp.sum(jax.nn.relu(ops.conv2d(x, w, None, padding=1) * s + b) ** 2)

        gp = jax.grad(f_pallas, argnums=(0, 1, 2, 3))(x, w, scale, bias)
        gx = jax.grad(f_xla, argnums=(0, 1, 2, 3))(x, w, scale, bias)
        for a, b_, name in zip(gp, gx, ("dx", "dw", "dscale", "dbias")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-3, atol=1e-3, err_msg=name)

    def test_fallback_on_odd_height(self):
        x = rand(1, 7, 8, 4)  # 7 not tileable -> XLA fallback
        w = rand(3, 3, 4, 4)
        got = pk.fused_conv3x3_or_fallback(x, w, jnp.ones(4), jnp.zeros(4))
        ref = jax.nn.relu(ops.conv2d(x, w, None, padding=1))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestFusedConvStack2:
    def test_matches_xla_pair(self):
        x = rand(2, 8, 12, 16)
        w1 = rand(3, 3, 16, 32)
        s1 = jnp.abs(rand(32)) + 0.5
        b1 = rand(32)
        w2 = rand(3, 3, 32, 16)
        s2 = jnp.abs(rand(16)) + 0.5
        b2 = rand(16)
        got = pk.fused_convstack2(x, w1, s1, b1, w2, s2, b2)
        mid = jax.nn.relu(ops.conv2d(x, w1, None, padding=1) * s1 + b1)
        ref = jax.nn.relu(ops.conv2d(mid, w2, None, padding=1) * s2 + b2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_fallback_when_too_big(self):
        # 64-channel 224^2-scale shapes exceed the whole-image VMEM budget ->
        # must fall back to XLA and still be correct
        x = rand(1, 16, 16, 8)
        w1 = rand(3, 3, 8, 8)
        w2 = rand(3, 3, 8, 8)
        ones, zeros = jnp.ones(8), jnp.zeros(8)
        got = pk.fused_convstack2_or_fallback(x, w1, ones, zeros, w2, ones, zeros)
        mid = jax.nn.relu(ops.conv2d(x, w1, None, padding=1))
        ref = jax.nn.relu(ops.conv2d(mid, w2, None, padding=1))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        from unet_goolenet_tpu.ops.pallas.conv import _stack2_fits
        assert not _stack2_fits(224, 224, 64, 64, 64, 4)
        assert _stack2_fits(56, 56, 128, 256, 256, 2)


class TestDeconv2x2:
    def test_forward_matches_xla(self):
        x = rand(2, 8, 12, 8)
        w = rand(2, 2, 8, 4)
        b = rand(4)
        got = pk.conv_transpose2x2_pallas(x, w, b)
        ref = ops.conv_transpose2x2(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_gradients(self):
        x = rand(1, 4, 4, 4)
        w = rand(2, 2, 4, 4)
        b = rand(4)

        def f_p(x, w, b):
            return jnp.sum(pk.conv_transpose2x2_pallas(x, w, b) ** 2)

        def f_x(x, w, b):
            return jnp.sum(ops.conv_transpose2x2(x, w, b) ** 2)

        gp = jax.grad(f_p, argnums=(0, 1, 2))(x, w, b)
        gx = jax.grad(f_x, argnums=(0, 1, 2))(x, w, b)
        for a, b_, name in zip(gp, gx, ("dx", "dw", "db")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-3, atol=1e-3, err_msg=name)

    def test_gradients_multitile(self):
        # h > row tile and batch > 1 so the dw/db accumulator is revisited
        # across several sequential grid steps
        x = rand(2, 8, 12, 8)
        w = rand(2, 2, 8, 4)
        b = rand(4)

        def f_p(x, w, b):
            return jnp.sum(jnp.sin(pk.conv_transpose2x2_pallas(x, w, b)))

        def f_x(x, w, b):
            return jnp.sum(jnp.sin(ops.conv_transpose2x2(x, w, b)))

        gp = jax.grad(f_p, argnums=(0, 1, 2))(x, w, b)
        gx = jax.grad(f_x, argnums=(0, 1, 2))(x, w, b)
        for a, b_, name in zip(gp, gx, ("dx", "dw", "db")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-3, atol=1e-3, err_msg=name)


class TestMaxPool:
    def test_forward(self):
        x = rand(2, 16, 16, 8)
        got = pk.max_pool2x2_pallas(x)
        ref = ops.max_pool2d(x, 2)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_gradient_no_ties(self):
        # distinct values -> unique max per window -> grad matches XLA exactly
        x = jnp.asarray(
            RNG.permutation(16 * 16 * 4).reshape(1, 16, 16, 4).astype(np.float32))

        def f_p(x):
            return jnp.sum(pk.max_pool2x2_pallas(x) ** 2)

        def f_x(x):
            return jnp.sum(ops.max_pool2d(x, 2) ** 2)

        np.testing.assert_allclose(
            np.asarray(jax.grad(f_p)(x)), np.asarray(jax.grad(f_x)(x)),
            rtol=1e-5, atol=1e-5)

    def test_jittable(self):
        x = rand(1, 8, 8, 4)
        y = jax.jit(pk.max_pool2x2_pallas)(x)
        assert y.shape == (1, 4, 4, 4)

    def test_gradient_ties_route_to_first(self):
        # constant / duplicated windows: grads must land on the FIRST max in
        # row-major window order, exactly like XLA select-and-scatter and torch
        x = jnp.asarray(
            RNG.integers(0, 3, size=(2, 8, 8, 4)).astype(np.float32))
        wgt = rand(2, 4, 4, 4)

        def f_p(x):
            return jnp.sum(pk.max_pool2x2_pallas(x) * wgt)

        def f_x(x):
            return jnp.sum(ops.max_pool2d(x, 2) * wgt)

        np.testing.assert_array_equal(
            np.asarray(jax.grad(f_p)(x)), np.asarray(jax.grad(f_x)(x)))

    def test_gradient_ties_match_torch(self):
        import torch

        x_np = RNG.integers(0, 2, size=(1, 6, 6, 3)).astype(np.float32)
        g = jax.grad(lambda t: jnp.sum(pk.max_pool2x2_pallas(t)))(
            jnp.asarray(x_np))
        xt = torch.tensor(x_np.transpose(0, 3, 1, 2), requires_grad=True)
        torch.nn.functional.max_pool2d(xt, 2).sum().backward()
        np.testing.assert_array_equal(
            np.asarray(g), xt.grad.numpy().transpose(0, 2, 3, 1))


class TestFusedUp1:
    """fused_up1_outc vs the XLA packed chain (pipeline/engine._up_alig_p
    semantics rebuilt from ops.packed): deconv -> d2 -> gate-combine ->
    split-sum pair -> block1 -> outc, per row-tile in VMEM."""

    def _xla_ref(self, x_p, e1_p, gate, ws):
        from unet_goolenet_tpu.ops import packed as P
        c = x_p.shape[-1] // 2
        up = P.conv_transpose2x2_p(x_p, ws["w_up"], ws["b_up"])
        d2 = P.conv3x3_pp(up, P.expand_weights_pp(ws["w_d2"]), ws["b_d2"],
                          relu=True)
        gated = e1_p + P.scale_p(d2, gate) + d2
        h = P.conv3x3_pp2(up, P.expand_weights_pp(ws["w_pair"][:, :, :c]),
                          gated, P.expand_weights_pp(ws["w_pair"][:, :, c:]),
                          ws["b_pair"], relu=True)
        y = P.conv3x3_pp(h, P.expand_weights_pp(ws["w_blk1"]), ws["b_blk1"],
                         relu=True)
        return P.conv1x1_p(y, ws["w_outc"], ws["b_outc"])

    @pytest.mark.parametrize("tile_rows", [16, 8, 4])
    def test_matches_xla_packed_chain(self, tile_rows):
        n, h, wp, c = 2, 32, 8, 8
        x_p = rand(n, h // 2, wp // 2, 2 * c)
        e1_p = rand(n, h, wp, 2 * c)
        gate = jnp.abs(rand(n, 1, 1, c)) * 0.5
        ws = {
            "w_up": rand(2, 2, c, c) * 0.3, "b_up": rand(c),
            "w_d2": rand(3, 3, c, c) * 0.3, "b_d2": rand(c),
            "w_pair": rand(3, 3, 2 * c, c) * 0.3, "b_pair": rand(c),
            "w_blk1": rand(3, 3, c, c) * 0.3, "b_blk1": rand(c),
            "w_outc": rand(c, 1), "b_outc": rand(1),
        }
        ref = self._xla_ref(x_p, e1_p, gate, ws)
        gate_p1 = jnp.tile(1.0 + gate[:, 0, 0, :], (1, 2))
        got = pk.fused_up1_outc(
            x_p, e1_p, gate_p1,
            ws["w_up"], ws["b_up"], ws["w_d2"], ws["b_d2"],
            ws["w_pair"], ws["b_pair"], ws["w_blk1"], ws["b_blk1"],
            ws["w_outc"], ws["b_outc"], tile_rows=tile_rows)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_multiclass_outc(self):
        n, h, wp, c = 1, 16, 4, 8
        x_p = rand(n, h // 2, wp // 2, 2 * c)
        e1_p = rand(n, h, wp, 2 * c)
        gate = jnp.abs(rand(n, 1, 1, c))
        ws = {
            "w_up": rand(2, 2, c, c) * 0.3, "b_up": rand(c),
            "w_d2": rand(3, 3, c, c) * 0.3, "b_d2": rand(c),
            "w_pair": rand(3, 3, 2 * c, c) * 0.3, "b_pair": rand(c),
            "w_blk1": rand(3, 3, c, c) * 0.3, "b_blk1": rand(c),
            "w_outc": rand(c, 3), "b_outc": rand(3),
        }
        ref = self._xla_ref(x_p, e1_p, gate, ws)
        gate_p1 = jnp.tile(1.0 + gate[:, 0, 0, :], (1, 2))
        got = pk.fused_up1_outc(
            x_p, e1_p, gate_p1,
            ws["w_up"], ws["b_up"], ws["w_d2"], ws["b_d2"],
            ws["w_pair"], ws["b_pair"], ws["w_blk1"], ws["b_blk1"],
            ws["w_outc"], ws["b_outc"], tile_rows=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestFusedCbnStats:
    def test_conv_and_stats_match_oracle(self):
        """fused_cbn_stats == conv3x3_pp + mean_max_hw_p (the up1 gate pass)."""
        from unet_goolenet_tpu.ops import packed as P
        from unet_goolenet_tpu.ops.pallas.up1 import fused_cbn_stats

        n, h, wp, c = 2, 16, 6, 8
        x_p = rand(n, h, wp, 2 * c)
        w = rand(3, 3, c, c) * 0.3
        b = rand(c)
        ref_e1 = P.conv3x3_pp(x_p, P.expand_weights_pp(w), b, relu=True)
        ravg, rmax = P.mean_max_hw_p(ref_e1)
        e1, mean, mx = fused_cbn_stats(x_p, w, b, tile_rows=4)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(ref_e1),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(ravg),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mx), np.asarray(rmax),
                                   rtol=1e-4, atol=1e-5)


class TestFusedUp2:
    """fused_up2 vs the XLA chain (pipeline/engine's up2 section semantics):
    dense deconv -> d2 -> gate-combine -> split-sum pair (dense in, packed
    out) -> packed block1, per row-tile in VMEM (ops/pallas/up2.py)."""

    def _xla_ref(self, x, e1, gate, ws):
        from unet_goolenet_tpu.ops import packed as P
        c = x.shape[-1]
        up = ops.conv_transpose2x2(x, ws["w_up"], ws["b_up"])
        d2 = jax.nn.relu(ops.conv2d(up, ws["w_d2"], ws["b_d2"], padding=1))
        gated = e1 + gate * d2 + d2
        y_p = P.conv3x3_up2(
            up, P.expand_weights_up(ws["w_pair"][:, :, :c]),
            gated, P.expand_weights_up(ws["w_pair"][:, :, c:]),
            ws["b_pair"], relu=True)
        return P.conv3x3_pp(y_p, P.expand_weights_pp(ws["w_blk1"]),
                            ws["b_blk1"], relu=True)

    def _ws(self, c, cq):
        return {
            "w_up": rand(2, 2, c, c) * 0.3, "b_up": rand(c),
            "w_d2": rand(3, 3, c, c) * 0.3, "b_d2": rand(c),
            "w_pair": rand(3, 3, 2 * c, cq) * 0.3, "b_pair": rand(cq),
            "w_blk1": rand(3, 3, cq, cq) * 0.3, "b_blk1": rand(cq),
        }

    @pytest.mark.parametrize("tile_rows", [16, 8, 4])
    def test_matches_xla_chain(self, tile_rows):
        from unet_goolenet_tpu.ops.pallas.up2 import fused_up2
        n, h, w, c = 2, 32, 16, 16
        cq = c // 2
        x = rand(n, h // 2, w // 2, c)
        e1 = rand(n, h, w, c)
        gate = jnp.abs(rand(n, 1, 1, c)) * 0.5
        ws = self._ws(c, cq)
        ref = self._xla_ref(x, e1, gate, ws)
        got = fused_up2(x, e1, 1.0 + gate[:, 0, 0, :],
                        ws["w_up"], ws["b_up"], ws["w_d2"], ws["b_d2"],
                        ws["w_pair"], ws["b_pair"], ws["w_blk1"],
                        ws["b_blk1"], tile_rows=tile_rows)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_single_tile_grid(self):
        from unet_goolenet_tpu.ops.pallas.up2 import fused_up2
        n, h, w, c = 1, 8, 8, 8
        cq = c // 2
        x = rand(n, h // 2, w // 2, c)
        e1 = rand(n, h, w, c)
        gate = jnp.abs(rand(n, 1, 1, c))
        ws = self._ws(c, cq)
        ref = self._xla_ref(x, e1, gate, ws)
        got = fused_up2(x, e1, 1.0 + gate[:, 0, 0, :],
                        ws["w_up"], ws["b_up"], ws["w_d2"], ws["b_d2"],
                        ws["w_pair"], ws["b_pair"], ws["w_blk1"],
                        ws["b_blk1"], tile_rows=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestCbnStatsDense:
    def test_conv_and_stats_match_oracle(self):
        from unet_goolenet_tpu.ops.pallas.up2 import fused_cbn_stats_dense
        n, h, w, c = 2, 24, 16, 8
        x = rand(n, h, w, c)
        wk = rand(3, 3, c, c) * 0.3
        b = rand(c)
        e1, mean, mx = fused_cbn_stats_dense(x, wk, b, tile_rows=8)
        ref = jax.nn.relu(ops.conv2d(x, wk, b, padding=1))
        np.testing.assert_allclose(np.asarray(e1), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(mean), np.asarray(jnp.mean(ref, axis=(1, 2),
                                                  keepdims=True)),
            rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(mx), np.asarray(jnp.max(ref, axis=(1, 2),
                                               keepdims=True)),
            rtol=1e-4, atol=1e-4)

    def test_unaligned_width_padding(self):
        """Widths that are not sublane multiples (up4's 28-wide skip) go
        through the zero-pad + post-mask path; conv AND the global stats
        must still be exact (pad columns re-zeroed before the sum/max)."""
        from unet_goolenet_tpu.ops.pallas.up2 import fused_cbn_stats_dense
        n, h, w, c = 2, 24, 12, 8
        x = rand(n, h, w, c)
        wk = rand(3, 3, c, c) * 0.3
        b = rand(c) + 1.0          # positive bias: relu(bias) would leak
        e1, mean, mx = fused_cbn_stats_dense(x, wk, b, tile_rows=8)
        assert e1.shape == x.shape
        ref = jax.nn.relu(ops.conv2d(x, wk, b, padding=1))
        np.testing.assert_allclose(np.asarray(e1), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(mean), np.asarray(jnp.mean(ref, axis=(1, 2),
                                                  keepdims=True)),
            rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(mx), np.asarray(jnp.max(ref, axis=(1, 2),
                                               keepdims=True)),
            rtol=1e-4, atol=1e-4)


class TestFusedUp2Integration:
    def test_engine_forward_matches_unfused(self):
        """unet_forward_packed(fused_up2=True) == the plain packed forward
        (and with fused_up1 stacked on top) on a tiny flagship model."""
        from unet_goolenet_tpu.models import UNetTaskAligWeight
        from unet_goolenet_tpu.pipeline import engine

        model = UNetTaskAligWeight(n_classes=1)
        x = jnp.asarray(RNG.standard_normal((1, 32, 32, 3)).astype(np.float32))
        v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        ref = engine.unet_forward_packed(v, x)
        got2 = engine.unet_forward_packed(v, x, fused_up2=True)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        got12 = engine.unet_forward_packed(v, x, fused_up1=True,
                                           fused_up2=True)
        np.testing.assert_allclose(np.asarray(got12), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestFusedUpDense:
    """fused_up_dense (the up3/up4 variant: dense block1 output) vs the XLA
    _up_alig chain."""

    def _xla_ref(self, x, e1, gate, ws):
        c = x.shape[-1]
        up = ops.conv_transpose2x2(x, ws["w_up"], ws["b_up"])
        d2 = jax.nn.relu(ops.conv2d(up, ws["w_d2"], ws["b_d2"], padding=1))
        gated = e1 + gate * d2 + d2
        hh = jax.nn.relu(
            ops.conv2d(up, ws["w_pair"][:, :, :c], None, padding=1)
            + ops.conv2d(gated, ws["w_pair"][:, :, c:], ws["b_pair"],
                         padding=1))
        return jax.nn.relu(ops.conv2d(hh, ws["w_blk1"], ws["b_blk1"],
                                      padding=1))

    @pytest.mark.parametrize("tile_rows", [8, 4])
    def test_matches_xla_chain(self, tile_rows):
        from unet_goolenet_tpu.ops.pallas.up2 import fused_up_dense
        n, h, w, c = 2, 16, 8, 16
        cq = c // 2
        x = rand(n, h // 2, w // 2, c)
        e1 = rand(n, h, w, c)
        gate = jnp.abs(rand(n, 1, 1, c)) * 0.5
        ws = {
            "w_up": rand(2, 2, c, c) * 0.3, "b_up": rand(c),
            "w_d2": rand(3, 3, c, c) * 0.3, "b_d2": rand(c),
            "w_pair": rand(3, 3, 2 * c, cq) * 0.3, "b_pair": rand(cq),
            "w_blk1": rand(3, 3, cq, cq) * 0.3, "b_blk1": rand(cq),
        }
        ref = self._xla_ref(x, e1, gate, ws)
        got = fused_up_dense(x, e1, 1.0 + gate[:, 0, 0, :],
                             ws["w_up"], ws["b_up"], ws["w_d2"], ws["b_d2"],
                             ws["w_pair"], ws["b_pair"], ws["w_blk1"],
                             ws["b_blk1"], tile_rows=tile_rows)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("w", [12, 28])
    def test_unaligned_width_padding(self, w):
        """Sublane-unaligned widths (the real up3/up4 geometries: 28, 14) go
        through the wrapper's zero-pad + the kernel's row-and-column mask;
        output must equal the XLA chain exactly as if never padded."""
        from unet_goolenet_tpu.ops.pallas.up2 import fused_up_dense
        n, h, c = 2, 16, 16
        cq = c // 2
        x = rand(n, h // 2, w // 2, c)
        e1 = rand(n, h, w, c)
        gate = jnp.abs(rand(n, 1, 1, c)) * 0.5
        ws = {
            "w_up": rand(2, 2, c, c) * 0.3, "b_up": rand(c) + 0.5,
            "w_d2": rand(3, 3, c, c) * 0.3, "b_d2": rand(c) + 0.5,
            "w_pair": rand(3, 3, 2 * c, cq) * 0.3, "b_pair": rand(cq) + 0.5,
            "w_blk1": rand(3, 3, cq, cq) * 0.3, "b_blk1": rand(cq) + 0.5,
        }                      # positive biases: a pad-column leak would show
        ref = self._xla_ref(x, e1, gate, ws)
        got = fused_up_dense(x, e1, 1.0 + gate[:, 0, 0, :],
                             ws["w_up"], ws["b_up"], ws["w_d2"], ws["b_d2"],
                             ws["w_pair"], ws["b_pair"], ws["w_blk1"],
                             ws["b_blk1"], tile_rows=8)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_engine_forward_all_fused(self):
        """unet_forward_packed with every fused level on == plain packed."""
        from unet_goolenet_tpu.models import UNetTaskAligWeight
        from unet_goolenet_tpu.pipeline import engine

        model = UNetTaskAligWeight(n_classes=1)
        x = jnp.asarray(RNG.standard_normal((1, 32, 32, 3)).astype(np.float32))
        v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        ref = engine.unet_forward_packed(v, x)
        got = engine.unet_forward_packed(v, x, fused_up1=True, fused_up2=True,
                                         fused_up34=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestFusedDown1:
    """fused_pool_down1 vs maxpool + the XLA conv stack."""

    @pytest.mark.parametrize("tile_rows", [8, 4, 2])
    def test_matches_xla(self, tile_rows):
        from unet_goolenet_tpu.ops import packed as P
        from unet_goolenet_tpu.ops.pallas.down1 import fused_pool_down1
        n, h2, wp, c = 2, 32, 16, 8   # packed input @32x32 logical, 8ch
        co = 2 * c
        # inc output is post-relu: keep inputs >= 0 so the zero-fill halo
        # matches the real precondition
        x1_p = jnp.abs(rand(n, h2, wp, 2 * c))
        w1, b1 = rand(3, 3, c, co) * 0.3, rand(co)
        w2, b2 = rand(3, 3, co, co) * 0.3, rand(co)
        pool = P.max_pool2x2_p_to_dense(x1_p)
        ref = jax.nn.relu(ops.conv2d(pool, w1, b1, padding=1))
        ref = jax.nn.relu(ops.conv2d(ref, w2, b2, padding=1))
        got = fused_pool_down1(x1_p, w1, b1, w2, b2, tile_rows=tile_rows)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_engine_forward_with_fused_down1(self):
        from unet_goolenet_tpu.models import UNetTaskAligWeight
        from unet_goolenet_tpu.pipeline import engine

        model = UNetTaskAligWeight(n_classes=1)
        x = jnp.asarray(RNG.standard_normal((1, 32, 32, 3)).astype(np.float32))
        v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        ref = engine.unet_forward_packed(v, x)
        got = engine.unet_forward_packed(v, x, fused_down1=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestTileGeometryGuards:
    """Unsupported level geometries must fall back to XLA — a tile smaller
    than the DMA halo makes _halo_branches compute a negative source row
    start for interior tiles (silently corrupt rows on chip, or a wedged
    worker). pick_tile enforces tile >= halo; the engine gates each fused
    level on the *_supported predicates."""

    def test_pick_tile_enforces_halo_floor(self):
        from unet_goolenet_tpu.ops.pallas import up1 as U
        # 226 rows: only 2 divides from the candidate list, and 2 < min 4
        assert U.pick_tile(226, U.UP1_TILES, min_tile=4, even=True) is None
        # a single-tile grid (tile == h) takes the whole-array branch
        assert U.pick_tile(2, U.UP1_TILES, min_tile=4, even=True) == 2
        assert U.pick_tile(224, U.UP1_TILES, min_tile=4, even=True) == 56

    def test_supported_predicates(self):
        from unet_goolenet_tpu.ops.pallas.down1 import down1_supported
        from unet_goolenet_tpu.ops.pallas.up1 import up1_supported
        from unet_goolenet_tpu.ops.pallas.up2 import up_level_supported
        assert up1_supported(224)
        assert up_level_supported(112)
        assert down1_supported(112)
        assert not up1_supported(226)        # h = 2 mod 4 -> tile 2 < halo
        assert not up1_supported(225)        # odd
        # 240 and 144 are legal UNet sizes (divisible by 16) whose up4
        # level lands on 2-mod-4 heights — the real-world trap
        assert not up_level_supported(30)    # 240 // 8
        assert not up_level_supported(18)    # 144 // 8
        assert not down1_supported(113)

    def test_launchers_raise_clear_errors(self):
        from unet_goolenet_tpu.ops.pallas.down1 import fused_pool_down1
        from unet_goolenet_tpu.ops.pallas.up1 import fused_up1_outc
        c = 8
        x_p = rand(1, 13, 4, 2 * c)          # up1 level h = 26: no tile
        e1_p = rand(1, 26, 8, 2 * c)
        args = (x_p, e1_p, jnp.ones((1, 2 * c)),
                rand(2, 2, c, c), rand(c), rand(3, 3, c, c), rand(c),
                rand(3, 3, 2 * c, c), rand(c), rand(3, 3, c, c), rand(c),
                rand(c, 1), rand(1))
        with pytest.raises(ValueError, match="no valid row tile"):
            fused_up1_outc(*args)
        with pytest.raises(ValueError, match="no valid row tile"):
            fused_up1_outc(*args, tile_rows=2)   # explicit tile < halo
        xd = rand(1, 2 * 13, 4, 2 * c)       # pooled h = 13: odd
        with pytest.raises(ValueError, match="no valid row tile"):
            fused_pool_down1(xd, rand(3, 3, c, 2 * c), rand(2 * c),
                             rand(3, 3, 2 * c, 2 * c), rand(2 * c))

    def test_engine_falls_back_on_unsupported_level(self):
        """img 48: the up4 level lands on h=6 (tile 2 < halo) so fused_up34
        must silently fall back to XLA while up1/up2/down1 stay fused —
        output identical to the plain packed forward."""
        from unet_goolenet_tpu.models import UNetTaskAligWeight
        from unet_goolenet_tpu.pipeline import engine

        model = UNetTaskAligWeight(n_classes=1)
        x = jnp.asarray(RNG.standard_normal((1, 48, 48, 3)).astype(np.float32))
        v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        ref = engine.unet_forward_packed(v, x)
        got = engine.unet_forward_packed(v, x, fused_up1=True, fused_up2=True,
                                         fused_up34=True, fused_down1=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
