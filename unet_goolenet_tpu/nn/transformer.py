"""Dual-stream transformer bottleneck (reference: 分割/nets/tasks.py).

Operates at the UNet bottleneck (14x14 spatial, 512 channels -> 196 tokens). Two
streams ("cl" and "seg") each get a Conv2dReLU projection and a learned 2D positional
embedding, then `depth` MultiAttention blocks: per-stream self-attention plus
bidirectional cross-attention, pre-LN, residual, per-stream MLPs.

Reference quirks preserved (they are baked into any trained checkpoint):
  * attention scale is dim**-0.5, NOT dim_head**-0.5 (tasks.py:63,126) — with
    dim=512, dim_head=64 this under-scales logits by sqrt(8);
  * BOTH cross-attention directions share `cross_attention_cl`'s weights; the
    declared `cross_attention_seg` is never called (tasks.py:174-175). We do not
    declare the dead module; the converter drops its parameters.

TPU notes: attention is fused einsums over (B, heads, 196, 64) — small enough that
XLA keeps everything resident in VMEM; no flash-attention needed at n=196.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from unet_goolenet_tpu.nn.init import torch_linear_init, torch_bias_init
from unet_goolenet_tpu.nn.blocks import TorchConv

Dtype = Any


def _dense(features: int, in_features: int, use_bias: bool, dtype, name: str):
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=torch_linear_init,
        bias_init=torch_bias_init(in_features),
        dtype=dtype,
        name=name,
    )


class FeedForward(nn.Module):
    """Linear -> GELU -> Dropout -> Linear -> Dropout (tasks.py:46-57)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = _dense(self.hidden_dim, self.dim, True, self.dtype, "fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = _dense(self.dim, self.hidden_dim, True, self.dtype, "fc2")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


def _attend(q, k, v, scale, heads):
    """(B,N,H*D) qkv -> (B,N,H*D) attention output, f32 softmax."""
    b, n, hd = q.shape
    d = hd // heads

    def split(t):
        return t.reshape(b, n, heads, d).transpose(0, 2, 1, 3)  # (B,H,N,D)

    q, k, v = split(q), split(k), split(v)
    logits = jnp.einsum("bhid,bhjd->bhij", q, k,
                        preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, n, hd)


class SelfAttention(nn.Module):
    """Fused-QKV multi-head self-attention (tasks.py:121-148)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        inner = self.heads * self.dim_head
        qkv = _dense(inner * 3, self.dim, False, self.dtype, "to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = _attend(q, k, v, self.dim ** -0.5, self.heads)
        out = _dense(self.dim, inner, True, self.dtype, "to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class CrossAttention(nn.Module):
    """Q from x, K/V from memory m (tasks.py:58-97)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    softmax: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, m: jax.Array, *, train: bool = False) -> jax.Array:
        inner = self.heads * self.dim_head
        q = _dense(inner, self.dim, False, self.dtype, "to_q")(x)
        k = _dense(inner, self.dim, False, self.dtype, "to_k")(m)
        v = _dense(inner, self.dim, False, self.dtype, "to_v")(m)
        if self.softmax:
            out = _attend(q, k, v, self.dim ** -0.5, self.heads)
        else:
            # raw-logit variant (softmax=False path, tasks.py:89-90)
            b, n, hd = q.shape
            d = hd // self.heads
            qh = q.reshape(b, n, self.heads, d).transpose(0, 2, 1, 3)
            kh = k.reshape(b, -1, self.heads, d).transpose(0, 2, 1, 3)
            vh = v.reshape(b, -1, self.heads, d).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhid,bhjd->bhij", qh, kh,
                                preferred_element_type=jnp.float32) * self.dim ** -0.5
            out = jnp.einsum("bhij,bhjd->bhid", logits.astype(vh.dtype), vh,
                             preferred_element_type=jnp.float32).astype(vh.dtype)
            out = out.transpose(0, 2, 1, 3).reshape(b, n, hd)
        out = _dense(self.dim, inner, True, self.dtype, "to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class MultiAttention(nn.Module):
    """One dual-stream block (tasks.py:149-184): pre-LN self + shared-weight
    bidirectional cross attention, residual, then per-stream pre-LN MLPs."""

    dim: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    softmax: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, m: jax.Array, *, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        x_n = ln("x_att_norm")(x)
        m_n = ln("m_att_norm")(m)
        x_att = SelfAttention(self.dim, self.heads, self.dim_head, 0.0,
                              dtype=self.dtype, name="attention1")(x_n, train=train)
        m_att = SelfAttention(self.dim, self.heads, self.dim_head, self.dropout,
                              dtype=self.dtype, name="attention2")(m_n, train=train)
        cross = CrossAttention(self.dim, self.heads, self.dim_head, self.dropout,
                               self.softmax, dtype=self.dtype,
                               name="cross_attention_cl")
        x_cross = cross(x_n, m_n, train=train)
        m_cross = cross(m_n, x_n, train=train)  # same weights both directions (quirk)
        x_mid = x_att + x_cross + x
        m_mid = m_att + m_cross + m
        x_out = x_mid + FeedForward(self.dim, self.mlp_dim, self.dropout,
                                    dtype=self.dtype, name="x_feed")(
            ln("x_mlp_norm")(x_mid), train=train)
        m_out = m_mid + FeedForward(self.dim, self.mlp_dim, self.dropout,
                                    dtype=self.dtype, name="m_feed")(
            ln("m_mlp_norm")(m_mid), train=train)
        return x_out, m_out


class TransformerDecoder(nn.Module):
    """The full bottleneck (tasks.py:188-231): per-stream Conv2dReLU + learned 2D
    positional embedding, tokens, `depth` MultiAttention blocks, back to NHWC."""

    dim: int
    depth: int = 1
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 2048
    dropout: float = 0.0
    pos_size: int = 14
    softmax: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, m: jax.Array, *, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        n, h, w, c = x.shape

        def conv_proj(t, name):
            t = TorchConv(self.dim, (3, 3), padding=1, use_bias=False,
                          dtype=self.dtype, name=f"{name}_conv")(t)
            t = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name=f"{name}_bn")(t)
            return jax.nn.relu(t)

        x = conv_proj(x, "conv_cl")
        m = conv_proj(m, "conv_seg")
        # positional embeddings stored NHWC (1, P, P, C); zero-init like the reference
        pos_cl = self.param("pos_embedding_cl", nn.initializers.zeros,
                            (1, self.pos_size, self.pos_size, self.dim))
        pos_seg = self.param("pos_embedding_seg", nn.initializers.zeros,
                             (1, self.pos_size, self.pos_size, self.dim))
        x = x + pos_cl.astype(x.dtype)
        m = m + pos_seg.astype(m.dtype)
        x = x.reshape(n, h * w, self.dim)
        m = m.reshape(n, h * w, self.dim)
        for i in range(self.depth):
            x, m = MultiAttention(self.dim, self.heads, self.dim_head, self.mlp_dim,
                                  self.dropout, self.softmax, dtype=self.dtype,
                                  name=f"layer{i}")(x, m, train=train)
        return x.reshape(n, h, w, self.dim), m.reshape(n, h, w, self.dim)
