"""Shared network building blocks (Flax, channel-last, mask-aware).

Covers the reference's `build_mlp` conv-norm-act stacks (reference:
network/encoder/utils.py:358-413), torch `nn.MultiheadAttention` (used at
network/decoder/descriptor_attention.py:14-15), and the sine positional
embedding (reference: network/decoder/descriptor_attention.py:54-83).

Channel-last design note: a torch Conv1d(kernel_size=1) over (B, C, N) is
exactly a Dense over (B, N, C); LayerNorm1d's transpose dance (reference:
network/encoder/utils.py:392-401) collapses to a plain LayerNorm here. This
keeps the innermost dimension contiguous for the MXU.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class MLP(nn.Module):
    """Dense-LayerNorm-ReLU stack == reference `build_mlp(norm='ln')`.

    Operates on (..., C) arrays; works for both the reference's dim=1 (B,C,N)
    and dim=2 (B,C,K,S) cases since LayerNorm/Dense act on the last axis.
    """

    channels: Sequence[int]
    bias: bool = True
    drop_last_act: bool = False
    #: activation/compute dtype ("float32" | "bfloat16"). Params stay
    #: f32 (param_dtype default); bf16 halves the HBM traffic of the
    #: activations between layers -- the AMP analog of the reference's
    #: autocast (reference: pipeline/modules/trainer.py:45-48).
    act_dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        n = len(self.channels)
        dt = jnp.dtype(self.act_dtype)
        for i, ch in enumerate(self.channels):
            x = nn.Dense(ch, use_bias=self.bias, dtype=dt,
                         name=f"dense{i}")(x)
            x = nn.LayerNorm(dtype=dt, name=f"norm{i}")(x)
            if not (self.drop_last_act and i == n - 1):
                x = jax.nn.relu(x)
        return x


class MultiHeadAttention(nn.Module):
    """Multi-head attention matching torch ``nn.MultiheadAttention``.

    Packed in-projection (one (C, 3C) matrix, q|k|v order) so torch
    state-dicts map 1:1. `key_valid` (B, N_k) masks attention logits;
    callers guarantee at least one valid key per row (true for every call
    site: scans always contain >= 1 real point).
    """

    emb_dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, q, k, v, key_valid=None):
        b, n_q, c = q.shape
        n_k = k.shape[1]
        h = self.num_heads
        d = c // h
        qkv_w = self.param("in_proj_kernel", nn.initializers.xavier_uniform(),
                           (c, 3 * c))
        qkv_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * c,))
        q_p = jnp.dot(q, qkv_w[:, :c], preferred_element_type=jnp.float32) + qkv_b[:c]
        k_p = jnp.dot(k, qkv_w[:, c:2 * c], preferred_element_type=jnp.float32) + qkv_b[c:2 * c]
        v_p = jnp.dot(v, qkv_w[:, 2 * c:], preferred_element_type=jnp.float32) + qkv_b[2 * c:]

        q_p = q_p.reshape(b, n_q, h, d).transpose(0, 2, 1, 3)  # (B,H,Nq,d)
        k_p = k_p.reshape(b, n_k, h, d).transpose(0, 2, 1, 3)
        v_p = v_p.reshape(b, n_k, h, d).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhqd,bhkd->bhqk", q_p, k_p,
                            preferred_element_type=jnp.float32) / math.sqrt(d)
        if key_valid is not None:
            logits = jnp.where(key_valid[:, None, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v_p,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, n_q, c)
        out = nn.Dense(c, use_bias=True, name="out_proj")(out)
        return out


def sine_pos_embedding(xyz: jnp.ndarray, emb_dim: int,
                       temperature: float = 10000.0,
                       scale: float = math.pi) -> jnp.ndarray:
    """Sine/cos positional embedding of coordinates.

    xyz (B, N, 3) -> (B, N, emb_dim). Parameter-free; mirrors the reference
    `PositionEmbeddingCoordsSine.forward` (reference: network/decoder/
    descriptor_attention.py:66-83) including the zero-padding of the
    emb_dim % (3*2) leftover channels.
    """
    in_dim = xyz.shape[-1]
    num_feats = emb_dim // in_dim // 2 * 2
    pad = emb_dim - num_feats * in_dim

    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_feats)

    pos = xyz.astype(jnp.float32) * scale
    pos_div = pos[..., None] / dim_t          # (B, N, 3, num_feats)
    pos_sin = jnp.sin(pos_div[..., 0::2])
    pos_cos = jnp.cos(pos_div[..., 1::2])
    emb = jnp.stack([pos_sin, pos_cos], axis=-1)  # (B, N, 3, nf/2, 2)
    emb = emb.reshape(*xyz.shape[:-1], num_feats * in_dim)
    if pad:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, pad)])
    return emb
