"""Relative-window-position transformer encoder — the reference's
``RelTransformerEncoder`` (``NeuralSeq/modules/commons/rel_transformer.py``:
Encoder:29, MultiHeadAttention:86 with learned relative key/value embeddings
over a ±window, ConvReluNorm prenet:286, conv FFN:240). It is the text
encoder behind PortaSpeech/SyntaSpeech (``encoder_type: rel_fft``,
egs/egs_bases/tts/ps.yaml) and GenerSpeech.

TPU re-design of the relative-position term: the reference converts between
relative and absolute indexing with pad/reshape shifting tricks
(``_relative_position_to_absolute_position``, rel_transformer.py:200) that
exist to avoid dynamic slicing. Under jit every shape is static, so we
instead materialize the clipped relative-index matrix once and gather the
relative embeddings into a ``[T, T, d]`` table — two einsums on the MXU,
no shifting:

    idx[i, j] = clip(j - i, -w, w) + w
    scores   += einsum('bhid,ijd->bhij', q, emb_k[idx]) / sqrt(d)
    out      += einsum('bhij,ijd->bhid', attn, emb_v[idx])
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


class ChannelLayerNorm(nn.Module):
    """The reference's LayerNorm over channels with eps 1e-4
    (rel_transformer.py:265)."""

    eps: float = 1e-4

    @nn.compact
    def __call__(self, x):
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean) ** 2).mean(-1, keepdims=True)
        h = (x - mean) * jax.lax.rsqrt(var + self.eps)
        gamma = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
        beta = self.param("beta", nn.initializers.zeros, (x.shape[-1],))
        return h * gamma + beta


class RelWindowAttention(nn.Module):
    """Self-attention with learned relative key/value embeddings clipped to
    ±``window`` (MultiHeadAttention, rel_transformer.py:86; heads_share)."""

    dim: int
    heads: int
    window: int = 4

    @nn.compact
    def __call__(self, x, nonpad):
        d = self.dim
        h = self.heads
        dk = d // h
        t = x.shape[1]
        q = nn.Dense(d, name="conv_q")(x)
        k = nn.Dense(d, name="conv_k")(x)
        v = nn.Dense(d, name="conv_v")(x)
        split = lambda a: a.reshape(a.shape[0], t, h, dk).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)          # [B, H, T, dk]

        rel_init = nn.initializers.normal(dk ** -0.5)
        emb_k = self.param("emb_rel_k", rel_init, (2 * self.window + 1, dk))
        emb_v = self.param("emb_rel_v", rel_init, (2 * self.window + 1, dk))
        pos = jnp.arange(t)
        idx = jnp.clip(pos[None, :] - pos[:, None],
                       -self.window, self.window) + self.window  # [T, T]

        scores = jnp.einsum("bhid,bhjd->bhij", q, k) / math.sqrt(dk)
        scores = scores + jnp.einsum("bhid,ijd->bhij", q,
                                     emb_k[idx]) / math.sqrt(dk)
        mask = (nonpad[:, None, None, :] * nonpad[:, None, :, None]) > 0
        scores = jnp.where(mask, scores, -1e4)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out + jnp.einsum("bhij,ijd->bhid", attn, emb_v[idx])
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], t, d)
        return nn.Dense(d, name="conv_o")(out)


class ConvFFN(nn.Module):
    """conv(k) → relu → conv(1), masked between (FFN, rel_transformer.py:240)."""

    dim: int
    filter_dim: int
    kernel: int

    @nn.compact
    def __call__(self, x, nonpad):
        m = nonpad[..., None]
        x = nn.Conv(self.filter_dim, (self.kernel,), padding="SAME",
                    name="conv_1")(x * m)
        x = jax.nn.relu(x)
        x = nn.Dense(self.dim, name="conv_2")(x * m)
        return x * m


class ConvReluNorm(nn.Module):
    """Zero-init residual conv prenet (rel_transformer.py:286)."""

    dim: int
    layers: int = 3
    kernel: int = 5

    @nn.compact
    def __call__(self, x, nonpad):
        m = nonpad[..., None]
        h = x
        for i in range(self.layers):
            h = nn.Conv(self.dim, (self.kernel,), padding="SAME",
                        name=f"conv_{i}")(h * m)
            h = ChannelLayerNorm(name=f"norm_{i}")(h)
            h = jax.nn.relu(h)
        h = nn.Dense(self.dim, name="proj",
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros)(h)
        return (x + h) * m


class RelTransformerEncoder(nn.Module):
    """Embedding (optional) → prenet → n×(pre-LN attn + pre-LN conv-FFN) →
    final LN (RelTransformerEncoder, rel_transformer.py:321; pre_ln=True,
    window_size=4 defaults as used by ps.yaml)."""

    vocab_size: int = 0          # 0 → caller passes embeddings
    dim: int = 192
    filter_dim: int = 768
    heads: int = 2
    layers: int = 4
    kernel: int = 5
    window: int = 4
    prenet: bool = True

    @nn.compact
    def __call__(self, x, nonpad=None):
        if self.vocab_size > 0:
            tokens = x
            nonpad = (tokens > 0).astype(jnp.float32)
            x = nn.Embed(self.vocab_size, self.dim, name="emb")(tokens)
            x = x * math.sqrt(self.dim)
        elif nonpad is None:
            nonpad = (jnp.abs(x).sum(-1) > 0).astype(jnp.float32)
        m = nonpad[..., None]
        if self.prenet:
            x = ConvReluNorm(self.dim, name="pre")(x, nonpad)
        for i in range(self.layers):
            x = x * m
            h = ChannelLayerNorm(name=f"ln1_{i}")(x)
            x = x + RelWindowAttention(self.dim, self.heads, self.window,
                                       name=f"attn_{i}")(h, nonpad)
            h = ChannelLayerNorm(name=f"ln2_{i}")(x)
            x = x + ConvFFN(self.dim, self.filter_dim, self.kernel,
                            name=f"ffn_{i}")(h, nonpad)
        x = ChannelLayerNorm(name=f"last_ln")(x)
        return x * m
