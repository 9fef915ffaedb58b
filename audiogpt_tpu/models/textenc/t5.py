"""T5 v1.1 text encoder (flax), weight-compatible with HF ``T5EncoderModel``.

The reference's T5/FLAN conditioner variants
(``ldm/modules/encoders/modules.py:143`` ``FrozenT5Embedder``
(google/t5-v1_1-large) and ``:287`` ``FrozenFLANEmbedder``
(google/flan-t5-large)) wrap ``T5EncoderModel`` and return
``last_hidden_state`` as the cross-attention context. Both checkpoints are
the v1.1 architecture: RMSNorm (no mean subtraction, no bias), pre-norm
residual blocks, NO absolute position embeddings — a learned relative
position bias shared from layer 0 — gated-GELU feed-forward, and unscaled
dot-product attention (the 1/sqrt(d) factor is folded into initialization).

Tokenization: the SentencePiece model ships with the user's checkpoint, not
this image; pass pre-tokenized ids (any callable ``text → ids`` works,
``T5Conditioner.tokenizer``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 1024          # t5-v1_1-large / flan-t5-large
    d_kv: int = 64
    d_ff: int = 2816
    num_layers: int = 24
    num_heads: int = 16
    rel_buckets: int = 32
    rel_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    feed_forward: str = "gated-gelu"   # v1.1 / FLAN; "relu" = original t5

    @staticmethod
    def flan_t5_large() -> "T5Config":
        return T5Config()

    @staticmethod
    def t5_v1_1_large() -> "T5Config":
        return T5Config()


class T5LayerNorm(nn.Module):
    """RMS norm: x * w / sqrt(mean(x^2) + eps); stats in f32."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * w


def relative_position_bucket(rel_pos: np.ndarray, num_buckets: int = 32,
                             max_distance: int = 128) -> np.ndarray:
    """HF ``_relative_position_bucket`` (bidirectional): half the buckets
    for each sign, half of those exact, the rest log-spaced."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(np.int64) * num_buckets
    n = np.abs(rel_pos)
    max_exact = num_buckets // 2
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    return ret + np.where(n < max_exact, n, val_if_large)


class T5Attention(nn.Module):
    cfg: T5Config
    has_bias: bool = False       # only layer 0 owns the bias table

    @nn.compact
    def __call__(self, x, mask, pos_bias):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        split = lambda t: t.reshape(t.shape[0], t.shape[1], cfg.num_heads,
                                    cfg.d_kv).transpose(0, 2, 1, 3)
        q = split(nn.Dense(inner, use_bias=False, name="q")(x))
        k = split(nn.Dense(inner, use_bias=False, name="k")(x))
        v = split(nn.Dense(inner, use_bias=False, name="v")(x))
        if self.has_bias:
            L = x.shape[1]
            table = self.param(
                "rel_bias", nn.initializers.normal(0.02),
                (cfg.rel_buckets, cfg.num_heads))
            pos = np.arange(L)
            buckets = relative_position_bucket(
                pos[None, :] - pos[:, None], cfg.rel_buckets,
                cfg.rel_max_distance)                       # [L, L]
            pos_bias = table[jnp.asarray(buckets)].transpose(2, 0, 1)[None]
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)        # NO 1/sqrt(d)
        scores = scores + pos_bias
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :] > 0, scores, -1e9)
        att = jax.nn.softmax(scores.astype(jnp.float32), axis=-1
                             ).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v).transpose(0, 2, 1, 3)
        out = out.reshape(x.shape[0], x.shape[1], inner)
        return nn.Dense(cfg.d_model, use_bias=False, name="o")(out), pos_bias


class T5Block(nn.Module):
    cfg: T5Config
    has_bias: bool = False

    @nn.compact
    def __call__(self, x, mask, pos_bias):
        cfg = self.cfg
        h = T5LayerNorm(cfg.layer_norm_eps, name="attn_ln")(x)
        att, pos_bias = T5Attention(cfg, has_bias=self.has_bias,
                                    name="attn")(h, mask, pos_bias)
        x = x + att
        h = T5LayerNorm(cfg.layer_norm_eps, name="ff_ln")(x)
        if cfg.feed_forward == "gated-gelu":
            gate = jax.nn.gelu(
                nn.Dense(cfg.d_ff, use_bias=False, name="wi_0")(h),
                approximate=True)                 # HF NewGELUActivation
            h = gate * nn.Dense(cfg.d_ff, use_bias=False, name="wi_1")(h)
        else:
            h = jax.nn.relu(nn.Dense(cfg.d_ff, use_bias=False, name="wi")(h))
        x = x + nn.Dense(cfg.d_model, use_bias=False, name="wo")(h)
        return x, pos_bias


class T5Encoder(nn.Module):
    """tokens [B, L] (+ attention_mask) → last_hidden_state [B, L, D]."""

    cfg: T5Config

    @nn.compact
    def __call__(self, tokens, attention_mask=None):
        cfg = self.cfg
        x = nn.Embed(cfg.vocab_size, cfg.d_model, name="embed")(tokens)
        pos_bias = None
        for i in range(cfg.num_layers):
            x, pos_bias = T5Block(cfg, has_bias=(i == 0),
                                  name=f"block_{i}")(x, attention_mask,
                                                     pos_bias)
        return T5LayerNorm(cfg.layer_norm_eps, name="final_ln")(x)


class T5Conditioner:
    """``FrozenT5Embedder``/``FrozenFLANEmbedder`` equivalent: texts →
    padded ids (via a pluggable tokenizer callable) → last_hidden_state.
    Construct once; the jitted encode compiles once per bucket."""

    def __init__(self, cfg: T5Config | None = None, params=None,
                 tokenizer=None, max_length: int = 77, pad_id: int = 0,
                 eos_id: int = 1):
        import functools

        self.cfg = cfg or T5Config()
        self.model = T5Encoder(self.cfg)
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.pad_id, self.eos_id = pad_id, eos_id
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
        self.params = params
        self._fn = functools.lru_cache(maxsize=None)(
            lambda: jax.jit(lambda p, ids, m: self.model.apply(p, ids, m)))

    def encode(self, texts: list[str]) -> jnp.ndarray:
        if self.tokenizer is None:
            raise RuntimeError(
                "no tokenizer attached — the T5 SentencePiece model ships "
                "with the checkpoint; pass tokenizer=callable(text)->ids")
        ids = np.full((len(texts), self.max_length), self.pad_id, np.int32)
        mask = np.zeros_like(ids)
        for i, t in enumerate(texts):
            toks = list(self.tokenizer(t))[: self.max_length - 1] + \
                [self.eos_id]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return self._fn()(self.params, jnp.asarray(ids), jnp.asarray(mask))
