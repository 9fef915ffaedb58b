"""BERT text encoder (flax), weight-compatible with HF ``BertModel``.

The conditioning tower for CLAP (``ldm/modules/encoders/CLAP/clap.py:42``
``TextEncoder.base = bert-base-uncased``) and the text branch of LASSNet
(``sound_extraction/model/text_encoder.py``). Post-LN architecture.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from audiogpt_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        d, h = cfg.hidden_size, cfg.num_heads
        split = lambda t: t.reshape(t.shape[0], t.shape[1], h, d // h)
        q = nn.Dense(d, name="q")(x)
        k = nn.Dense(d, name="k")(x)
        v = nn.Dense(d, name="v")(x)
        att = attention(split(q), split(k), split(v), mask=mask)
        att = nn.Dense(d, name="attn_out")(att.reshape(x.shape))
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attn_ln")(x + att)
        inter = jax.nn.gelu(nn.Dense(cfg.intermediate_size, name="inter")(x),
                            approximate=False)
        out = nn.Dense(d, name="out")(inter)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="out_ln")(x + out)


class BertEncoder(nn.Module):
    """tokens [B, L] (+ attention_mask) → last_hidden_state [B, L, H]."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, tokens, attention_mask=None, token_type_ids=None):
        cfg = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones_like(tokens)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(tokens)
        pos = jnp.arange(tokens.shape[1])[None]
        x = (
            nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_emb")(tokens)
            + nn.Embed(cfg.max_position, cfg.hidden_size, name="pos_emb")(pos)
            + nn.Embed(cfg.type_vocab_size, cfg.hidden_size, name="type_emb")(token_type_ids)
        )
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="emb_ln")(x)
        mask = attention_mask[:, None, None, :] > 0
        for i in range(cfg.num_layers):
            x = BertLayer(cfg, name=f"layer_{i}")(x, mask)
        return x
