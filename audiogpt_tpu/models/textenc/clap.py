"""CLAP text-side conditioning + WordPiece tokenizer.

``FrozenCLAPEmbedder`` (``ldm/modules/encoders/modules.py:173``) =
bert-base-uncased last_hidden_state → per-token ``Projection`` (768→1024,
``CLAP/clap.py:8``). The T2A/I2A/inpaint UNets cross-attend to the projected
sequence ([B, 77, 1024]); CLAP retrieval scoring (best-of-n re-ranking,
``audio-chatgpt.py:185-199``) uses the CLS projection instead.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audiogpt_tpu.models.textenc.bert import BertConfig, BertEncoder


@dataclasses.dataclass(frozen=True)
class CLAPTextConfig:
    bert: BertConfig = BertConfig()
    d_proj: int = 1024
    max_length: int = 77


class Projection(nn.Module):
    d_out: int

    @nn.compact
    def __call__(self, x):
        e1 = nn.Dense(self.d_out, use_bias=False, name="linear1")(x)
        e2 = nn.Dense(self.d_out, use_bias=False, name="linear2")(
            jax.nn.gelu(e1, approximate=False))
        return nn.LayerNorm(epsilon=1e-5, name="ln")(e1 + e2)


class CLAPTextEncoder(nn.Module):
    cfg: CLAPTextConfig

    def setup(self):
        self.base = BertEncoder(self.cfg.bert, name="base")
        self.projection = Projection(self.cfg.d_proj, name="projection")

    def __call__(self, tokens, attention_mask=None):
        """→ per-token context [B, L, d_proj] (the LDM conditioning)."""
        hidden = self.base(tokens, attention_mask)
        return self.projection(hidden)

    def cls_embedding(self, tokens, attention_mask=None):
        """→ [B, d_proj] CLS projection (CLAP similarity space)."""
        hidden = self.base(tokens, attention_mask)
        return self.projection(hidden[:, 0])


# ---------------------------------------------------------------------------
# Minimal WordPiece tokenizer (BERT-uncased scheme, vocab from file)
# ---------------------------------------------------------------------------


class WordPieceTokenizer:
    """Loads a BERT ``vocab.txt``. Without one, falls back to a hash-bucket
    tokenizer so pipelines run end-to-end (useless linguistically, harmless
    for shape/flow tests)."""

    CLS, SEP, PAD, UNK = "[CLS]", "[SEP]", "[PAD]", "[UNK]"

    def __init__(self, vocab_path: str | None = None, vocab_size: int = 30522):
        self.vocab: dict[str, int] = {}
        self.vocab_size = vocab_size
        if vocab_path:
            with open(vocab_path, encoding="utf-8") as f:
                for i, line in enumerate(f):
                    self.vocab[line.rstrip("\n")] = i
            self.vocab_size = len(self.vocab)

    def _wordpiece(self, word: str) -> list[str]:
        if word in self.vocab:
            return [word]
        out, start = [], 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [self.UNK]
            out.append(cur)
            start = end
        return out

    def encode(self, text: str, max_length: int = 77) -> tuple[np.ndarray, np.ndarray]:
        """→ (ids [max_length], attention_mask [max_length])."""
        import re

        words = re.findall(r"[a-z0-9]+|[^\sa-z0-9]", text.lower())
        if self.vocab:
            toks = [self.vocab.get(self.CLS, 101)]
            for w in words:
                toks += [self.vocab.get(t, self.vocab.get(self.UNK, 100))
                         for t in self._wordpiece(w)]
            toks.append(self.vocab.get(self.SEP, 102))
        else:
            lo = min(1000, self.vocab_size // 4)
            span = max(1, self.vocab_size - lo - 3)
            toks = [101 % self.vocab_size] + [
                lo + hash(w) % span for w in words] + [102 % self.vocab_size]
        toks = toks[:max_length]
        mask = [1] * len(toks)
        pad = max_length - len(toks)
        return (np.asarray(toks + [0] * pad, np.int32),
                np.asarray(mask + [0] * pad, np.int32))
