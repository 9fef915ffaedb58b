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


def bundled_wordpiece_path() -> str | None:
    """Path of the bundled derived WordPiece vocab, or None if absent."""
    import os

    p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))),
        "text", "data", "wordpiece_en.txt.gz")
    return p if os.path.exists(p) else None


def _open_vocab(path: str):
    """Iterate vocab lines from a plain or gzipped vocab.txt."""
    import gzip

    if path.endswith(".gz"):
        with gzip.open(path, "rt", encoding="utf-8") as f:
            yield from f
    else:
        with open(path, encoding="utf-8") as f:
            yield from f


class WordPieceTokenizer:
    """Loads a BERT ``vocab.txt`` (plain or ``.gz``).

    Without an explicit path, the BUNDLED derived English vocab
    (``text/data/wordpiece_en.txt.gz`` — 30,522 entries generated from the
    in-tree CLIP BPE data by ``tools/build_wordpiece_vocab.py``; special ids
    match bert-base-uncased: [PAD]=0, [UNK]=100, [CLS]=101, [SEP]=102) loads
    when it fits the model's embedding table, so the CLAP/BLIP/LASSNet
    towers tokenize linguistically out of the box. Token ids do NOT match
    Google's bert-base-uncased mapping — imported checkpoints trained on the
    HF vocab must wire the original ``vocab.txt`` (``--vocab``); models
    trained in this framework are coherent with the bundled one. Only when
    no vocab fits (tiny test configs) does it fall back to hash-bucket ids
    (loud warning, linguistically void)."""

    CLS, SEP, PAD, UNK = "[CLS]", "[SEP]", "[PAD]", "[UNK]"

    def __init__(self, vocab_path: str | None = None, vocab_size: int = 30522):
        self.vocab: dict[str, int] = {}
        self.vocab_size = vocab_size
        self._warned = False
        self.derived = False
        if vocab_path is None:
            bundled = bundled_wordpiece_path()
            if bundled is not None:
                n = sum(1 for _ in _open_vocab(bundled))
                if n <= vocab_size:  # must fit the embedding table
                    vocab_path = bundled
                    self.derived = True
        if vocab_path:
            for i, line in enumerate(_open_vocab(vocab_path)):
                self.vocab[line.rstrip("\n")] = i
            self.vocab_size = len(self.vocab)

    def _warn_no_vocab(self):
        if not self._warned:
            self._warned = True
            from audiogpt_tpu.text.bpe import warn_fallback

            warn_fallback(
                "WordPieceTokenizer",
                "no vocab.txt loaded: hash-bucket token ids / <id> "
                "placeholder decode")

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
            self._warn_no_vocab()
            lo = min(1000, self.vocab_size // 4)
            span = max(1, self.vocab_size - lo - 3)
            toks = [101 % self.vocab_size] + [
                lo + hash(w) % span for w in words] + [102 % self.vocab_size]
        toks = toks[:max_length]
        mask = [1] * len(toks)
        pad = max_length - len(toks)
        return (np.asarray(toks + [0] * pad, np.int32),
                np.asarray(mask + [0] * pad, np.int32))

    def decode(self, ids) -> str:
        """ids → text: skip specials, merge ``##`` word pieces (BERT
        ``convert_tokens_to_string`` semantics). Without a vocab, emits
        ``<id>`` placeholders (shape/flow testing)."""
        if not self.vocab:
            self._warn_no_vocab()
            return " ".join(f"<{int(i)}>" for i in ids)
        inv = getattr(self, "_inv", None)
        if inv is None:
            inv = self._inv = {v: k for k, v in self.vocab.items()}
        words: list[str] = []
        special = {self.CLS, self.SEP, self.PAD, "[MASK]"}
        for i in ids:
            t = inv.get(int(i), self.UNK)
            if t in special or t.startswith("[unused"):
                continue
            if t.startswith("##") and words:
                words[-1] += t[2:]
            else:
                words.append(t)
        return " ".join(words)


# ---------------------------------------------------------------------------
# CLAP audio tower + retrieval scorer (best-of-n re-ranking)
# ---------------------------------------------------------------------------


class CLAPAudioEncoder(nn.Module):
    """PANN(Cnn14)-tower CLAP audio branch (``open_clap/pann_model.py`` —
    the reference ships both HTSAT and PANN towers; the PANN one reuses our
    shared Cnn14 backbone) → projected ``[B, d_proj]`` embedding."""

    d_proj: int = 1024
    cnn14: object | None = None  # Cnn14Config override; None = ckpt layout

    @nn.compact
    def __call__(self, wav, wav_len=None):
        from audiogpt_tpu.models.caption.cnn14 import Cnn14Config, Cnn14Encoder

        if self.cnn14 is not None and not isinstance(self.cnn14, Cnn14Config):
            raise TypeError(
                f"CLAPAudioEncoder.cnn14 must be a Cnn14Config (got "
                f"{type(self.cnn14).__name__}) — an HTSATConfig goes with "
                f"audio_tower='htsat'")
        cfg = self.cnn14 if self.cnn14 is not None else Cnn14Config()
        enc = Cnn14Encoder(cfg, name="backbone")(wav, wav_len)
        return Projection(self.d_proj, name="projection")(enc["fc_emb"])


class CLAPScorer:
    """text ↔ audio cosine similarity — the reference's ``CLAPWrapper``
    (``wav_evaluation/models/CLAPWrapper.py:208``), constructed ONCE instead
    of per call (``audio-chatgpt.py:187`` reloads it every request)."""

    def __init__(self, text_cfg: CLAPTextConfig | None = None,
                 text_params=None, audio_params=None, tokenizer=None,
                 sample_rate: int = 32000, audio_tower: str = "pann",
                 audio_cfg=None, rng_seed: int = 0):
        """``audio_tower``: 'pann' (Cnn14) or 'htsat' (Swin-audio) — the two
        towers the reference's open_clap factory selects between.
        ``audio_cfg``: optional tower-config override — an HTSATConfig for
        'htsat' (defaults to the HTSAT-tiny checkpoint layout with ``d_proj``
        from the text cfg) or a Cnn14Config for 'pann' (defaults to the PANN
        checkpoint layout; narrow configs come from tools/train_tiny_clap.py
        artifacts)."""
        self.cfg = text_cfg or CLAPTextConfig()
        self.text = CLAPTextEncoder(self.cfg)
        if audio_tower == "htsat":
            import dataclasses as _dc

            from audiogpt_tpu.models.textenc.htsat import (
                HTSATAudioEncoder, HTSATConfig,
            )

            if audio_cfg is None:
                audio_cfg = HTSATConfig(d_proj=self.cfg.d_proj)
            elif not isinstance(audio_cfg, HTSATConfig):
                raise TypeError(
                    f"audio_tower='htsat' takes an HTSATConfig audio_cfg "
                    f"(got {type(audio_cfg).__name__})")
            elif audio_cfg.d_proj != self.cfg.d_proj:
                audio_cfg = _dc.replace(audio_cfg, d_proj=self.cfg.d_proj)
            self.audio = HTSATAudioEncoder(audio_cfg)
        else:
            from audiogpt_tpu.models.caption.cnn14 import Cnn14Config

            if audio_cfg is not None and not isinstance(audio_cfg,
                                                        Cnn14Config):
                raise TypeError(
                    f"audio_tower='pann' takes a Cnn14Config audio_cfg "
                    f"(got {type(audio_cfg).__name__}) — pass "
                    f"audio_tower='htsat' for an HTSATConfig")
            self.audio = CLAPAudioEncoder(self.cfg.d_proj, cnn14=audio_cfg)
        self.tokenizer = tokenizer or WordPieceTokenizer(
            vocab_size=self.cfg.bert.vocab_size)
        self.sample_rate = sample_rate
        k1, k2 = jax.random.split(jax.random.PRNGKey(rng_seed))
        if text_params is None:
            text_params = self.text.init(k1, jnp.zeros((1, 4), jnp.int32))
        if audio_params is None:
            audio_params = self.audio.init(k2, jnp.zeros((1, sample_rate)))
        self.text_params = text_params
        self.audio_params = audio_params
        self._score = jax.jit(self._score_impl)

    def _score_impl(self, tp, ap, ids, mask, wavs, wav_len):
        t = self.text.apply(tp, ids, mask, method=CLAPTextEncoder.cls_embedding)
        a = self.audio.apply(ap, wavs, wav_len)
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        return (a @ t.T)[:, 0]  # [n_audio]

    def score(self, text: str, wavs) -> np.ndarray:
        """→ similarity per candidate waveform (same sample rate)."""
        import numpy as _np

        wavs = _np.asarray(wavs, _np.float32)
        if wavs.ndim == 1:
            wavs = wavs[None]
        ids, mask = self.tokenizer.encode(text, self.cfg.max_length)
        n = wavs.shape[1]
        return _np.asarray(self._score(
            self.text_params, self.audio_params,
            jnp.asarray(ids)[None], jnp.asarray(mask)[None],
            jnp.asarray(wavs), jnp.full((wavs.shape[0],), n, jnp.int32)))

    def select_best(self, text: str, wavs) -> int:
        return int(self.score(text, wavs).argmax())
