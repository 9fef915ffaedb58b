"""Audio captioning model: Cnn14 + (Bi)GRU encoder → torch-style transformer
decoder. Re-design of ``AudioCapModel`` (``audio_to_text/inference_waveform.py:61``)
with ``Cnn14RnnEncoder`` (``encoder.py:561``) and ``TransformerDecoder``
(``decoder.py:614``).

The decoder layer matches ``torch.nn.TransformerDecoderLayer`` post-LN
semantics (self-attn → add+LN → cross-attn → add+LN → relu-FFN → add+LN) so
trained checkpoints convert directly.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audiogpt_tpu.models.caption.cnn14 import Cnn14Config, Cnn14Encoder
from audiogpt_tpu.ops.attention import attention
from audiogpt_tpu.ops.rnn import GRU


@dataclasses.dataclass(frozen=True)
class CaptionConfig:
    cnn14: Cnn14Config = Cnn14Config()
    rnn_hidden: int = 512
    rnn_bidirectional: bool = True
    vocab_size: int = 4981          # audiocaps vocab
    emb_dim: int = 256
    nhead: int = 4
    nlayers: int = 2
    dim_feedforward: int = 1024
    max_caption_len: int = 22
    sos_id: int = 0
    eos_id: int = 9


class TorchMHA(nn.Module):
    """torch.nn.MultiheadAttention layout: packed in_proj + out_proj."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, q_in, kv_in, mask=None, is_causal=False):
        d = self.dim
        w = self.param("in_proj_weight", nn.initializers.xavier_uniform(), (d, 3 * d))
        b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        wq, wk, wv = jnp.split(w, 3, axis=1)
        bq, bk, bv = jnp.split(b, 3)
        split = lambda t: t.reshape(t.shape[0], t.shape[1], self.heads, d // self.heads)
        q = split(q_in @ wq + bq)
        k = split(kv_in @ wk + bk)
        v = split(kv_in @ wv + bv)
        out = attention(q, k, v, mask=mask, is_causal=is_causal)
        out = out.reshape(q_in.shape[0], q_in.shape[1], d)
        return nn.Dense(d, name="out_proj")(out)


class TorchDecoderLayer(nn.Module):
    dim: int
    heads: int
    ffn: int

    @nn.compact
    def __call__(self, x, memory, mem_mask=None):
        h = TorchMHA(self.dim, self.heads, name="self_attn")(x, x, is_causal=True)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + h)
        h = TorchMHA(self.dim, self.heads, name="multihead_attn")(
            x, memory, mask=mem_mask)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + h)
        h = nn.Dense(self.ffn, name="linear1")(x)
        h = nn.Dense(self.dim, name="linear2")(jax.nn.relu(h))
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(x + h)


def sinusoid_pos(length: int, dim: int) -> np.ndarray:
    """Interleaved sin/cos (the captioner's PositionalEncoding)."""
    pos = np.arange(length)[:, None]
    div = np.exp(np.arange(0, dim, 2) * -(math.log(10000.0) / dim))
    pe = np.zeros((length, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class CaptionModel(nn.Module):
    cfg: CaptionConfig

    def setup(self):
        cfg = self.cfg
        self.cnn = Cnn14Encoder(cfg.cnn14, name="cnn")
        self.rnn = GRU(cfg.rnn_hidden, cfg.rnn_bidirectional, name="rnn")
        self.word_embedding = nn.Embed(cfg.vocab_size, cfg.emb_dim,
                                       name="word_embedding")
        self.attn_proj_fc = nn.Dense(cfg.emb_dim, name="attn_proj_fc")
        self.attn_proj_ln = nn.LayerNorm(epsilon=1e-5, name="attn_proj_ln")
        self.layers = [
            TorchDecoderLayer(cfg.emb_dim, cfg.nhead, cfg.dim_feedforward,
                              name=f"dec_layer_{i}")
            for i in range(cfg.nlayers)
        ]
        self.classifier = nn.Dense(cfg.vocab_size, name="classifier")

    def encode(self, wav, wav_len=None, train=False):
        enc = self.cnn(wav, wav_len, train=train)
        attn = self.rnn(enc["attn_emb"], enc["attn_emb_len"])
        return attn, enc["attn_emb_len"]

    def decode_logits(self, words, memory, mem_len=None):
        """words [B, T] → logits [B, T, V] (teacher-forcing / re-run decode)."""
        cfg = self.cfg
        mem = self.attn_proj_ln(jax.nn.relu(self.attn_proj_fc(memory)))
        mem_mask = None
        if mem_len is not None:
            mem_mask = (jnp.arange(mem.shape[1])[None] < mem_len[:, None])
            mem_mask = mem_mask[:, None, None, :]
        x = self.word_embedding(words) * math.sqrt(cfg.emb_dim)
        x = x + jnp.asarray(sinusoid_pos(words.shape[1], cfg.emb_dim))
        for layer in self.layers:
            x = layer(x, mem, mem_mask)
        return self.classifier(x)

    def __call__(self, wav, words, wav_len=None, train=False):
        memory, mem_len = self.encode(wav, wav_len, train=train)
        return self.decode_logits(words, memory, mem_len)


def caption_greedy_decode(model: CaptionModel, variables, wav: jnp.ndarray,
                          wav_len=None) -> np.ndarray:
    """Greedy caption decode as one jit program (re-run decoder per position;
    captions are ≤22 tokens so the O(L²) cost is negligible). The jitted
    program is cached per model — rebuilding it per call re-traces and
    re-compiles every request."""
    b = wav.shape[0]
    return np.asarray(_greedy_fn(model)(
        variables, wav, wav_len if wav_len is not None
        else jnp.full((b,), wav.shape[1], jnp.int32)))


@functools.lru_cache(maxsize=8)
def _greedy_fn(model: CaptionModel):
    cfg = model.cfg
    L = cfg.max_caption_len

    @jax.jit
    def run(variables, wav, wav_len):
        b = wav.shape[0]
        memory, mem_len = model.apply(variables, wav, wav_len,
                                      method=CaptionModel.encode)
        tokens = jnp.full((b, L), cfg.eos_id, jnp.int32)
        tokens = tokens.at[:, 0].set(cfg.sos_id)

        def body(i, carry):
            tokens, done = carry
            logits = model.apply(variables, tokens, memory, mem_len,
                                 method=CaptionModel.decode_logits)
            nxt = jnp.argmax(logits[:, i - 1], axis=-1)
            nxt = jnp.where(done, cfg.eos_id, nxt)
            done = done | (nxt == cfg.eos_id)
            return tokens.at[:, i].set(nxt), done

        tokens, _ = jax.lax.fori_loop(1, L, body, (tokens, jnp.zeros((b,), bool)))
        return tokens

    return run


def caption_beam_decode(model: CaptionModel, variables, wav: jnp.ndarray,
                        wav_len=None, beam_size: int = 3,
                        length_penalty: float = 1.0) -> np.ndarray:
    """Batched beam search as one jit program (the reference's beam decode,
    ``audio_to_text/captioning/models/base_model.py`` — used by the A2T
    checkpoint configs). Returns the best hypothesis token ids [B, L].

    Mechanics: the beam dimension folds into the batch for the decoder
    re-run (static shapes), scores accumulate log-probs with finished beams
    frozen at EOS; final pick by length-normalized score. The jitted program
    is cached per (model, beam, penalty).
    """
    b = wav.shape[0]
    return np.asarray(_beam_fn(model, beam_size, length_penalty)(
        variables, wav, wav_len if wav_len is not None
        else jnp.full((b,), wav.shape[1], jnp.int32)))


@functools.lru_cache(maxsize=8)
def _beam_fn(model: CaptionModel, beam_size: int, length_penalty: float):
    cfg = model.cfg
    L = cfg.max_caption_len
    k = beam_size
    V = cfg.vocab_size

    @jax.jit
    def run(variables, wav, wav_len):
        b = wav.shape[0]
        memory, mem_len = model.apply(variables, wav, wav_len,
                                      method=CaptionModel.encode)
        # expand memory to the beam: [B*k, T, H]
        mem = jnp.repeat(memory, k, axis=0)
        mlen = jnp.repeat(mem_len, k, axis=0)

        tokens = jnp.full((b, k, L), cfg.eos_id, jnp.int32)
        tokens = tokens.at[:, :, 0].set(cfg.sos_id)
        # first expansion must come from beam 0 only
        scores = jnp.tile(jnp.asarray([0.0] + [-1e9] * (k - 1))[None], (b, 1))
        done = jnp.zeros((b, k), bool)

        def body(i, carry):
            tokens, scores, done = carry
            logits = model.apply(variables, tokens.reshape(b * k, L), mem,
                                 mlen, method=CaptionModel.decode_logits)
            logp = jax.nn.log_softmax(logits[:, i - 1].reshape(b, k, V))
            # frozen beams: only EOS continues, at zero cost
            frozen = jnp.full((b, k, V), -1e9).at[:, :, cfg.eos_id].set(0.0)
            logp = jnp.where(done[..., None], frozen, logp)
            cand = scores[..., None] + logp                   # [B, k, V]
            flat = cand.reshape(b, k * V)
            top_scores, top_idx = jax.lax.top_k(flat, k)      # [B, k]
            src_beam = top_idx // V
            next_tok = top_idx % V
            tokens = jnp.take_along_axis(tokens, src_beam[..., None], axis=1)
            done = jnp.take_along_axis(done, src_beam, axis=1)
            tokens = tokens.at[:, :, i].set(
                jnp.where(done, cfg.eos_id, next_tok))
            done = done | (next_tok == cfg.eos_id)
            return tokens, top_scores, done

        tokens, scores, done = jax.lax.fori_loop(
            1, L, body, (tokens, scores, done))
        # length-normalized pick
        lengths = (tokens != cfg.eos_id).sum(-1)
        norm = scores / jnp.maximum(lengths, 1) ** length_penalty
        best = jnp.argmax(norm, axis=-1)
        return jnp.take_along_axis(tokens, best[:, None, None],
                                   axis=1)[:, 0]

    return run
