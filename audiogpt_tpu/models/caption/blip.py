"""BLIP-class image captioner, TPU-native.

The reference's ImageCaptioning tool is an external HF download
(``audio-chatgpt.py:126-137``: ``BlipForConditionalGeneration`` from
``Salesforce/blip-image-captioning-base``, greedy ``model.generate`` on a
384×384 image). Here the same capability is a flax model:

  * ViT-B/16 vision tower (fused-qkv pre-LN blocks, post-layernorm) returning
    the full patch sequence as cross-attention context,
  * a BERT-style post-LN text decoder (causal self-attn + per-layer
    cross-attn over the image states) with a tied-transform LM head,
  * greedy decode as ONE compiled ``lax.scan`` program with a static-shape KV
    cache and per-layer precomputed cross K/V — the image tokens (577 at
    384 px) are projected once, not once per generated token,
  * weight layout convertible from HF ``BlipForConditionalGeneration``
    checkpoints (``blip`` family in :mod:`audiogpt_tpu.utils.torch_import`).

Decode reuses the Whisper machinery pattern (``models/asr/whisper.py``):
the jitted program is cached per (model, max_tokens, eos) — never rebuilt
per request (CLAUDE.md jit-caching contract).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audiogpt_tpu.ops.attention import KVCache, attention

# BLIP uses the OpenAI-CLIP image normalization constants
BLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
BLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class BlipVisionConfig:
    image_size: int = 384
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072

    @property
    def seq_len(self) -> int:
        n = self.image_size // self.patch_size
        return n * n + 1


@dataclasses.dataclass(frozen=True)
class BlipTextConfig:
    vocab_size: int = 30524          # bert-base-uncased + [DEC]/[ENC]
    width: int = 768
    layers: int = 12
    heads: int = 8
    mlp_dim: int = 3072
    max_position: int = 512
    encoder_width: int = 768         # cross-attn source width
    bos_id: int = 30522              # [DEC]
    eos_id: int = 102                # [SEP] — caption stop token
    pad_id: int = 0
    ln_eps: float = 1e-12


@dataclasses.dataclass(frozen=True)
class BlipConfig:
    vision: BlipVisionConfig = BlipVisionConfig()
    text: BlipTextConfig = BlipTextConfig()


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------


class _VisionBlock(nn.Module):
    """Pre-LN block with BLIP's fused qkv projection."""

    width: int
    heads: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x):
        d = self.width
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(3 * d, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(t.shape[0], t.shape[1], self.heads,
                                    d // self.heads)
        a = attention(split(q), split(k), split(v))
        x = x + nn.Dense(d, name="proj")(a.reshape(h.shape))
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(self.mlp_dim, name="fc1")(h)
        x = x + nn.Dense(d, name="fc2")(jax.nn.gelu(h, approximate=False))
        return x


class BlipVisionEncoder(nn.Module):
    """images [B, H, W, 3] (BLIP-normalized) → patch states [B, N+1, width]."""

    cfg: BlipVisionConfig = BlipVisionConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        n = cfg.image_size // cfg.patch_size
        x = nn.Conv(cfg.width, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    name="patch_embed")(images)
        x = x.reshape(x.shape[0], n * n, cfg.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.width,))
        x = jnp.concatenate(
            [jnp.tile(cls[None, None], (x.shape[0], 1, 1)), x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (cfg.seq_len, cfg.width))
        x = x + pos[None]
        for i in range(cfg.layers):
            x = _VisionBlock(cfg.width, cfg.heads, cfg.mlp_dim,
                             name=f"block{i}")(x)
        return nn.LayerNorm(epsilon=1e-5, name="post_ln")(x)


# ---------------------------------------------------------------------------
# Text decoder (BERT-style post-LN with cross-attention)
# ---------------------------------------------------------------------------


class _TextLayer(nn.Module):
    cfg: BlipTextConfig

    def setup(self):
        cfg = self.cfg
        d = cfg.width
        self.q = nn.Dense(d, name="q")
        self.k = nn.Dense(d, name="k")
        self.v = nn.Dense(d, name="v")
        self.attn_out = nn.Dense(d, name="attn_out")
        self.attn_ln = nn.LayerNorm(epsilon=cfg.ln_eps, name="attn_ln")
        self.xq = nn.Dense(d, name="xq")
        self.xk = nn.Dense(d, name="xk")
        self.xv = nn.Dense(d, name="xv")
        self.x_out = nn.Dense(d, name="x_out")
        self.x_ln = nn.LayerNorm(epsilon=cfg.ln_eps, name="x_ln")
        self.inter = nn.Dense(cfg.mlp_dim, name="inter")
        self.out = nn.Dense(d, name="out")
        self.out_ln = nn.LayerNorm(epsilon=cfg.ln_eps, name="out_ln")

    def _split(self, t):
        cfg = self.cfg
        return t.reshape(t.shape[0], t.shape[1], cfg.heads,
                         cfg.width // cfg.heads)

    def cross_kv(self, img: jnp.ndarray):
        """Project image states once → (k, v) [B, N, H, D]."""
        return self._split(self.xk(img)), self._split(self.xv(img))

    def __call__(self, x, cross_kv, self_cache: KVCache | None = None):
        cfg = self.cfg
        q = self._split(self.q(x))
        k = self._split(self.k(x))
        v = self._split(self.v(x))
        if self_cache is not None:
            self_cache = self_cache.update(k, v)
            k, v = self_cache.k, self_cache.v
            pos = jnp.arange(k.shape[1])[None, None, None, :]
            a = attention(q, k, v, mask=pos < self_cache.index)
        else:
            a = attention(q, k, v, is_causal=True)
        x = self.attn_ln(x + self.attn_out(a.reshape(x.shape)))
        xk, xv = cross_kv
        a = attention(self._split(self.xq(x)), xk, xv)
        x = self.x_ln(x + self.x_out(a.reshape(x.shape)))
        h = jax.nn.gelu(self.inter(x), approximate=False)
        x = self.out_ln(x + self.out(h))
        return (x, self_cache) if self_cache is not None else x


class BlipTextDecoder(nn.Module):
    cfg: BlipTextConfig

    def setup(self):
        cfg = self.cfg
        self.word_emb = nn.Embed(cfg.vocab_size, cfg.width, name="word_emb")
        self.pos_emb = self.param("pos_emb", nn.initializers.normal(0.02),
                                  (cfg.max_position, cfg.width))
        self.emb_ln = nn.LayerNorm(epsilon=cfg.ln_eps, name="emb_ln")
        self.blocks = [_TextLayer(cfg, name=f"layer_{i}")
                       for i in range(cfg.layers)]
        # LM head: transform (dense+gelu+LN) then untied decoder matrix
        self.head_dense = nn.Dense(cfg.width, name="head_dense")
        self.head_ln = nn.LayerNorm(epsilon=cfg.ln_eps, name="head_ln")
        self.head_out = nn.Dense(cfg.vocab_size, name="head_out")

    def cross_kvs(self, img: jnp.ndarray):
        return [blk.cross_kv(img) for blk in self.blocks]

    def __call__(self, tokens, img=None, pos_offset=0, caches=None,
                 cross_kvs=None):
        """tokens [B, t] (+ image states [B, N, D]) → logits [B, t, vocab].

        With ``caches`` (per-layer KVCache) runs incremental decode and
        returns (logits, new_caches); ``cross_kvs`` then carries the
        precomputed image projections.
        """
        if cross_kvs is None:
            cross_kvs = self.cross_kvs(img)
        x = self.word_emb(tokens)
        x = x + jax.lax.dynamic_slice_in_dim(
            self.pos_emb, pos_offset, tokens.shape[1], axis=0)
        x = self.emb_ln(x)
        new_caches = [] if caches is not None else None
        for i, blk in enumerate(self.blocks):
            if caches is not None:
                x, c = blk(x, cross_kvs[i], self_cache=caches[i])
                new_caches.append(c)
            else:
                x = blk(x, cross_kvs[i])
        x = jax.nn.gelu(self.head_dense(x), approximate=False)
        logits = self.head_out(self.head_ln(x))
        return (logits, new_caches) if caches is not None else logits


class BlipCaptioner(nn.Module):
    """HF ``BlipForConditionalGeneration``-compatible captioner."""

    cfg: BlipConfig = BlipConfig()

    def setup(self):
        self.vision = BlipVisionEncoder(self.cfg.vision, name="vision")
        self.decoder = BlipTextDecoder(self.cfg.text, name="decoder")

    def __call__(self, images, tokens):
        """Teacher-forced logits [B, t, vocab] (training / parity)."""
        img = self.vision(images)
        return self.decoder(tokens, img=img)

    def encode_image(self, images):
        return self.vision(images)

    def cross_kvs(self, img):
        return self.decoder.cross_kvs(img)

    def decode_step(self, tokens, cross_kvs, pos_offset, caches):
        return self.decoder(tokens, pos_offset=pos_offset, caches=caches,
                            cross_kvs=cross_kvs)


# ---------------------------------------------------------------------------
# Greedy caption as one compiled program
# ---------------------------------------------------------------------------


def greedy_caption(model: BlipCaptioner, params, images: jnp.ndarray,
                   max_tokens: int = 24) -> jnp.ndarray:
    """images [B, H, W, 3] → tokens [B, 1+max_tokens] (bos + caption,
    eos-padded after stop) — mirrors HF ``generate`` greedy from ``[bos]``."""
    return _caption_fn(model, max_tokens)(params, images)


@functools.lru_cache(maxsize=8)
def _caption_fn(model: BlipCaptioner, max_tokens: int):
    cfg = model.cfg.text
    heads, d = cfg.heads, cfg.width // cfg.heads
    eos = cfg.eos_id

    @jax.jit
    def run(params, images):
        b = images.shape[0]
        total = 1 + max_tokens
        img = model.apply(params, images, method=BlipCaptioner.encode_image)
        cross_kvs = model.apply(params, img, method=BlipCaptioner.cross_kvs)
        caches = [KVCache.create(b, total, heads, d)
                  for _ in range(cfg.layers)]
        prompt = jnp.full((b, 1), cfg.bos_id, jnp.int32)
        logits, caches = model.apply(params, prompt, cross_kvs, 0, caches,
                                     method=BlipCaptioner.decode_step)
        last = jnp.argmax(logits[:, -1], axis=-1)

        def step(carry, i):
            last, caches, done = carry
            tok = jnp.where(done, eos, last)
            logits, caches = model.apply(
                params, tok[:, None], cross_kvs, 1 + i, caches,
                method=BlipCaptioner.decode_step)
            nxt = jnp.argmax(logits[:, -1], axis=-1)
            done = done | (tok == eos)
            return (nxt, caches, done), tok

        (_, _, _), toks = jax.lax.scan(
            step, (last, caches, jnp.zeros((b,), bool)),
            jnp.arange(max_tokens))
        return jnp.concatenate([prompt, toks.T.astype(jnp.int32)], axis=1)

    return run


def preprocess_image(path_or_array, image_size: int = 384) -> np.ndarray:
    """PIL load → resize to (size, size) bicubic → BLIP normalization →
    [1, H, W, 3] (HF ``BlipImageProcessor`` semantics: direct resize, no
    center crop)."""
    if isinstance(path_or_array, str):
        from PIL import Image

        img = Image.open(path_or_array).convert("RGB")
        img = img.resize((image_size, image_size), Image.BICUBIC)
        arr = np.asarray(img, np.float32) / 255.0
    else:
        arr = np.asarray(path_or_array, np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
    arr = (arr - BLIP_MEAN) / BLIP_STD
    return arr[None]
