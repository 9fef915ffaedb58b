"""CLIP towers (vision + text) for image-conditioned audio generation.

Reference: ``FrozenGlobalNormOpenCLIPEmbedder``
(``ldm/modules/encoders/modules.py:315``) wraps open_clip ViT-H-14: I2A
conditions the LDM on the **L2-normalized** CLIP image embedding as a
length-1 context ([B, 1, D], ``forward_img``:344, used at
``audio-chatgpt.py:241-242``), with the normalized CLIP text embedding of
``""`` as the unconditional branch.

TPU-native ViT: patch conv → pre-LN transformer (quick-GELU) → ln_post →
projection, all static shapes; the text tower is a causal pre-LN transformer
pooled at the EOT position. Weight layout matches open_clip so a converter
can load released checkpoints.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audiogpt_tpu.ops.attention import attention

# open_clip image normalization constants
CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14           # ViT-H-14
    width: int = 1280
    layers: int = 32
    heads: int = 16
    embed_dim: int = 1024          # projected output dim


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 1024
    layers: int = 24
    heads: int = 16
    embed_dim: int = 1024


class ResidualBlock(nn.Module):
    width: int
    heads: int
    causal: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        d = self.width

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, d // self.heads)

        qkv = nn.Dense(3 * d, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = attention(split(q), split(k), split(v), mask=mask,
                      is_causal=self.causal)
        x = x + nn.Dense(d, name="out_proj")(a.reshape(h.shape))
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * d, name="mlp_fc")(h)
        x = x + nn.Dense(d, name="mlp_proj")(quick_gelu(h))
        return x


class CLIPVisionEncoder(nn.Module):
    cfg: CLIPVisionConfig = CLIPVisionConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images [B, H, W, 3] (CLIP-normalized) → L2-normalized [B, embed_dim]."""
        cfg = self.cfg
        n = cfg.image_size // cfg.patch_size
        x = nn.Conv(cfg.width, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                    name="patch_embed")(images)
        x = x.reshape(x.shape[0], n * n, cfg.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.width,))
        x = jnp.concatenate([jnp.tile(cls[None, None], (x.shape[0], 1, 1)), x],
                            axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (n * n + 1, cfg.width))
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(cfg.layers):
            x = ResidualBlock(cfg.width, cfg.heads, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(cfg.width ** -0.5),
                          (cfg.width, cfg.embed_dim))
        z = x @ proj
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)


class CLIPTextTower(nn.Module):
    cfg: CLIPTextConfig = CLIPTextConfig()

    @nn.compact
    def __call__(self, tokens: jnp.ndarray,
                 return_sequence: bool = False) -> jnp.ndarray:
        """tokens [B, L] (EOT = max id in row) → L2-normalized [B, embed_dim];
        ``return_sequence=True`` → post-ln per-token states [B, L, width]
        (HF ``CLIPTextModel.last_hidden_state`` — StableDiffusion's
        cross-attention context)."""
        cfg = self.cfg
        x = nn.Embed(cfg.vocab_size, cfg.width, name="token_embedding")(tokens)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (cfg.context_length, cfg.width))
        x = x + pos[None, : x.shape[1]]
        for i in range(cfg.layers):
            x = ResidualBlock(cfg.width, cfg.heads, causal=True,
                              name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        if return_sequence:
            return x
        eot = jnp.argmax(tokens, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection",
                          nn.initializers.normal(cfg.width ** -0.5),
                          (cfg.width, cfg.embed_dim))
        z = x @ proj
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)


def preprocess_image(path_or_array, image_size: int = 224) -> np.ndarray:
    """PIL load → center-crop-resize → CLIP normalization → [1, H, W, 3]."""
    if isinstance(path_or_array, str):
        from PIL import Image

        img = Image.open(path_or_array).convert("RGB")
        w, h = img.size
        s = min(w, h)
        img = img.crop(((w - s) // 2, (h - s) // 2,
                        (w + s) // 2, (h + s) // 2))
        img = img.resize((image_size, image_size), Image.BICUBIC)
        arr = np.asarray(img, np.float32) / 255.0
    else:
        arr = np.asarray(path_or_array, np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        if arr.shape[:2] != (image_size, image_size):
            from PIL import Image

            img = Image.fromarray((arr * 255).astype(np.uint8))
            w, h = img.size
            s = min(w, h)
            img = img.crop(((w - s) // 2, (h - s) // 2,
                            (w + s) // 2, (h + s) // 2))
            img = img.resize((image_size, image_size), Image.BICUBIC)
            arr = np.asarray(img, np.float32) / 255.0
    arr = (arr - CLIP_MEAN) / CLIP_STD
    return arr[None]
