"""Latent-diffusion UNet with cross-attention, TPU-native (NHWC).

Re-design of the reference's ``UNetModel``
(``Make_An_Audio/ldm/modules/diffusionmodules/openaimodel.py:413``) with
``SpatialTransformer`` cross-attention (``ldm/modules/attention.py:218``).
Defaults match ``configs/text_to_audio/txt2audio_args.yaml`` (model_channels
320, ch_mult [1,2], 2 res blocks, attention at ds 1 and 2, 8 heads, context
1024).

TPU-first choices: NHWC layout (channels on lanes), GroupNorm in fp32 with
bf16-friendly compute, attention via the shared fused op, and
``jax.checkpoint`` on res/attn blocks replacing torch's
``use_checkpoint`` rematerialization.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from audiogpt_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (1, 2)
    channel_mult: Sequence[int] = (1, 2)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int | None = 1024
    dropout: float = 0.0
    use_checkpoint: bool = True


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """[N] → [N, dim]; cos-first ordering (diffusionmodules/util.py:151)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in fp32 (util.py:214). UNet uses torch's default
    eps 1e-5; the VAE's ``Normalize`` uses 1e-6 (model.py)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        g = min(32, x.shape[-1])
        h = nn.GroupNorm(num_groups=g, epsilon=self.eps, dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return h.astype(x.dtype)


def zero_init_conv(features, kernel, name):
    return nn.Conv(features, kernel, padding="SAME",
                   kernel_init=nn.initializers.zeros,
                   bias_init=nn.initializers.zeros, name=name)


class ResBlock(nn.Module):
    """openaimodel ResBlock (no up/down variant — the config doesn't use
    resblock_updown), additive timestep conditioning."""

    out_channels: int

    @nn.compact
    def __call__(self, x, emb):
        h = GroupNorm32(name="in_norm")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", name="in_conv")(h)
        e = nn.Dense(self.out_channels, name="emb_proj")(nn.silu(emb))
        h = h + e[:, None, None, :]
        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        h = zero_init_conv(self.out_channels, (3, 3), name="out_conv")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="skip")(x)
        return x + h


class CrossAttention(nn.Module):
    heads: int
    dim_head: int
    context_dim: int | None = None

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, name="to_v")(ctx)
        split = lambda t: t.reshape(t.shape[0], t.shape[1], self.heads, self.dim_head)
        out = attention(split(q), split(k), split(v))
        out = out.reshape(x.shape[0], x.shape[1], inner)
        return nn.Dense(x.shape[-1] if context is None else x.shape[-1],
                        name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = dim * self.mult
        h = nn.Dense(inner * 2, name="proj")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        return nn.Dense(dim, name="out")(a * jax.nn.gelu(gate, approximate=False))


class BasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int
    context_dim: int | None

    @nn.compact
    def __call__(self, x, context):
        x = x + CrossAttention(self.heads, self.dim_head, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x))
        x = x + CrossAttention(self.heads, self.dim_head, self.context_dim,
                               name="attn2")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context)
        x = x + GEGLUFeedForward(name="ff")(nn.LayerNorm(epsilon=1e-5, name="norm3")(x))
        return x


class SpatialTransformer(nn.Module):
    heads: int
    dim_head: int
    depth: int
    context_dim: int | None

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        x = GroupNorm32(name="norm")(x)
        x = nn.Conv(inner, (1, 1), name="proj_in")(x)
        x = x.reshape(b, h * w, inner)
        for d in range(self.depth):
            x = BasicTransformerBlock(self.heads, self.dim_head, self.context_dim,
                                      name=f"block_{d}")(x, context)
        x = x.reshape(b, h, w, inner)
        x = zero_init_conv(c, (1, 1), name="proj_out")(x)
        return x + x_in


class Downsample(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                       name="op")(x)


class Upsample(nn.Module):
    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(c, (3, 3), padding="SAME", name="conv")(x)


class UNetModel(nn.Module):
    """x [B, H, W, C_in], t [B], context [B, L, context_dim] → [B, H, W, C_out]."""

    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, t, context=None):
        cfg = self.cfg
        ted = cfg.model_channels * 4
        emb = timestep_embedding(t, cfg.model_channels)
        emb = nn.Dense(ted, name="time_embed_0")(emb)
        emb = nn.Dense(ted, name="time_embed_2")(nn.silu(emb))
        # keep the network in the input compute dtype (bf16 fast path):
        # without this the f32 sinusoid embedding re-promotes every ResBlock
        emb = emb.astype(x.dtype)
        if context is not None:
            context = context.astype(x.dtype)

        # rematerialization must go through flax's module-aware remat —
        # raw jax.checkpoint around a bound module leaks tracers via params
        ResBlk = nn.remat(ResBlock) if cfg.use_checkpoint else ResBlock
        AttnBlk = nn.remat(SpatialTransformer) if cfg.use_checkpoint \
            else SpatialTransformer

        def res(h, emb, out_ch, name):
            return ResBlk(out_ch, name=name)(h, emb)

        def attn_at(h, context, ch, name):
            dim_head = ch // cfg.num_heads
            return AttnBlk(cfg.num_heads, dim_head, cfg.transformer_depth,
                           cfg.context_dim, name=name)(h, context)

        hs = []
        ch = cfg.model_channels
        h = nn.Conv(ch, (3, 3), padding="SAME", name="in_conv")(x)
        hs.append(h)
        ds = 1
        # down
        for level, mult in enumerate(cfg.channel_mult):
            for i in range(cfg.num_res_blocks):
                ch = mult * cfg.model_channels
                h = res(h, emb, ch, f"down_{level}_{i}_res")
                if ds in cfg.attention_resolutions:
                    h = attn_at(h, context, ch, f"down_{level}_{i}_attn")
                hs.append(h)
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(name=f"down_{level}_ds")(h)
                hs.append(h)
                ds *= 2
        # middle
        h = res(h, emb, ch, "mid_res1")
        h = attn_at(h, context, ch, "mid_attn")
        h = res(h, emb, ch, "mid_res2")
        # up
        for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                ch = mult * cfg.model_channels
                h = res(h, emb, ch, f"up_{level}_{i}_res")
                if ds in cfg.attention_resolutions:
                    h = attn_at(h, context, ch, f"up_{level}_{i}_attn")
                if level and i == cfg.num_res_blocks:
                    h = Upsample(name=f"up_{level}_us")(h)
                    ds //= 2
        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        return zero_init_conv(cfg.out_channels, (3, 3), name="out_conv")(h)
