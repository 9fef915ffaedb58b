"""HTSAT — hierarchical token-semantic audio transformer (CLAP audio tower).

Reference: ``ldm/modules/encoders/open_clap/htsat.py`` (1021 LoC torch Swin
for audio): log-mel image → 4×4 patch embed → 4 Swin stages (windowed MSA
with relative position bias, shifted windows between blocks, patch merging
between stages) → pooled embedding. The reference CLAP ckpts use this tower
(PANN is the alternate; both selectable by config, ``open_clap/factory``).

Compact TPU Swin: windows partition via reshape (static shapes), shifts via
``jnp.roll``, relative-position bias as a learned [heads, W², W²] table.
Output matches :class:`~audiogpt_tpu.models.textenc.clap.CLAPAudioEncoder`'s
interface (wav → [B, d_proj], L2-normalizable by the scorer).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audiogpt_tpu.dsp.mel import MelSpec, PANNS_MEL_32K, log_mel
from audiogpt_tpu.models.textenc.clap import Projection


@dataclasses.dataclass(frozen=True)
class HTSATConfig:
    mel: MelSpec = PANNS_MEL_32K
    img_frames: int = 256           # mel frames per forward (pad/trim)
    patch: int = 4
    window: int = 8
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    mlp_ratio: int = 4
    d_proj: int = 1024


def _window_partition(x, w):
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _window_reverse(win, w, b, h, wd):
    x = win.reshape(b, h // w, wd // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, -1)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int

    @nn.compact
    def __call__(self, x):
        """x [nW*B, W², C] → same."""
        n, l, c = x.shape
        w = self.window
        qkv = nn.Dense(3 * self.dim, name="qkv")(x).reshape(
            n, l, 3, self.heads, self.dim // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = (self.dim // self.heads) ** -0.5
        logits = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale

        # relative position bias (Swin): indexed [2w-1 × 2w-1] table
        table = self.param("rel_pos_bias",
                           nn.initializers.normal(0.02),
                           ((2 * w - 1) * (2 * w - 1), self.heads))
        coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                      indexing="ij")).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]
        idx = (rel[0] + w - 1) * (2 * w - 1) + (rel[1] + w - 1)
        bias = table[jnp.asarray(idx.reshape(-1))].reshape(
            l, l, self.heads).transpose(2, 0, 1)
        logits = logits + bias[None]

        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("nhqk,nkhd->nqhd", probs, v).reshape(n, l, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shift: int
    mlp_ratio: int

    @nn.compact
    def __call__(self, x):
        """x [B, H, W, C]."""
        b, h, wd, c = x.shape
        # clamp the window to the grid (late stages shrink below it)
        w = min(self.window, h, wd)
        shift = self.shift if w == self.window else w // 2 if self.shift else 0
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        win = _window_partition(x, w)
        win = WindowAttention(self.dim, self.heads, w, name="attn")(win)
        x = _window_reverse(win, w, b, h, wd)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + x
        hdn = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        hdn = nn.Dense(self.dim * self.mlp_ratio, name="fc1")(hdn)
        x = x + nn.Dense(self.dim, name="fc2")(
            jax.nn.gelu(hdn, approximate=False))
        return x


class PatchMerging(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(self.dim_out, use_bias=False, name="reduction")(x)


class HTSATAudioEncoder(nn.Module):
    cfg: HTSATConfig = HTSATConfig()

    @nn.compact
    def __call__(self, wav, wav_len=None):
        """wav [B, T] @32 kHz → projected [B, d_proj]."""
        cfg = self.cfg
        mel = log_mel(wav, cfg.mel)                  # [B, frames, 64]
        t = cfg.img_frames
        frames = mel.shape[1]
        if frames < t:
            mel = jnp.pad(mel, ((0, 0), (0, t - frames), (0, 0)))
        else:
            mel = mel[:, :t]
        x = mel[..., None]                           # [B, T, F, 1]
        p = cfg.patch
        x = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p),
                    name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="embed_norm")(x)

        dim = cfg.embed_dim
        for i, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
            for d in range(depth):
                shift = 0 if d % 2 == 0 else cfg.window // 2
                x = SwinBlock(dim, heads, cfg.window, shift, cfg.mlp_ratio,
                              name=f"stage{i}_block{d}")(x)
            if i < len(cfg.depths) - 1:
                dim *= 2
                x = PatchMerging(dim, name=f"merge{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="final_norm")(x)
        pooled = x.mean(axis=(1, 2))                 # [B, C]
        return Projection(cfg.d_proj, name="projection")(pooled)
