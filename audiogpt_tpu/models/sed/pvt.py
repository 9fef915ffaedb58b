"""PVT — Pyramid Vision Transformer v2 sound-event detection.

Reference: the SoundDetection tool's actual backbone
(``audio_detection/audio_infer/pytorch/models.py:141`` ``PVT``):
log-mel [B, T, 64] → PVTv2-b2 (4 stages, overlap patch embeds k7s4/k3s2,
spatial-reduction attention with sr_ratios 8/4/2/1, mix-FFN with depthwise
conv, depths 3/4/6/3, dims 64/128/320/512) → mean over the freq axis →
framewise sigmoid head (527 AudioSet classes) → 32× nearest interpolation;
clipwise = average of framewise (``forward``:199-236).

TPU notes: NHWC throughout; the spatial-reduction conv turns the O((TF)²)
attention into O(TF·TF/sr²) — long-clip friendly; windows stay static so one
compile per audio bucket.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from audiogpt_tpu.ops.attention import attention
from audiogpt_tpu.dsp.mel import MelSpec, PANNS_MEL_32K, log_mel


@dataclasses.dataclass(frozen=True)
class PVTConfig:
    classes_num: int = 527
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (3, 4, 6, 3)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    mlp_ratios: Sequence[int] = (8, 8, 4, 4)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    interpolate_ratio: int = 32
    sample_rate: int = 32000
    hop: int = 320
    mel: MelSpec = PANNS_MEL_32K


class OverlapPatchEmbed(nn.Module):
    dim: int
    kernel: int
    stride: int

    @nn.compact
    def __call__(self, x):
        # torch-exact padding: Conv2d(..., padding=patch_size//3)
        # (models.py:796 ``padding=(patch_size[0] // 3, ...)``) so imported
        # reference weights see identical token grids (k7→2, k3→1).
        p = self.kernel // 3
        x = nn.Conv(self.dim, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), name="proj")(x)
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)


class SRAttention(nn.Module):
    """Spatial-reduction attention (PVTv2): kv computed on a sr×sr
    conv-downsampled map."""

    dim: int
    heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        q = nn.Dense(self.dim, name="q")(x).reshape(b, h * w, self.heads,
                                                    self.dim // self.heads)
        if self.sr_ratio > 1:
            # VALID = torch's unpadded Conv2d(k=s=sr) — truncates the ragged
            # edge rather than padding it (models.py:683).
            kv_in = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                            strides=(self.sr_ratio, self.sr_ratio),
                            padding="VALID", name="sr")(x)
            kv_in = nn.LayerNorm(epsilon=1e-6, name="sr_norm")(kv_in)
        else:
            kv_in = x
        n_kv = kv_in.shape[1] * kv_in.shape[2]
        kv = nn.Dense(2 * self.dim, name="kv")(kv_in).reshape(
            b, n_kv, 2, self.heads, self.dim // self.heads)
        k, v = kv[:, :, 0], kv[:, :, 1]
        out = attention(q, k, v)
        out = out.reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class MixFFN(nn.Module):
    """FFN with a 3×3 depthwise conv (PVTv2's positional signal)."""

    dim: int
    ratio: int

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.ratio
        h = nn.Dense(inner, name="fc1")(x)
        h = nn.Conv(inner, (3, 3), padding="SAME", feature_group_count=inner,
                    name="dwconv")(h)
        h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, name="fc2")(h)


class PVTBlock(nn.Module):
    dim: int
    heads: int
    sr_ratio: int
    mlp_ratio: int

    @nn.compact
    def __call__(self, x):
        x = x + SRAttention(self.dim, self.heads, self.sr_ratio,
                            name="attn")(
            nn.LayerNorm(epsilon=1e-6, name="norm1")(x))
        x = x + MixFFN(self.dim, self.mlp_ratio, name="ffn")(
            nn.LayerNorm(epsilon=1e-6, name="norm2")(x))
        return x


class PVTSED(nn.Module):
    """wav [B, T] @32 kHz → same output dict as :class:`SEDModel`."""

    cfg: PVTConfig = PVTConfig()

    @nn.compact
    def __call__(self, wav, wav_len=None, train: bool = False):
        cfg = self.cfg
        mel = log_mel(wav, cfg.mel)                 # [B, frames, 64]
        frames = mel.shape[1]
        x = mel[..., None]                          # NHWC [B, T, F, 1]
        # per-mel-bin batch norm (bn0 in the reference)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis=2, name="bn0")(x)
        for i, (dim, depth, heads, mr, sr) in enumerate(zip(
                cfg.embed_dims, cfg.depths, cfg.num_heads, cfg.mlp_ratios,
                cfg.sr_ratios)):
            x = OverlapPatchEmbed(dim, 7 if i == 0 else 3,
                                  4 if i == 0 else 2,
                                  name=f"patch_embed{i}")(x)
            for d in range(depth):
                x = PVTBlock(dim, heads, sr, mr, name=f"stage{i}_block{d}")(x)
            x = nn.LayerNorm(epsilon=1e-6, name=f"stage{i}_norm")(x)

        x = x.mean(axis=2)                          # mean over freq → [B, T', C]
        framewise = jax.nn.sigmoid(
            nn.Dense(cfg.classes_num, name="fc_audioset")(x))
        clipwise = jnp.clip(framewise.mean(axis=1), 1e-7, 1.0)
        up = jnp.repeat(framewise, cfg.interpolate_ratio, axis=1)
        # pad/trim to the mel frame count (reference pad_framewise_output)
        if up.shape[1] < frames:
            up = jnp.concatenate(
                [up, jnp.repeat(up[:, -1:], frames - up.shape[1], axis=1)], 1)
        return {"framewise_output": up[:, :frames],
                "clipwise_output": clipwise,
                "embedding": x.mean(axis=1)}
