"""ParallelWaveGAN and MelGAN generators.

Reference: ``NeuralSeq/modules/parallel_wavegan/models/parallel_wavegan.py``
(``ParallelWaveGANGenerator``:21 — noise-input WaveNet conditioned on
nearest-upsampled mel; 30 layers / 3 dilation stacks, gated tanh·sigmoid
units, skip-sum head) and ``.../models/melgan.py`` (``MelGANGenerator`` —
transposed-conv upsampling with dilated residual stacks, tanh output). These
back the reference's ``PWG`` vocoder class (``NeuralSeq/vocoders/pwg.py``).

TPU re-design: NLC layout so every conv lowers to an MXU matmul over
channels; mel upsampling is a single nearest-neighbor ``jnp.repeat`` (the
reference's ``ConvInUpsampleNetwork`` stretch) + context conv; no weight
norm (a training-time reparameterization — converters fold it, cf.
``utils/torch_import.py``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audiogpt_tpu.registry import VOCODERS


# ---------------------------------------------------------------------------
# Parallel WaveGAN
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PWGConfig:
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    aux_context_window: int = 2
    kernel_size: int = 3
    upsample_scales: Sequence[int] = (4, 4, 4, 4)
    sample_rate: int = 22050
    #: 'repeat' = context conv + nearest repeat (our original TPU-simple
    #: path); 'conv_in' = the reference's ConvInUpsampleNetwork (conv_in +
    #: per-scale stretch + learned smoothing convs,
    #: parallel_wavegan/layers/upsample.py:125) — required to load
    #: pretrained PWG checkpoints
    upsample: str = "repeat"

    @property
    def hop_size(self) -> int:
        return int(np.prod(self.upsample_scales))


class PWGResidualBlock(nn.Module):
    cfg: PWGConfig
    dilation: int

    @nn.compact
    def __call__(self, x, c):
        """x [B, T, R], c [B, T, A] → (residual, skip)."""
        cfg = self.cfg
        g = cfg.gate_channels
        h = nn.Conv(g, (cfg.kernel_size,), kernel_dilation=(self.dilation,),
                    padding="SAME", name="conv")(x)
        h = h + nn.Conv(g, (1,), use_bias=False, name="conv1x1_aux")(c)
        a, b = jnp.split(h, 2, axis=-1)
        z = jnp.tanh(a) * jax.nn.sigmoid(b)
        res = nn.Conv(cfg.residual_channels, (1,), name="conv1x1_out")(z)
        skip = nn.Conv(cfg.skip_channels, (1,), name="conv1x1_skip")(z)
        return (x + res) * math.sqrt(0.5), skip


@VOCODERS.register("pwg")
class ConvInUpsample(nn.Module):
    """ConvInUpsampleNetwork (upsample.py:125): context conv over mel, then
    per-scale nearest stretch + a single-channel (2s+1) smoothing conv
    shared across mel bins. The torch version runs the smoothing as a
    1-channel Conv2d over a [B,1,A,T] image; here mel bins fold into the
    batch so it stays a cheap 1-D conv on TPU."""

    cfg: PWGConfig

    @nn.compact
    def __call__(self, mel):
        cfg = self.cfg
        k = 2 * cfg.aux_context_window + 1
        c = nn.Conv(cfg.aux_channels, (k,), padding="SAME", use_bias=False,
                    name="conv_in")(mel)
        for i, s in enumerate(cfg.upsample_scales):
            c = jnp.repeat(c, s, axis=1)                   # Stretch2d (time)
            b, t, a = c.shape
            flat = c.transpose(0, 2, 1).reshape(b * a, t, 1)
            flat = nn.Conv(1, (2 * s + 1,), padding="SAME", use_bias=False,
                           name=f"up{i}")(flat)
            c = flat.reshape(b, a, t).transpose(0, 2, 1)
        return c


class PWGGenerator(nn.Module):
    """(noise [B, T], mel [B, frames, A]) → wav [B, T]; T = frames * hop."""

    cfg: PWGConfig

    @nn.compact
    def __call__(self, mel: jnp.ndarray, noise: jnp.ndarray | None = None,
                 rng: jax.Array | None = None) -> jnp.ndarray:
        cfg = self.cfg
        b, frames, _ = mel.shape
        t = frames * cfg.hop_size
        if noise is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            noise = jax.random.normal(rng, (b, t))

        if cfg.upsample == "conv_in":
            c = ConvInUpsample(cfg, name="upsample_net")(mel)  # [B, T, A]
        else:
            # aux context conv then nearest upsample to sample rate
            c = nn.Conv(cfg.aux_channels, (2 * cfg.aux_context_window + 1,),
                        padding="SAME", use_bias=False, name="aux_context")(mel)
            c = jnp.repeat(c, cfg.hop_size, axis=1)       # [B, T, A]

        x = nn.Conv(cfg.residual_channels, (1,), name="first_conv")(
            noise[..., None])
        skips = 0.0
        layers_per_stack = cfg.layers // cfg.stacks
        for i in range(cfg.layers):
            dilation = 2 ** (i % layers_per_stack)
            x, s = PWGResidualBlock(cfg, dilation, name=f"block{i}")(x, c)
            skips = skips + s
        skips = skips * math.sqrt(1.0 / cfg.layers)
        h = jax.nn.relu(skips)
        h = jax.nn.relu(nn.Conv(cfg.skip_channels, (1,), name="post1")(h))
        out = nn.Conv(1, (1,), name="post2")(h)
        return out[..., 0]


# ---------------------------------------------------------------------------
# MelGAN
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MelGANConfig:
    in_channels: int = 80
    channels: int = 512
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    stack_kernel_size: int = 3
    stacks: int = 3
    sample_rate: int = 22050

    @property
    def hop_size(self) -> int:
        return int(np.prod(self.upsample_scales))


class MelGANResidualStack(nn.Module):
    channels: int
    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        h = nn.leaky_relu(x, 0.2)
        h = nn.Conv(self.channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding="SAME",
                    name="conv1")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.channels, (1,), name="conv2")(h)
        return x + h


@VOCODERS.register("melgan")
class MelGANGenerator(nn.Module):
    """mel [B, frames, M] → wav [B, frames*hop] (melgan.py MelGANGenerator)."""

    cfg: MelGANConfig

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = nn.Conv(cfg.channels, (7,), padding="SAME", name="in_conv")(mel)
        ch = cfg.channels
        for i, scale in enumerate(cfg.upsample_scales):
            ch //= 2
            x = nn.leaky_relu(x, 0.2)
            x = nn.ConvTranspose(ch, (scale * 2,), strides=(scale,),
                                 padding="SAME", name=f"up{i}")(x)
            for s in range(cfg.stacks):
                x = MelGANResidualStack(
                    ch, cfg.stack_kernel_size, cfg.stack_kernel_size ** s,
                    name=f"up{i}_stack{s}")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (7,), padding="SAME", name="out_conv")(x)
        return jnp.tanh(x)[..., 0]
