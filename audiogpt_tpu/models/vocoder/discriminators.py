"""HiFi-GAN discriminators for vocoder GAN training.

Reference: ``NeuralSeq/modules/hifigan/hifigan.py`` — ``DiscriminatorP``
(period reshape + stacked 2-D convs, :226), ``MultiPeriodDiscriminator``
(periods 2/3/5/7/11), ``DiscriminatorS`` (strided grouped 1-D convs),
``MultiScaleDiscriminator`` (3 scales via avg-pool). Torch uses weight-norm /
spectral-norm wrappers; on TPU plain convs + the LSGAN objective train
stably and keep XLA fusion simple (weight norm is a training-time
reparameterization, not a capability).

Layout: NLC (length-last-minor) so conv1d lands on the MXU as a matmul over
the channel dim.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp


def _lrelu(x):
    return nn.leaky_relu(x, 0.1)


class PeriodDiscriminator(nn.Module):
    period: int
    channels: tuple = (32, 128, 512, 1024)

    @nn.compact
    def __call__(self, wav: jnp.ndarray):
        """wav [B, T] → (logits [B, L, 1], feature maps)."""
        b, t = wav.shape
        p = self.period
        pad = (p - t % p) % p
        x = jnp.pad(wav, ((0, 0), (0, pad)), mode="reflect" if t % p else "constant")
        x = x.reshape(b, -1, p, 1)  # [B, T/p, p, 1] (NHWC)
        fmaps = []
        for ch in self.channels:
            x = nn.Conv(ch, (5, 1), strides=(3, 1), padding=((2, 2), (0, 0)))(x)
            x = _lrelu(x)
            fmaps.append(x)
        x = nn.Conv(self.channels[-1], (5, 1), padding=((2, 2), (0, 0)))(x)
        x = _lrelu(x)
        fmaps.append(x)
        x = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)))(x)
        return x.reshape(b, -1), fmaps


class ScaleDiscriminator(nn.Module):
    channels: tuple = (128, 128, 256, 512, 1024, 1024, 1024)
    groups: tuple = (1, 4, 16, 16, 16, 16, 1)
    kernel_sizes: tuple = (15, 41, 41, 41, 41, 41, 5)
    strides: tuple = (1, 2, 2, 4, 4, 1, 1)

    @nn.compact
    def __call__(self, wav: jnp.ndarray):
        x = wav[..., None]  # [B, T, 1]
        fmaps = []
        for ch, k, s, g in zip(self.channels, self.kernel_sizes,
                               self.strides, self.groups):
            x = nn.Conv(ch, (k,), strides=(s,), padding="SAME",
                        feature_group_count=min(g, x.shape[-1]))(x)
            x = _lrelu(x)
            fmaps.append(x)
        x = nn.Conv(1, (3,), padding="SAME")(x)
        return x.reshape(x.shape[0], -1), fmaps


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    periods: tuple = (2, 3, 5, 7, 11)
    scales: int = 3
    #: channel stacks (reference hifigan.py widths). Narrow these for CPU
    #: tests/demos: the default MSD tower is ~100 GFLOP/step at 2 k samples
    #: — full-width sub-discriminators on a 1-core host dominate a GAN
    #: recipe's wall no matter how tiny the generator is. A shorter
    #: ``scale_channels`` tuple truncates the kernel/stride/group schedules
    #: with it (zip semantics).
    period_channels: tuple = (32, 128, 512, 1024)
    scale_channels: tuple = (128, 128, 256, 512, 1024, 1024, 1024)
    #: feature_group_count schedule for the MSD stacks. Grouped-conv
    #: BACKWARD is an XLA CPU slow path (measured 176 ms grad vs 0.8 ms
    #: fwd on a 3-layer narrow stack) — CPU-mesh tests set all-1s; on TPU
    #: the reference grouping is fine and is the default
    scale_groups: tuple = (1, 4, 16, 16, 16, 16, 1)


class HifiGANDiscriminator(nn.Module):
    """MPD + MSD under one params tree: ``__call__(wav) -> (logits, fmaps)``
    lists across all sub-discriminators."""

    cfg: DiscriminatorConfig = DiscriminatorConfig()

    @nn.compact
    def __call__(self, wav: jnp.ndarray):
        logits, fmaps = [], []
        for p in self.cfg.periods:
            l, f = PeriodDiscriminator(p, self.cfg.period_channels,
                                       name=f"mpd_{p}")(wav)
            logits.append(l)
            fmaps.append(f)
        x = wav
        for i in range(self.cfg.scales):
            l, f = ScaleDiscriminator(self.cfg.scale_channels,
                                      self.cfg.scale_groups,
                                      name=f"msd_{i}")(x)
            logits.append(l)
            fmaps.append(f)
            if i + 1 < self.cfg.scales:
                # avg-pool 4, stride 2 (hifigan.py MultiScale meanpools)
                x = nn.avg_pool(x[..., None], (4,), strides=(2,),
                                padding="SAME")[..., 0]
        return logits, fmaps


def lsgan_d_loss(real_logits, fake_logits):
    """LSGAN discriminator objective (hifigan.py training loop)."""
    loss = 0.0
    for r, f in zip(real_logits, fake_logits):
        loss += jnp.mean((r - 1.0) ** 2) + jnp.mean(f ** 2)
    return loss


def lsgan_g_loss(fake_logits):
    loss = 0.0
    for f in fake_logits:
        loss += jnp.mean((f - 1.0) ** 2)
    return loss


def feature_matching_loss(real_fmaps, fake_fmaps):
    """L1 across all discriminator feature maps (hifigan feature loss)."""
    loss = 0.0
    n = 0
    for rf, ff in zip(real_fmaps, fake_fmaps):
        for r, f in zip(rf, ff):
            loss += jnp.mean(jnp.abs(r - f))
            n += 1
    return loss / max(n, 1)
