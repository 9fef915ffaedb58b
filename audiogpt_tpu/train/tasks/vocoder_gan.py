"""HiFi-GAN vocoder GAN training task (two optimized groups).

Reference: ``VocoderBaseTask`` (``NeuralSeq/tasks/vocoder/vocoder_base.py:13``)
+ the HiFi-GAN recipe (``modules/hifigan/hifigan.py``): generator step
(LSGAN adversarial + feature matching + mel/multi-res STFT reconstruction)
alternating with a discriminator step (MPD + MSD), AdamW(0.8, 0.99) with
exponential lr decay. The reference alternates via pl's multi-optimizer
closure (``pl_utils.py:1436``); here each group is its own jitted step over
the same params tree, run back-to-back per batch.

Batch schema: {"mels": [B, F, M], "wav": [B, F*hop], "weight": [B]}.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp

from audiogpt_tpu.models.vocoder.discriminators import (
    DiscriminatorConfig, HifiGANDiscriminator, feature_matching_loss,
    lsgan_d_loss, lsgan_g_loss,
)
from audiogpt_tpu.models.vocoder.hifigan import HifiGANConfig, HifiGANGenerator
from audiogpt_tpu.train.optim import OptimConfig
from audiogpt_tpu.train.stft_loss import stft_loss


@dataclasses.dataclass(frozen=True)
class VocoderGANTaskConfig:
    gen: HifiGANConfig = HifiGANConfig()
    disc: DiscriminatorConfig = DiscriminatorConfig()
    lambda_adv: float = 1.0
    lambda_fm: float = 2.0
    lambda_mel: float = 45.0          # hifigan's l1 mel weight
    lambda_stft: float = 0.0          # parallel_wavegan-style extra (off = ref)
    segment_frames: int = 32          # training crop, frames
    optim_gen: OptimConfig = OptimConfig(
        optimizer="adamw", lr=2e-4, schedule="exponential", beta1=0.8,
        beta2=0.99, lr_decay=0.999, lr_decay_every=1000, clip_grad_norm=0.0)
    optim_disc: OptimConfig = OptimConfig(
        optimizer="adamw", lr=2e-4, schedule="exponential", beta1=0.8,
        beta2=0.99, lr_decay=0.999, lr_decay_every=1000, clip_grad_norm=0.0)


class VocoderGANTask:
    def __init__(self, cfg: VocoderGANTaskConfig):
        self.cfg = cfg
        self.gen = HifiGANGenerator(cfg.gen)
        self.disc = HifiGANDiscriminator(cfg.disc)

    def init_params(self, rng: jax.Array) -> dict:
        k1, k2 = jax.random.split(rng)
        f = self.cfg.segment_frames
        mel = jnp.zeros((1, f, self.cfg.gen.in_channels))
        gp = self.gen.init(k1, mel)
        wav = jnp.zeros((1, f * self.cfg.gen.hop_size))
        dp = self.disc.init(k2, wav)
        return {"gen": gp, "disc": dp}

    def _fake_wav(self, params, batch):
        wav = self.gen.apply(params["gen"], batch["mels"],
                             f0=batch.get("f0"))
        if wav.ndim == 3:
            wav = wav[..., 0]
        return wav

    def _mel_l1(self, fake, real):
        # log-mel L1 via one mid resolution (hifigan uses the train mel cfg;
        # a single 1024/256 resolution is the same signal)
        sc, mag = stft_loss(fake, real, resolutions=((1024, 256, 1024),))
        return mag

    def _gen_loss(self, params, batch, rng):
        cfg = self.cfg
        real = batch["wav"]
        fake = self._fake_wav(params, batch)
        d_params = jax.lax.stop_gradient(params["disc"])
        fake_logits, fake_fmaps = self.disc.apply(d_params, fake)
        _, real_fmaps = self.disc.apply(d_params, real)
        adv = lsgan_g_loss(fake_logits) * cfg.lambda_adv
        fm = feature_matching_loss(real_fmaps, fake_fmaps) * cfg.lambda_fm
        mel = self._mel_l1(fake, real) * cfg.lambda_mel
        metrics = {"g_adv": adv, "g_fm": fm, "g_mel": mel}
        if cfg.lambda_stft > 0:
            sc, mag = stft_loss(fake, real)
            metrics["g_stft"] = (sc + mag) * cfg.lambda_stft
        total = sum(metrics.values())
        metrics["total_loss"] = total
        return total, metrics

    def _disc_loss(self, params, batch, rng):
        real = batch["wav"]
        fake = jax.lax.stop_gradient(self._fake_wav(params, batch))
        real_logits, _ = self.disc.apply(params["disc"], real)
        fake_logits, _ = self.disc.apply(params["disc"], fake)
        loss = lsgan_d_loss(real_logits, fake_logits)
        return loss, {"d_loss": loss}

    @property
    def loss_fns(self) -> Mapping[str, object]:
        # disc first, then gen — the gen step then sees the updated critic
        return {"disc": self._disc_loss, "gen": self._gen_loss}

    @property
    def optim_cfgs(self) -> Mapping[str, OptimConfig]:
        return {"disc": self.cfg.optim_disc, "gen": self.cfg.optim_gen}

    def val_loss_fn(self, params, batch, rng):
        fake = self._fake_wav(params, batch)
        mel = self._mel_l1(fake, batch["wav"])
        return mel, {"val_mel_l1": mel, "total_loss": mel}
