"""VISinger (VITS-class SVS) training task.

VITS objective: KL(posterior‖flow(prior)) + duration loss + mel
reconstruction (multi-res STFT here) + LSGAN adversarial + feature matching
through the shared HiFi-GAN discriminators. Two groups (disc, model), same
layout as the vocoder recipe.

Batch schema: {"txt_tokens", "pitch_midi", "is_slur", "mel2ph",
"spec" [B, F, bins] linear magnitude, "wav" [B, F*hop], "weight"}.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp

from audiogpt_tpu.models.svs.visinger import VISinger, VISingerConfig
from audiogpt_tpu.models.vocoder.discriminators import (
    DiscriminatorConfig, HifiGANDiscriminator, feature_matching_loss,
    lsgan_d_loss, lsgan_g_loss,
)
from audiogpt_tpu.train import losses as L
from audiogpt_tpu.train.optim import OptimConfig
from audiogpt_tpu.train.stft_loss import stft_loss


@dataclasses.dataclass(frozen=True)
class VISingerTaskConfig:
    model: VISingerConfig = VISingerConfig()
    disc: DiscriminatorConfig = DiscriminatorConfig()
    lambda_kl: float = 1.0
    lambda_mel: float = 45.0
    lambda_fm: float = 2.0
    lambda_adv: float = 1.0
    lambda_dur: float = 0.1
    optim_model: OptimConfig = OptimConfig(
        optimizer="adamw", lr=2e-4, schedule="exponential", beta1=0.8,
        beta2=0.99, lr_decay=0.999, lr_decay_every=1000, clip_grad_norm=0.0)
    optim_disc: OptimConfig = OptimConfig(
        optimizer="adamw", lr=2e-4, schedule="exponential", beta1=0.8,
        beta2=0.99, lr_decay=0.999, lr_decay_every=1000, clip_grad_norm=0.0)


class VISingerTask:
    def __init__(self, cfg: VISingerTaskConfig):
        self.cfg = cfg
        self.model = VISinger(cfg.model)
        self.disc = HifiGANDiscriminator(cfg.disc)

    def init_params(self, rng: jax.Array) -> dict:
        k1, k2 = jax.random.split(rng)
        t = 8
        toks = jnp.ones((1, t), jnp.int32)
        params = self.model.init(
            {"params": k1}, toks, jnp.full((1, t), 60, jnp.int32),
            jnp.zeros((1, t), jnp.int32), rng=jax.random.PRNGKey(0))
        hop = self.cfg.model.decoder.hop_size
        wav = jnp.zeros((1, 4 * hop))
        return {"model": params, "disc": self.disc.init(k2, wav)}

    def _forward(self, params, batch, rng):
        return self.model.apply(
            params["model"], batch["txt_tokens"], batch["pitch_midi"],
            batch["is_slur"], batch["mel2ph"], batch["spec"], rng,
            method=VISinger.train_step_outputs)

    def _model_loss(self, params, batch, rng):
        cfg = self.cfg
        out = self._forward(params, batch, rng)
        fake, real = out["wav"], batch["wav"]
        w = batch.get("weight")

        d_params = jax.lax.stop_gradient(params["disc"])
        fake_logits, fake_fmaps = self.disc.apply(d_params, fake)
        _, real_fmaps = self.disc.apply(d_params, real)

        sc, mag = stft_loss(fake, real, resolutions=((1024, 256, 1024),))
        metrics = {
            "kl": out["kl"] * cfg.lambda_kl,
            "mel": mag * cfg.lambda_mel,
            "adv": lsgan_g_loss(fake_logits) * cfg.lambda_adv,
            "fm": feature_matching_loss(real_fmaps, fake_fmaps) * cfg.lambda_fm,
        }
        metrics.update(L.dur_loss(out["dur"], batch["mel2ph"],
                                  batch["txt_tokens"], w,
                                  lambda_ph=cfg.lambda_dur, lambda_sent=0.0))
        total = sum(metrics.values())
        metrics["total_loss"] = total
        return total, metrics

    def _disc_loss(self, params, batch, rng):
        out = jax.lax.stop_gradient(self._forward(params, batch, rng)["wav"])
        real_logits, _ = self.disc.apply(params["disc"], batch["wav"])
        fake_logits, _ = self.disc.apply(params["disc"], out)
        loss = lsgan_d_loss(real_logits, fake_logits)
        return loss, {"d_loss": loss}

    @property
    def loss_fns(self) -> Mapping[str, object]:
        return {"disc": self._disc_loss, "model": self._model_loss}

    @property
    def optim_cfgs(self) -> Mapping[str, OptimConfig]:
        return {"disc": self.cfg.optim_disc, "model": self.cfg.optim_model}

    def val_loss_fn(self, params, batch, rng):
        out = self._forward(params, batch, rng)
        sc, mag = stft_loss(out["wav"], batch["wav"],
                            resolutions=((1024, 256, 1024),))
        return mag, {"val_mel": mag, "total_loss": mag}
