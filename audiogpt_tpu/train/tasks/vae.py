"""First-stage AutoencoderKL (VAE-GAN) training for the latent-diffusion
family.

Reference: Make-An-Audio trains its ``AutoencoderKL``
(``ldm/models/autoencoder.py:305``) with the taming-transformers objective
(``ldm/modules/losses_audio/``): L1 reconstruction + KL + a patch
discriminator turned on after ``disc_start`` steps (LPIPS perceptual term is
image-pretrained — meaningless for mels; the audio fork's melception
discriminator fills that role, here a spectral patch critic).

Groups: 'disc' (patch critic) then 'model' (VAE) — same two-step GAN layout
as the vocoder recipe.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from audiogpt_tpu.models.diffusion import AutoencoderKL, VAEConfig
from audiogpt_tpu.train.optim import OptimConfig


class PatchDiscriminator(nn.Module):
    """PatchGAN over mel images [B, H, W, 1] (taming NLayerDiscriminator)."""

    hidden: int = 64
    layers: int = 3

    @nn.compact
    def __call__(self, x):
        ch = self.hidden
        x = nn.Conv(ch, (4, 4), strides=(2, 2), padding="SAME", name="in")(x)
        x = nn.leaky_relu(x, 0.2)
        for i in range(1, self.layers):
            ch = min(ch * 2, 512)
            stride = (2, 2) if i < self.layers - 1 else (1, 1)
            x = nn.Conv(ch, (4, 4), strides=stride, padding="SAME",
                        name=f"conv{i}")(x)
            x = nn.leaky_relu(nn.LayerNorm(name=f"norm{i}")(x), 0.2)
        return nn.Conv(1, (4, 4), padding="SAME", name="out")(x)


@dataclasses.dataclass(frozen=True)
class VAETaskConfig:
    vae: VAEConfig = VAEConfig()
    kl_weight: float = 1e-6             # txt2audio_args.yaml lossconfig
    disc_weight: float = 0.5
    disc_start: int = 0                 # step gating handled by caller sched
    optim_vae: OptimConfig = OptimConfig(
        optimizer="adam", lr=4.5e-6, schedule="constant", beta1=0.5,
        beta2=0.9, clip_grad_norm=0.0)
    optim_disc: OptimConfig = OptimConfig(
        optimizer="adam", lr=4.5e-6, schedule="constant", beta1=0.5,
        beta2=0.9, clip_grad_norm=0.0)


class VAETask:
    """Batch schema: {"mels": [B, H, W, 1] in VAE domain [-1, 1]}."""

    def __init__(self, cfg: VAETaskConfig):
        self.cfg = cfg
        self.vae = AutoencoderKL(cfg.vae)
        self.disc = PatchDiscriminator()

    def init_params(self, rng: jax.Array) -> dict:
        k1, k2 = jax.random.split(rng)
        x = jnp.zeros((1, 16, 16, self.cfg.vae.in_channels))
        return {"model": self.vae.init(k1, x),
                "disc": self.disc.init(k2, x)}

    def _reconstruct(self, params, x, rng):
        post = self.vae.apply(params["model"], x, method=AutoencoderKL.encode)
        z = post.sample(rng)
        rec = self.vae.apply(params["model"], z, method=AutoencoderKL.decode)
        return rec, post

    def _model_loss(self, params, batch, rng):
        cfg = self.cfg
        x = batch["mels"]
        rec, post = self._reconstruct(params, x, rng)
        rec_loss = jnp.abs(x - rec).mean()
        kl = post.kl().mean() / x[0].size
        logits = self.disc.apply(jax.lax.stop_gradient(params["disc"]), rec)
        g_adv = jnp.mean((logits - 1.0) ** 2) * cfg.disc_weight
        total = rec_loss + cfg.kl_weight * kl + g_adv
        return total, {"rec": rec_loss, "kl": kl, "g_adv": g_adv,
                       "total_loss": total}

    def _disc_loss(self, params, batch, rng):
        x = batch["mels"]
        rec, _ = self._reconstruct(params, x, rng)
        rec = jax.lax.stop_gradient(rec)
        real = self.disc.apply(params["disc"], x)
        fake = self.disc.apply(params["disc"], rec)
        loss = jnp.mean((real - 1.0) ** 2) + jnp.mean(fake ** 2)
        return loss, {"d_loss": loss}

    @property
    def loss_fns(self) -> Mapping[str, object]:
        return {"disc": self._disc_loss, "model": self._model_loss}

    @property
    def optim_cfgs(self) -> Mapping[str, OptimConfig]:
        return {"disc": self.cfg.optim_disc, "model": self.cfg.optim_vae}

    def val_loss_fn(self, params, batch, rng):
        x = batch["mels"]
        rec, post = self._reconstruct(params, x, rng)
        rec_loss = jnp.abs(x - rec).mean()
        return rec_loss, {"val_rec": rec_loss, "total_loss": rec_loss}
