"""Latent-diffusion (Make-An-Audio-class) training task — the T2A trainer.

Reference: ``LatentDiffusion_audio`` as a ``pl.LightningModule``
(``ldm/models/diffusion/ddpm_audio.py``: ``p_losses``:682 — sample t, noise
the VAE latent, predict ε, L2 (`l2` loss type) with conditioning from the
frozen CLAP text tower; first stage + cond stage frozen, UNet trains).

Batch schema: {"mels": [B, H, W, 1] VAE-domain ([-1, 1]) mel images,
"text_ids": [B, L], "text_mask": [B, L], "weight": [B]}.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp

from audiogpt_tpu.models.diffusion import (
    AutoencoderKL, DiffusionSchedule, UNetConfig, UNetModel, VAEConfig,
)
from audiogpt_tpu.models.textenc import CLAPTextConfig, CLAPTextEncoder
from audiogpt_tpu.train.optim import OptimConfig


@dataclasses.dataclass(frozen=True)
class LDMTaskConfig:
    unet: UNetConfig = UNetConfig()
    vae: VAEConfig = VAEConfig()
    clap: CLAPTextConfig = CLAPTextConfig()
    timesteps: int = 1000
    linear_start: float = 0.00085
    linear_end: float = 0.0120
    scale_factor: float = 1.0
    loss_type: str = "l2"             # ddpm_audio.py default
    cond_drop_prob: float = 0.1       # classifier-free guidance training
    train_cond_stage: bool = False    # reference freezes CLAP
    #: mixed precision: run the UNet forward+backward in bfloat16 (params
    #: cast inside the loss; master weights, optimizer state, GroupNorm
    #: stats and the loss itself stay f32). Halves activation HBM traffic —
    #: the training-side twin of T2AConfig.unet_bf16.
    bf16_compute: bool = False
    optim: OptimConfig = OptimConfig(
        optimizer="adamw", lr=1e-4, schedule="constant", beta1=0.9,
        beta2=0.999, clip_grad_norm=1.0,
        ema_decay=0.9999)  # reference trains with use_ema (ddpm.py:43)


class LDMTask:
    """Groups: only 'unet' optimizes (VAE + CLAP frozen, reference behavior);
    set ``train_cond_stage=True`` to unfreeze the text tower as a second
    group."""

    def __init__(self, cfg: LDMTaskConfig):
        self.cfg = cfg
        self.unet = UNetModel(cfg.unet)
        self.vae = AutoencoderKL(cfg.vae)
        self.clap = CLAPTextEncoder(cfg.clap)
        self.schedule = DiffusionSchedule.linear(
            cfg.timesteps, cfg.linear_start, cfg.linear_end)

    def init_params(self, rng: jax.Array) -> dict:
        cfg = self.cfg
        k1, k2, k3 = jax.random.split(rng, 3)
        params = {
            "unet": self.unet.init(
                k1, jnp.zeros((1, 8, 8, cfg.unet.in_channels)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 2, cfg.unet.context_dim))),
            "frozen": {
                "vae": self.vae.init(
                    k2, jnp.zeros((1, 16, 16, cfg.vae.in_channels))),
                "clap": self.clap.init(k3, jnp.zeros((1, 4), jnp.int32)),
            },
        }
        return params

    def _loss(self, params, batch, rng):
        cfg = self.cfg
        k_t, k_noise, k_drop, k_post = jax.random.split(rng, 4)
        frozen = jax.lax.stop_gradient(params["frozen"])

        post = self.vae.apply(frozen["vae"], batch["mels"],
                              method=AutoencoderKL.encode)
        z0 = post.sample(k_post) * cfg.scale_factor
        ctx = self.clap.apply(frozen["clap"], batch["text_ids"],
                              batch.get("text_mask"))
        # CFG training: drop conditioning on a fraction of items
        drop = jax.random.bernoulli(k_drop, cfg.cond_drop_prob,
                                    (ctx.shape[0], 1, 1))
        ctx = jnp.where(drop, 0.0, ctx)

        b = z0.shape[0]
        t = jax.random.randint(k_t, (b,), 0, cfg.timesteps)
        noise = jax.random.normal(k_noise, z0.shape)
        z_t = self.schedule.q_sample(z0, t, noise)
        unet_p = params["unet"]
        if cfg.bf16_compute:
            # cast-in-loss mixed precision: grads flow through the cast back
            # to the f32 masters; GroupNorm recomputes its stats in f32
            # internally (unet.py GroupNorm32)
            unet_p = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, unet_p)
            z_t = z_t.astype(jnp.bfloat16)
            ctx = ctx.astype(jnp.bfloat16)
        eps = self.unet.apply(unet_p, z_t, t, ctx).astype(jnp.float32)

        err = (eps - noise) ** 2 if cfg.loss_type == "l2" \
            else jnp.abs(eps - noise)
        w = batch.get("weight")
        if w is not None:
            err = err * w[:, None, None, None]
            denom = jnp.maximum(w.sum() * noise[0].size, 1.0)
        else:
            denom = err.size
        loss = err.sum() / denom
        return loss, {"diff": loss, "total_loss": loss}

    @property
    def loss_fns(self) -> Mapping[str, object]:
        return {"unet": self._loss}

    @property
    def optim_cfgs(self) -> Mapping[str, OptimConfig]:
        return {"unet": self.cfg.optim}
