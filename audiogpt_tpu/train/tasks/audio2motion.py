"""Audio→landmark-motion VAE training task (GeneFace-class generator).

The reference's GeneFace trainer is absent from its tree (``audio_to_face``
missing); the objective here follows the paper's variational generator:
motion reconstruction + KL(q(z|motion,audio) ‖ p(z|audio)) + a velocity
(first-difference) smoothness term. Batch schema:
``{"mels" [B,Tm,80], "motion" [B,Tv,136], "weight" [B]}`` with
``Tv = Audio2MotionConfig.video_len(Tm)``.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp

from audiogpt_tpu.models.face.audio2motion import (Audio2MotionConfig,
                                                   Audio2MotionVAE, kl_gauss)
from audiogpt_tpu.train.optim import OptimConfig


@dataclasses.dataclass(frozen=True)
class Audio2MotionTaskConfig:
    model: Audio2MotionConfig = Audio2MotionConfig()
    lambda_kl: float = 0.02
    lambda_vel: float = 0.5
    optim: OptimConfig = OptimConfig()


class Audio2MotionTask:
    def __init__(self, cfg: Audio2MotionTaskConfig):
        self.cfg = cfg
        self.model = Audio2MotionVAE(cfg.model)

    def init_params(self, rng: jax.Array) -> dict:
        c = self.cfg.model
        tm = 64
        return {"model": self.model.init(
            rng, jnp.zeros((1, tm, c.mel_bins)),
            jnp.zeros((1, c.video_len(tm), c.out_dim)),
            jax.random.PRNGKey(0))}

    def _loss(self, params, batch, rng):
        cfg = self.cfg
        mels, motion = batch["mels"], batch["motion"]
        w = batch.get("weight")
        recon, (mu_q, lv_q), (mu_p, lv_p) = self.model.apply(
            params["model"], mels, motion, rng)
        rw = (w[:, None, None] if w is not None
              else jnp.ones((mels.shape[0], 1, 1)))
        denom = jnp.maximum(rw.sum() * motion.shape[1], 1.0)
        l_rec = (jnp.abs(recon - motion) * rw).sum() / (
            denom * motion.shape[-1])
        l_kl = (kl_gauss(mu_q, lv_q, mu_p, lv_p) * rw).sum() / (
            denom * mu_q.shape[-1])
        vel_r = recon[:, 1:] - recon[:, :-1]
        vel_g = motion[:, 1:] - motion[:, :-1]
        l_vel = (jnp.abs(vel_r - vel_g) * rw).sum() / (
            denom * motion.shape[-1])
        total = l_rec + cfg.lambda_kl * l_kl + cfg.lambda_vel * l_vel
        return total, {"recon_loss": l_rec, "kl_loss": l_kl,
                       "vel_loss": l_vel, "total_loss": total}

    @property
    def loss_fns(self) -> Mapping[str, object]:
        return {"model": self._loss}

    @property
    def optim_cfgs(self) -> Mapping[str, OptimConfig]:
        return {"model": self.cfg.optim}
