"""Adversarial TTS training (the reference's ``ps_adv`` recipe).

Reference: ``NeuralSeq/tasks/tts/ps_adv.py`` — FS2-class generator trained
with the usual reconstruction losses plus an LSGAN objective from a
multi-window mel discriminator (``modules/syntaspeech/multi_window_disc.py``:
random 32/64/128-frame mel crops → 3×(conv 3×3 stride 2) stacks → linear
validity score, validities summed across windows).

TPU re-design: the random crop per window is a ``lax.dynamic_slice`` with the
start index drawn on-device from the step rng — static shapes, two jitted
steps (gen/disc) sharing one params tree via the GAN-capable Trainer groups.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from audiogpt_tpu.train.optim import OptimConfig
from audiogpt_tpu.train.tasks.fs2 import FS2Task, FS2TaskConfig


class SingleWindowDisc(nn.Module):
    """[B, W, M, 1] mel crop → validity [B, 1] (multi_window_disc.py:6)."""

    hidden: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(3):
            x = nn.Conv(self.hidden, (3, 3), strides=(2, 2), padding="SAME",
                        name=f"conv{i}")(x)
            x = nn.leaky_relu(x, 0.2)
            if i < 2:
                x = nn.LayerNorm(name=f"norm{i}")(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(1, name="adv_layer")(x)


class MultiWindowDiscriminator(nn.Module):
    """Sum of single-window validities over random crops
    (multi_window_disc.py:46)."""

    time_lengths: tuple = (32, 64, 128)
    hidden: int = 128

    @nn.compact
    def __call__(self, mel, mel_len, rng, train: bool = False):
        """mel [B, T, M], mel_len [B] → summed validity [B, 1]."""
        validity = 0.0
        t = mel.shape[1]
        for wi, win in enumerate(self.time_lengths):
            k = jax.random.fold_in(rng, wi)
            max_start = jnp.maximum(jnp.min(mel_len) - win, 0)
            start = jax.random.randint(k, (), 0, jnp.maximum(max_start, 1))
            start = jnp.minimum(start, t - win)
            crop = jax.lax.dynamic_slice_in_dim(mel, start, win, axis=1)
            v = SingleWindowDisc(self.hidden, name=f"win{win}")(
                crop[..., None], train=train)
            validity = validity + v
        return validity


@dataclasses.dataclass(frozen=True)
class AdvTTSTaskConfig:
    fs2: FS2TaskConfig = FS2TaskConfig()
    disc_windows: tuple = (32, 64, 128)
    disc_hidden: int = 128
    lambda_adv: float = 0.05            # ps_adv lambda_mel_adv
    optim_disc: OptimConfig = OptimConfig(
        optimizer="adamw", lr=2e-4, schedule="constant", beta1=0.5,
        beta2=0.999, clip_grad_norm=1.0)


class AdvTTSTask:
    """Groups: 'disc' (critic) then 'model' (FS2 generator + adv term)."""

    def __init__(self, cfg: AdvTTSTaskConfig):
        self.cfg = cfg
        self.fs2_task = FS2Task(cfg.fs2)
        self.disc = MultiWindowDiscriminator(cfg.disc_windows, cfg.disc_hidden)

    def init_params(self, rng: jax.Array) -> dict:
        k1, k2 = jax.random.split(rng)
        params = self.fs2_task.init_params(k1)
        f = max(self.cfg.disc_windows) * 2
        mel = jnp.zeros((1, f, self.cfg.fs2.model.n_mels))
        params["disc"] = self.disc.init(
            k2, mel, jnp.full((1,), f, jnp.int32), jax.random.PRNGKey(0))
        return params

    def _gen_mel(self, params, batch):
        out = self.fs2_task.model.apply(
            params["model"], batch["txt_tokens"], mel2ph=batch["mel2ph"],
            f0=batch.get("f0"), uv=batch.get("uv"), infer=False)
        return out["mel_out"]

    def _model_loss(self, params, batch, rng):
        total, metrics = self.fs2_task._loss(params, batch, rng)
        mel_p = self._gen_mel(params, batch)
        d_params = jax.lax.stop_gradient(params["disc"])
        v = self.disc.apply(d_params, mel_p, batch["mel_lengths"], rng)
        adv = jnp.mean((v - 1.0) ** 2) * self.cfg.lambda_adv
        metrics = dict(metrics)
        metrics["adv"] = adv
        total = total + adv
        metrics["total_loss"] = total
        return total, metrics

    def _disc_loss(self, params, batch, rng):
        mel_p = jax.lax.stop_gradient(self._gen_mel(params, batch))
        v_fake = self.disc.apply(params["disc"], mel_p,
                                 batch["mel_lengths"], rng)
        v_real = self.disc.apply(params["disc"], batch["mels"],
                                 batch["mel_lengths"], rng)
        loss = jnp.mean((v_real - 1.0) ** 2) + jnp.mean(v_fake ** 2)
        return loss, {"d_loss": loss}

    @property
    def loss_fns(self) -> Mapping[str, object]:
        return {"disc": self._disc_loss, "model": self._model_loss}

    @property
    def optim_cfgs(self) -> Mapping[str, OptimConfig]:
        return {"disc": self.cfg.optim_disc, "model": self.cfg.fs2.optim}

    def val_loss_fn(self, params, batch, rng):
        return self.fs2_task._loss(params, batch, rng)


# ---------------------------------------------------------------------------
# PortaSpeech adversarial recipe — the reference's actual ps_adv task
# (its shipped TTS checkpoint is `ps_adv_baseline`, audio-chatgpt.py:286)
# ---------------------------------------------------------------------------

from audiogpt_tpu.train.tasks.portaspeech import (  # noqa: E402
    PortaSpeechTask, PortaSpeechTaskConfig,
)


@dataclasses.dataclass(frozen=True)
class PortaSpeechAdvTaskConfig:
    ps: PortaSpeechTaskConfig = PortaSpeechTaskConfig()
    disc_windows: tuple = (32, 64, 128)
    disc_hidden: int = 128
    lambda_adv: float = 0.05            # ps_adv lambda_mel_adv
    optim_disc: OptimConfig = OptimConfig(
        optimizer="adamw", lr=2e-4, schedule="constant", beta1=0.5,
        beta2=0.999, clip_grad_norm=1.0)


class PortaSpeechAdvTask:
    """ps_adv (NeuralSeq/tasks/tts/ps_adv.py): PortaSpeech FVAE generator +
    LSGAN multi-window mel critic. Groups: 'disc' then 'model'."""

    def __init__(self, cfg: PortaSpeechAdvTaskConfig):
        self.cfg = cfg
        self.ps_task = PortaSpeechTask(cfg.ps)
        self.model = self.ps_task.model            # for engine export
        self.disc = MultiWindowDiscriminator(cfg.disc_windows, cfg.disc_hidden)

    def init_params(self, rng: jax.Array) -> dict:
        k1, k2 = jax.random.split(rng)
        params = self.ps_task.init_params(k1)
        f = max(self.cfg.disc_windows) * 2
        mel = jnp.zeros((1, f, self.cfg.ps.model.n_mels))
        params["disc"] = self.disc.init(
            k2, mel, jnp.full((1,), f, jnp.int32), jax.random.PRNGKey(0))
        return params

    def _model_loss(self, params, batch, rng):
        total, metrics, out = self.ps_task.forward_and_losses(
            params, batch, rng)
        d_params = jax.lax.stop_gradient(params["disc"])
        v = self.disc.apply(d_params, out["mel_out"],
                            batch["mel_lengths"], rng)
        adv = jnp.mean((v - 1.0) ** 2) * self.cfg.lambda_adv
        metrics = dict(metrics)
        metrics["adv"] = adv
        total = total + adv
        metrics["total_loss"] = total
        return total, metrics

    def _disc_loss(self, params, batch, rng):
        _, _, out = self.ps_task.forward_and_losses(
            jax.lax.stop_gradient({"model": params["model"]}), batch, rng)
        mel_p = jax.lax.stop_gradient(out["mel_out"])
        v_fake = self.disc.apply(params["disc"], mel_p,
                                 batch["mel_lengths"], rng)
        v_real = self.disc.apply(params["disc"], batch["mels"],
                                 batch["mel_lengths"], rng)
        loss = jnp.mean((v_real - 1.0) ** 2) + jnp.mean(v_fake ** 2)
        return loss, {"d_loss": loss}

    @property
    def loss_fns(self) -> Mapping[str, object]:
        return {"disc": self._disc_loss, "model": self._model_loss}

    @property
    def optim_cfgs(self) -> Mapping[str, OptimConfig]:
        return {"disc": self.cfg.optim_disc, "model": self.cfg.ps.optim}

    def val_loss_fn(self, params, batch, rng):
        return self.ps_task._loss(params, batch, rng)
