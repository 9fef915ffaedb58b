"""Audio-captioning training task (teacher-forced cross-entropy).

Reference: the A2T captioner trains in its own repo
(``audio_to_text/captioning/`` — the AudioGPT tree ships inference only);
objective is standard label-smoothed CE over shifted-right tokens.

Batch schema: {"wav": [B, T], "wav_len": [B], "tokens": [B, L] with <sos>
prefix and <eos> termination, "token_len": [B], "weight": [B]}.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp

from audiogpt_tpu.models.caption.captioner import CaptionConfig, CaptionModel
from audiogpt_tpu.train.optim import OptimConfig


@dataclasses.dataclass(frozen=True)
class CaptionTaskConfig:
    model: CaptionConfig = CaptionConfig()
    label_smoothing: float = 0.1
    optim: OptimConfig = OptimConfig(
        optimizer="adam", lr=5e-4, schedule="rsqrt", warmup_steps=5000,
        hidden_size=256, clip_grad_norm=1.0)


class CaptionTask:
    def __init__(self, cfg: CaptionTaskConfig):
        self.cfg = cfg
        self.model = CaptionModel(cfg.model)

    def init_params(self, rng: jax.Array) -> dict:
        sr = 32000
        return {"model": self.model.init(
            rng, jnp.zeros((1, sr)), jnp.zeros((1, 4), jnp.int32),
            jnp.asarray([sr]))}

    def _loss(self, params, batch, rng):
        cfg = self.cfg
        tokens = batch["tokens"]
        logits = self.model.apply(params["model"], batch["wav"],
                                  tokens[:, :-1], batch.get("wav_len"))
        target = tokens[:, 1:]
        v = logits.shape[-1]
        logp = jax.nn.log_softmax(logits)
        smooth = cfg.label_smoothing
        onehot = jax.nn.one_hot(target, v) * (1 - smooth) + smooth / v
        nll = -(onehot * logp).sum(-1)                    # [B, L-1]
        mask = (jnp.arange(target.shape[1])[None]
                < (batch["token_len"][:, None] - 1)).astype(jnp.float32)
        w = batch.get("weight")
        if w is not None:
            mask = mask * w[:, None]
        loss = (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        acc = ((jnp.argmax(logits, -1) == target) * mask).sum() / \
            jnp.maximum(mask.sum(), 1.0)
        return loss, {"ce": loss, "token_acc": acc, "total_loss": loss}

    @property
    def loss_fns(self) -> Mapping[str, object]:
        return {"model": self._loss}

    @property
    def optim_cfgs(self) -> Mapping[str, OptimConfig]:
        return {"model": self.cfg.optim}
