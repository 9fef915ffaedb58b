"""Sound-event-detection training task (AudioSet tagging).

Reference: ``audio_detection/audio_infer/pytorch/main.py`` (377 LoC trainer:
clipwise BCE on AudioSet labels with mixup; the framewise head trains from
the clipwise objective via the attention pooling). Here: clipwise BCE (+
optional framewise BCE when strong labels exist) over the PANN-SED model,
with on-device mixup.

Batch schema: {"wav": [B, T], "wav_len": [B], "target": [B, 527] multi-hot,
optional "frame_target": [B, frames, 527], "weight": [B]}.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp

from audiogpt_tpu.models.sed.panns_sed import SEDConfig, SEDModel
from audiogpt_tpu.train.optim import OptimConfig


def _bce(logits_or_probs, target, from_probs: bool = True):
    if from_probs:
        p = jnp.clip(logits_or_probs, 1e-7, 1 - 1e-7)
        return -(target * jnp.log(p) + (1 - target) * jnp.log1p(-p))
    z = logits_or_probs
    return jnp.maximum(z, 0) - z * target + jnp.log1p(jnp.exp(-jnp.abs(z)))


@dataclasses.dataclass(frozen=True)
class SEDTaskConfig:
    model: SEDConfig = SEDConfig()
    mixup_alpha: float = 1.0        # main.py mixup augmentation
    lambda_frame: float = 1.0
    optim: OptimConfig = OptimConfig(
        optimizer="adam", lr=1e-3, schedule="constant", beta1=0.9,
        beta2=0.999, clip_grad_norm=1.0)


class SEDTask:
    def __init__(self, cfg: SEDTaskConfig):
        self.cfg = cfg
        self.model = SEDModel(cfg.model)

    def init_params(self, rng: jax.Array) -> dict:
        sr = self.cfg.model.sample_rate
        return {"model": self.model.init(rng, jnp.zeros((1, sr)),
                                         jnp.asarray([sr]))}

    def _loss(self, params, batch, rng):
        cfg = self.cfg
        wav = batch["wav"]
        target = batch["target"].astype(jnp.float32)
        if cfg.mixup_alpha > 0:
            k1, k2 = jax.random.split(rng)
            lam = jax.random.beta(k1, cfg.mixup_alpha, cfg.mixup_alpha, ())
            perm = jax.random.permutation(k2, wav.shape[0])
            wav = lam * wav + (1 - lam) * wav[perm]
            target = lam * target + (1 - lam) * target[perm]
        out = self.model.apply(params["model"], wav,
                               batch.get("wav_len"), train=False)
        w = batch.get("weight")
        err = _bce(out["clipwise_output"], target)
        if w is not None:
            err = err * w[:, None]
            denom = jnp.maximum(w.sum() * target.shape[-1], 1.0)
        else:
            denom = err.size
        metrics = {"clip_bce": err.sum() / denom}
        if "frame_target" in batch and cfg.lambda_frame > 0:
            ft = batch["frame_target"].astype(jnp.float32)
            fw = out["framewise_output"][:, : ft.shape[1]]
            ferr = _bce(fw, ft)
            if w is not None:
                ferr = ferr * w[:, None, None]
            metrics["frame_bce"] = ferr.mean() * cfg.lambda_frame
        total = sum(metrics.values())
        metrics["total_loss"] = total
        return total, metrics

    @property
    def loss_fns(self) -> Mapping[str, object]:
        return {"model": self._loss}

    @property
    def optim_cfgs(self) -> Mapping[str, OptimConfig]:
        return {"model": self.cfg.optim}
