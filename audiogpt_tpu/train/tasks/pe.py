"""Pitch-extractor training task (``NeuralSeq/tasks/tts/pe.py``): f0 L1 +
uv BCE on gt mels. Batch schema: {"mels", "f0", "uv", "weight"}."""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax

from audiogpt_tpu.models.tts.pitch_extractor import (
    PitchExtractor, PitchExtractorConfig,
)
from audiogpt_tpu.models.tts.fastspeech2 import norm_f0
from audiogpt_tpu.train import losses as L
from audiogpt_tpu.train.optim import OptimConfig


@dataclasses.dataclass(frozen=True)
class PETaskConfig:
    model: PitchExtractorConfig = PitchExtractorConfig()
    lambda_f0: float = 1.0
    lambda_uv: float = 1.0
    optim: OptimConfig = OptimConfig()


class PETask:
    def __init__(self, cfg: PETaskConfig):
        self.cfg = cfg
        self.model = PitchExtractor(cfg.model)

    def init_params(self, rng: jax.Array) -> dict:
        import jax.numpy as jnp

        return {"model": self.model.init(
            rng, jnp.zeros((1, 16, self.cfg.model.n_mels)))}

    def _loss(self, params, batch, rng):
        import jax.numpy as jnp

        cfg = self.cfg
        out = self.model.apply(params["model"], batch["mels"])
        f0, uv = batch["f0"], batch["uv"]
        f0n = norm_f0(f0, uv, cfg.model._fs2_like)
        nonpad_src = (jnp.abs(batch["mels"]).sum(-1) > 0).astype(jnp.int32)
        metrics = L.f0_loss(out["pitch_pred"], f0n, uv, nonpad_src,
                            batch.get("weight"), lambda_f0=cfg.lambda_f0,
                            lambda_uv=cfg.lambda_uv,
                            use_uv=cfg.model.use_uv)
        total = sum(metrics.values())
        metrics["total_loss"] = total
        return total, metrics

    @property
    def loss_fns(self) -> Mapping[str, object]:
        return {"model": self._loss}

    @property
    def optim_cfgs(self) -> Mapping[str, OptimConfig]:
        return {"model": self.cfg.optim}
