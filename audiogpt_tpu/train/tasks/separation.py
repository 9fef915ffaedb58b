"""Speech separation / enhancement training task — SI-SNR with permutation
invariance.

Reference: the ESPnet ConvTasNet models behind Speech_Enh/Speech_SS train
with negative SI-SNR + utterance-level PIT (ESPnet enh recipes; AudioGPT
ships them as external checkpoints). n_src=1 degenerates to plain SI-SNR
(enhancement).

Batch schema: {"mix": [B, T], "sources": [B, n_src, T], "weight": [B]}.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Mapping

import jax
import jax.numpy as jnp

from audiogpt_tpu.models.separation.convtasnet import (
    ConvTasNet, ConvTasNetConfig,
)
from audiogpt_tpu.train.optim import OptimConfig


def si_snr(est: jnp.ndarray, ref: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Scale-invariant SNR in dB over the last axis."""
    est = est - est.mean(-1, keepdims=True)
    ref = ref - ref.mean(-1, keepdims=True)
    proj = (jnp.sum(est * ref, -1, keepdims=True) /
            (jnp.sum(ref * ref, -1, keepdims=True) + eps)) * ref
    noise = est - proj
    ratio = (proj * proj).sum(-1) / ((noise * noise).sum(-1) + eps)
    return 10.0 * jnp.log10(ratio + eps)


def pit_si_snr(est: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Best-permutation mean SI-SNR. est/ref [B, n_src, T]; n_src small so
    the permutation set is enumerated statically."""
    n = est.shape[1]
    scores = []
    for perm in itertools.permutations(range(n)):
        scores.append(si_snr(est[:, list(perm)], ref).mean(-1))  # [B]
    return jnp.stack(scores, -1).max(-1)                          # [B]


@dataclasses.dataclass(frozen=True)
class SeparationTaskConfig:
    model: ConvTasNetConfig = ConvTasNetConfig()
    optim: OptimConfig = OptimConfig(
        optimizer="adam", lr=1e-3, schedule="constant", clip_grad_norm=5.0)


class SeparationTask:
    def __init__(self, cfg: SeparationTaskConfig):
        self.cfg = cfg
        self.model = ConvTasNet(cfg.model)

    def init_params(self, rng: jax.Array) -> dict:
        return {"model": self.model.init(
            rng, jnp.zeros((1, self.cfg.model.sample_rate)))}

    def _loss(self, params, batch, rng):
        est = self.model.apply(params["model"], batch["mix"])  # [B, n_src, T]
        snr = pit_si_snr(est, batch["sources"])                # [B]
        w = batch.get("weight")
        if w is not None:
            loss = -(snr * w).sum() / jnp.maximum(w.sum(), 1.0)
        else:
            loss = -snr.mean()
        return loss, {"neg_si_snr": loss, "total_loss": loss}

    @property
    def loss_fns(self) -> Mapping[str, object]:
        return {"model": self._loss}

    @property
    def optim_cfgs(self) -> Mapping[str, OptimConfig]:
        return {"model": self.cfg.optim}
