"""CLAP contrastive pre-training (audio↔text) — the reference vendors the
full open_clap training stack (``ldm/modules/encoders/open_clap/``: CLAP
model ``model.py:422``, ``loss.py`` ClipLoss with learned temperature and
cross-GPU feature gathering via ``torch.distributed.all_gather``).

TPU re-design: both towers + the learned ``logit_scale`` live in one params
tree; the symmetric InfoNCE runs on the GLOBAL batch — under the pjit
trainer the batch is sharded over the ``data`` mesh axis and the
``audio @ text.T`` similarity matrix makes XLA insert the all-gather
automatically (GSPMD), replacing open_clap's explicit ``gather_features``
(loss.py) with compiler-scheduled ICI collectives.

Dummy padding rows (``weight == 0``) are excluded from both the softmax
normalization and the loss average via additive masking.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from audiogpt_tpu.models.textenc.clap import (
    CLAPAudioEncoder, CLAPTextConfig, CLAPTextEncoder,
)
from audiogpt_tpu.train.optim import OptimConfig


class CLAPModel(nn.Module):
    """Both towers + learned temperature (open_clap ``CLAP`` model:
    ``logit_scale_a/t`` init log(1/0.07), model.py)."""

    text_cfg: CLAPTextConfig
    d_proj: int = 1024
    audio_cfg: object | None = None  # Cnn14Config override (None = ckpt layout)

    def setup(self):
        self.text_tower = CLAPTextEncoder(self.text_cfg, name="text")
        self.audio_tower = CLAPAudioEncoder(self.d_proj, cnn14=self.audio_cfg,
                                            name="audio")
        init = nn.initializers.constant(jnp.log(1.0 / 0.07))
        self.logit_scale = self.param("logit_scale", init, ())

    def __call__(self, wav, tokens, attention_mask=None, wav_len=None):
        a = self.audio_tower(wav, wav_len)
        t = self.text_tower.cls_embedding(tokens, attention_mask)
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
        t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-8)
        return a, t, jnp.exp(jnp.clip(self.logit_scale, -10.0, jnp.log(100.0)))


@dataclasses.dataclass(frozen=True)
class CLAPTaskConfig:
    text: CLAPTextConfig = CLAPTextConfig()
    d_proj: int = 1024
    #: optional Cnn14Config for the audio tower (None = PANN ckpt layout);
    #: narrow towers keep CPU-mesh tests/tools inside XLA's 40 s in-process
    #: collective-rendezvous termination window on starved hosts.
    audio: object | None = None
    optim: OptimConfig = OptimConfig(
        optimizer="adamw", lr=1e-4, schedule="constant", beta2=0.98,
        weight_decay=0.0)


class CLAPTask:
    """Batch schema: wav [B, T] (tower sample rate), text_ids [B, L],
    text_mask [B, L], weight [B]."""

    def __init__(self, cfg: CLAPTaskConfig):
        self.cfg = cfg
        self.model = CLAPModel(cfg.text, cfg.d_proj, cfg.audio)

    def init_params(self, rng: jax.Array) -> dict:
        # ≥ 32×hop samples so the Cnn14 tower keeps ≥1 frame after pooling
        params = self.model.init(
            rng, jnp.zeros((1, 10240)), jnp.ones((1, 8), jnp.int32),
            jnp.ones((1, 8), jnp.int32))
        return {"model": params}

    @staticmethod
    def _masked_infonce(logits, weight):
        """Cross-entropy along axis 1 with invalid columns masked out and
        invalid rows zero-weighted; diagonal is the positive pair."""
        neg = jnp.where(weight[None, :] > 0, 0.0, -1e9)
        logp = jax.nn.log_softmax(logits + neg, axis=1)
        diag = jnp.diagonal(logp)
        return -(diag * weight).sum() / jnp.maximum(weight.sum(), 1.0)

    def _loss(self, params, batch, rng):
        a, t, scale = self.model.apply(
            params["model"], batch["wav"], batch["text_ids"],
            batch.get("text_mask"), batch.get("wav_len"))
        w = batch.get("weight")
        if w is None:
            w = jnp.ones(a.shape[0], a.dtype)
        logits_at = scale * (a @ t.T)          # global matmul → GSPMD gather
        loss_a = self._masked_infonce(logits_at, w)
        loss_t = self._masked_infonce(logits_at.T, w)
        loss = 0.5 * (loss_a + loss_t)
        acc = (jnp.argmax(logits_at + jnp.where(w[None, :] > 0, 0., -1e9),
                          axis=1) == jnp.arange(a.shape[0])).astype(jnp.float32)
        metrics = {"total_loss": loss, "nce_a": loss_a, "nce_t": loss_t,
                   "scale": scale,
                   "acc": (acc * w).sum() / jnp.maximum(w.sum(), 1.0)}
        return loss, metrics

    @property
    def loss_fns(self) -> Mapping[str, object]:
        return {"model": self._loss}

    @property
    def optim_cfgs(self) -> Mapping[str, OptimConfig]:
        return {"model": self.cfg.optim}
