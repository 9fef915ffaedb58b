"""GenerSpeech training task.

Reference: ``NeuralSeq/tasks/tts/`` GenerSpeech recipe — FS2 reconstruction
losses + VQ commitment (``prosody_util.py`` VQEmbeddingEMA), guided-attention
loss from the prosody aligners, pitch-inpainter losses, and the Glow
post-flow NLL (``run_post_glow``). The VQ codebooks update via EMA inside the
step (flax ``vq_stats`` mutable collection threaded through the state).

Batch schema = TTS loader schema (+ the target mel doubles as the style
reference, the standard self-reconstruction training setup).
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp

from audiogpt_tpu.models.tts.fastspeech2 import norm_f0
from audiogpt_tpu.models.tts.generspeech import GenerSpeech, GenerSpeechConfig
from audiogpt_tpu.train import losses as L
from audiogpt_tpu.train.optim import OptimConfig
from audiogpt_tpu.train.ssim import ssim_loss


@dataclasses.dataclass(frozen=True)
class GenerSpeechTaskConfig:
    model: GenerSpeechConfig = GenerSpeechConfig()
    lambda_mel: float = 1.0
    lambda_ssim: float = 1.0
    lambda_ph_dur: float = 0.1
    lambda_sent_dur: float = 1.0
    lambda_f0: float = 1.0
    lambda_uv: float = 1.0
    lambda_commit: float = 0.25     # VQ commitment (prosody_util.py:16)
    lambda_guided: float = 1.0
    lambda_postflow: float = 1.0
    optim: OptimConfig = OptimConfig()


class GenerSpeechTask:
    """Trains with ``vq_ema=False``: the codebook learns from the VQ-VAE
    codebook loss inside ``vq_commit``, so the whole step is a pure jitted
    function (no mutable-collection threading through the Trainer)."""

    def __init__(self, cfg: GenerSpeechTaskConfig):
        if cfg.model.vq_ema:
            import dataclasses as _dc

            cfg = _dc.replace(cfg, model=_dc.replace(cfg.model, vq_ema=False))
        self.cfg = cfg
        self.model = GenerSpeech(cfg.model)

    def init_params(self, rng: jax.Array) -> dict:
        t, f = 8, 16
        variables = self.model.init(
            {"params": rng}, jnp.ones((1, t), jnp.int32),
            jnp.zeros((1, f, self.cfg.model.fs2.n_mels)))
        return {"model": {"params": variables["params"]}}

    def _loss(self, params, batch, rng):
        cfg = self.cfg
        mcfg = cfg.model.fs2
        f0 = batch.get("f0")
        uv = batch.get("uv")
        if uv is None and f0 is not None:
            uv = (f0 == 0).astype(f0.dtype)
        f0n = norm_f0(f0, uv, mcfg) if f0 is not None else None
        if "mel2ph" not in batch:
            # unaligned corpus → uniform fallback (same policy as FS2Task)
            batch = dict(batch)
            batch["mel2ph"] = L.uniform_mel2ph(
                batch["txt_lengths"], batch["mel_lengths"],
                batch["mels"].shape[1])

        out = self.model.apply(
            params["model"], batch["txt_tokens"], batch["mels"],
            mel2ph=batch["mel2ph"], f0=f0n, uv=uv, train=True, rng=rng)

        w = batch.get("weight")
        target = batch["mels"]
        mel_mask = L.weights_nonzero_speech(target)
        if w is not None:
            mel_mask = mel_mask * w[:, None]
        metrics = {
            "mel": L.mel_l1_loss(out["mel_out"], target, w) * cfg.lambda_mel,
            "commit": out["vq_commit"] * cfg.lambda_commit,
            "guided": out["guided_attn"] * cfg.lambda_guided,
        }
        if cfg.lambda_ssim > 0:
            metrics["ssim"] = ssim_loss(out["mel_out"], target, mel_mask) \
                * cfg.lambda_ssim
        if "postflow_nll" in out:
            metrics["postflow"] = out["postflow_nll"] * cfg.lambda_postflow
        metrics.update(L.dur_loss(
            out["dur"], batch["mel2ph"], batch["txt_tokens"], w,
            lambda_ph=cfg.lambda_ph_dur, lambda_sent=cfg.lambda_sent_dur))
        if f0 is not None:
            metrics.update(L.f0_loss(
                out["pitch_pred"], f0n, uv, batch["mel2ph"], w,
                lambda_f0=cfg.lambda_f0, lambda_uv=cfg.lambda_uv,
                use_uv=mcfg.use_uv))
        total = sum(metrics.values())
        metrics["total_loss"] = total
        return total, metrics

    @property
    def loss_fns(self) -> Mapping[str, object]:
        return {"model": self._loss}

    @property
    def optim_cfgs(self) -> Mapping[str, OptimConfig]:
        return {"model": self.cfg.optim}
