"""PortaSpeech / SyntaSpeech training task.

Reference: ``PortaSpeechTask`` (``NeuralSeq/tasks/tts/ps.py``): mel L1+SSIM,
KL with a floor and a linear ramp over ``kl_start_steps`` (ps.py:55-59),
word-level duration L1 in log(1+d) domain plus optional sentence-duration L1
(add_dur_loss, ps.py:86-101). The SyntaSpeech task (``tasks/tts/synta.py``)
is the same recipe over the graph-augmented model.

The KL ramp needs the global step inside the jitted loss; the Trainer
injects ``batch["step"]`` (a traced scalar) into every training batch.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp

from audiogpt_tpu.models.tts.portaspeech import (
    PortaSpeech, PortaSpeechConfig, mel2word_to_dur,
)
from audiogpt_tpu.train import losses as L
from audiogpt_tpu.train.optim import OptimConfig
from audiogpt_tpu.train.ssim import ssim_loss


@dataclasses.dataclass(frozen=True)
class PortaSpeechTaskConfig:
    model: PortaSpeechConfig = PortaSpeechConfig()
    lambda_mel: float = 1.0
    lambda_ssim: float = 1.0
    lambda_kl: float = 1.0          # ps.yaml lambda_kl
    kl_min: float = 0.0             # ps.yaml kl_min
    kl_start_steps: int = 10000     # ps.yaml kl_start_steps
    lambda_word_dur: float = 1.0    # fs2.yaml lambda_word_dur
    lambda_sent_dur: float = 0.0    # ps.yaml lambda_sent_dur
    optim: OptimConfig = OptimConfig()


class PortaSpeechTask:
    def __init__(self, cfg: PortaSpeechTaskConfig):
        self.cfg = cfg
        self.model = PortaSpeech(cfg.model)

    def init_params(self, rng: jax.Array) -> dict:
        mcfg = self.cfg.model
        t, w, f = 16, 8, mcfg.fvae_strides * 8
        kw = {}
        if mcfg.use_graph:
            kw["graph_adj"] = jnp.zeros((1, mcfg.n_edge_types, w, w))
        params = self.model.init(
            rng, jnp.ones((1, t), jnp.int32), jnp.ones((1, w), jnp.int32),
            jnp.ones((1, t), jnp.int32),
            mel2word=jnp.ones((1, f), jnp.int32),
            tgt_mels=jnp.zeros((1, f, mcfg.n_mels)), rng=rng, **kw)
        return {"model": params}

    def _word_dur_loss(self, dur_pred, mel2word, word_tokens, weight):
        """log(1+d) L1 over words + optional sentence-total L1 (ps.py:86)."""
        cfg = self.cfg
        max_words = word_tokens.shape[1]
        dur_gt = mel2word_to_dur(mel2word, max_words)
        nonpad = (word_tokens > 0).astype(jnp.float32)
        if weight is not None:
            nonpad = nonpad * weight[:, None]
        wdur = jnp.abs(jnp.log1p(dur_pred) - jnp.log1p(dur_gt)) * nonpad
        out = {"wdur": wdur.sum() / jnp.maximum(nonpad.sum(), 1.0)
               * cfg.lambda_word_dur}
        if cfg.lambda_sent_dur > 0:
            sent_p = (dur_pred * nonpad).sum(-1)
            sent_g = (dur_gt * nonpad).sum(-1)
            rw = weight if weight is not None else jnp.ones_like(sent_p)
            out["sdur"] = (jnp.abs(sent_p - sent_g) * rw).sum() / \
                jnp.maximum(rw.sum(), 1.0) * cfg.lambda_sent_dur
        return out

    def _loss(self, params, batch, rng):
        total, metrics, _out = self.forward_and_losses(params, batch, rng)
        return total, metrics

    def forward_and_losses(self, params, batch, rng):
        """(total, metrics, model_out) — reused by the adversarial recipe."""
        cfg = self.cfg
        mel2word = batch.get("mel2word")
        if mel2word is None:
            # no word alignment in the corpus → uniform frames-per-word
            mel2word = L.uniform_mel2ph(batch["word_lengths"],
                                        batch["mel_lengths"],
                                        batch["mels"].shape[1])
        out = self.model.apply(
            params["model"], batch["txt_tokens"], batch["word_tokens"],
            batch["ph2word"], mel2word=mel2word, tgt_mels=batch["mels"],
            graph_adj=batch.get("graph_adj"),
            spk_id=batch.get("spk_ids") if cfg.model.num_spk > 0 else None,
            rng=rng, infer=False)

        w = batch.get("weight")
        metrics = {}
        target = batch["mels"]
        mel_mask = L.weights_nonzero_speech(target)
        if w is not None:
            mel_mask = mel_mask * w[:, None]
        metrics["mel"] = L.mel_l1_loss(out["mel_out"], target, w) * cfg.lambda_mel
        if cfg.lambda_ssim > 0:
            metrics["ssim"] = ssim_loss(out["mel_out"], target, mel_mask) * \
                cfg.lambda_ssim
        # KL: floor + linear warmup over kl_start_steps (ps.py:55-59)
        step = batch.get("step", jnp.asarray(cfg.kl_start_steps))
        ramp = jnp.clip(step.astype(jnp.float32) /
                        max(cfg.kl_start_steps, 1), 0.0, 1.0)
        metrics["kl_v"] = out["kl"]
        metrics["kl"] = jnp.maximum(out["kl"], cfg.kl_min) * ramp * cfg.lambda_kl
        metrics.update(self._word_dur_loss(out["dur"], mel2word,
                                           batch["word_tokens"], w))
        total = sum(v for k, v in metrics.items() if k != "kl_v")
        metrics["total_loss"] = total
        return total, metrics, out

    def visualize(self, params, batch, rng):
        """First validation item's gt/pred mel (PortaSpeechTask
        save_valid_result parity)."""
        _, _, out = self.forward_and_losses(params, batch, rng)
        if "mel_lengths" in batch:
            n = int(jnp.asarray(batch["mel_lengths"])[0])
        else:
            n = int((jnp.abs(batch["mels"][0]).sum(-1) > 0).sum())
        n = max(n, 1)
        return {"mel_0": (out["mel_out"][0, :n], batch["mels"][0, :n])}

    @property
    def loss_fns(self) -> Mapping[str, object]:
        return {"model": self._loss}

    @property
    def optim_cfgs(self) -> Mapping[str, OptimConfig]:
        return {"model": self.cfg.optim}
