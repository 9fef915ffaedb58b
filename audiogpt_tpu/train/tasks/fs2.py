"""FastSpeech2 training task.

Reference: ``FastSpeech2Task`` (``NeuralSeq/tasks/tts/fs2.py:27``): mel
L1 (+SSIM), log-domain duration MSE, frame-level f0 L1 + uv BCE, optional
energy — all masked by padding. This recipe reproduces those losses over the
static-shape batches emitted by :mod:`audiogpt_tpu.data.loader`.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax

from audiogpt_tpu.models.tts.fastspeech2 import FastSpeech2, FastSpeech2Config, norm_f0
from audiogpt_tpu.train import losses as L
from audiogpt_tpu.train.optim import OptimConfig
from audiogpt_tpu.train.ssim import ssim_loss


@dataclasses.dataclass(frozen=True)
class FS2TaskConfig:
    model: FastSpeech2Config = FastSpeech2Config()
    lambda_mel: float = 1.0
    lambda_ssim: float = 1.0        # config_base tts: ssim on by default
    lambda_ph_dur: float = 0.1
    lambda_sent_dur: float = 1.0
    lambda_f0: float = 1.0
    lambda_uv: float = 1.0
    lambda_energy: float = 0.1  # fs2 task add_energy_loss
    optim: OptimConfig = OptimConfig()


class FS2Task:
    def __init__(self, cfg: FS2TaskConfig):
        self.cfg = cfg
        self.model = FastSpeech2(cfg.model)

    def init_params(self, rng: jax.Array) -> dict:
        import jax.numpy as jnp
        t, f = 16, 64
        params = self.model.init(
            rng, jnp.ones((1, t), jnp.int32),
            mel2ph=jnp.ones((1, f), jnp.int32),
            f0=jnp.zeros((1, f)), uv=jnp.zeros((1, f)))
        return {"model": params}

    def _loss(self, params, batch, rng):
        cfg = self.cfg
        mcfg = cfg.model
        f0 = batch.get("f0")
        uv = batch.get("uv")
        if uv is None and f0 is not None:
            uv = (f0 == 0).astype(f0.dtype)
        f0n = norm_f0(f0, uv, mcfg) if f0 is not None else None
        mel2ph = batch.get("mel2ph")
        if mel2ph is None:
            # no forced alignment in the corpus → uniform fallback
            mel2ph = L.uniform_mel2ph(batch["txt_lengths"],
                                      batch["mel_lengths"],
                                      batch["mels"].shape[1])
            batch = dict(batch)
            batch["mel2ph"] = mel2ph
        out = self.model.apply(
            params["model"], batch["txt_tokens"],
            mel2ph=batch["mel2ph"], f0=f0n, uv=uv,
            spk_id=batch.get("spk_ids") if mcfg.num_spk > 0 else None,
            infer=False)

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
        metrics.update(L.dur_loss(
            out["dur"], batch["mel2ph"], batch["txt_tokens"], w,
            lambda_ph=cfg.lambda_ph_dur, lambda_sent=cfg.lambda_sent_dur))
        if mcfg.use_pitch_embed and mcfg.pitch_type == "cwt" \
                and "cwt_spec" in batch:
            # CWT-domain pitch losses (fs2 task add_pitch_loss 'cwt' branch)
            import jax.numpy as jnp

            nonpad = (batch["mel2ph"] > 0).astype(jnp.float32)
            if w is not None:
                nonpad = nonpad * w[:, None]
            cwt_pred = out["cwt"][..., :10]
            metrics["cwt"] = (jnp.abs(cwt_pred - batch["cwt_spec"])
                              * nonpad[..., None]).sum() / \
                jnp.maximum(nonpad.sum() * 10, 1.0) * cfg.lambda_f0
            if mcfg.use_uv and uv is not None:
                logits = out["cwt"][..., -1]
                bce = jnp.maximum(logits, 0) - logits * uv + \
                    jnp.log1p(jnp.exp(-jnp.abs(logits)))
                metrics["uv"] = L.masked_mean(bce, nonpad) * cfg.lambda_uv
            if "f0_mean" in batch:
                rw = w if w is not None else jnp.ones_like(out["f0_mean"])
                metrics["f0_mean"] = (jnp.abs(out["f0_mean"] -
                                              batch["f0_mean"]) * rw).sum() / \
                    jnp.maximum(rw.sum(), 1.0) * cfg.lambda_f0
                metrics["f0_std"] = (jnp.abs(out["f0_std"] -
                                             batch["f0_std"]) * rw).sum() / \
                    jnp.maximum(rw.sum(), 1.0) * cfg.lambda_f0
        elif mcfg.use_pitch_embed and f0 is not None:
            metrics.update(L.f0_loss(
                out["pitch_pred"], f0n, uv, batch["mel2ph"], w,
                lambda_f0=cfg.lambda_f0, lambda_uv=cfg.lambda_uv,
                use_uv=mcfg.use_uv))
        if mcfg.use_energy_embed and "energy" in batch:
            metrics["e"] = L.energy_loss(out["energy_pred"], batch["energy"],
                                         lambda_energy=cfg.lambda_energy)
        total = sum(metrics.values())
        metrics["total_loss"] = total
        return total, metrics

    def visualize(self, params, batch, rng):
        """First validation item's gt/pred mel for figure logging
        (``FastSpeech2Task.save_valid_result`` parity)."""
        import jax.numpy as jnp

        mel2ph = batch.get("mel2ph")
        if mel2ph is None:
            mel2ph = L.uniform_mel2ph(batch["txt_lengths"],
                                      batch["mel_lengths"],
                                      batch["mels"].shape[1])
        f0 = batch.get("f0")
        uv = batch.get("uv")
        if uv is None and f0 is not None:
            uv = (f0 == 0).astype(f0.dtype)
        out = self.model.apply(
            params["model"], batch["txt_tokens"], mel2ph=mel2ph,
            f0=norm_f0(f0, uv, self.cfg.model) if f0 is not None else None,
            uv=uv, infer=False)
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
