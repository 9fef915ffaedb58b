"""DiffSinger (shallow-diffusion SVS/TTS) training task.

Reference: ``DiffSingerTask``/``DiffSpeechTask``
(``NeuralSeq/tasks/svs/diffsinger_task.py:30``) over ``GaussianDiffusion.p_losses``
(``modules/diff/shallow_diffusion_tts.py:233``): sample t ~ U[0, K_step),
noise the normalized gt mel, predict ε with the WaveNet denoiser conditioned
on the FS2 encoder output, L1 on ε; FS2 aux losses (duration, pitch) train
the conditioner jointly.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp

from audiogpt_tpu.models.svs.diffsinger import DiffSinger, DiffSingerConfig
from audiogpt_tpu.models.tts.fastspeech2 import norm_f0
from audiogpt_tpu.train import losses as L
from audiogpt_tpu.train.optim import OptimConfig


@dataclasses.dataclass(frozen=True)
class DiffSingerTaskConfig:
    model: DiffSingerConfig = DiffSingerConfig()
    lambda_diff: float = 1.0
    lambda_ph_dur: float = 0.1
    lambda_sent_dur: float = 1.0
    lambda_f0: float = 1.0
    lambda_uv: float = 1.0
    optim: OptimConfig = OptimConfig()


class DiffSingerTask:
    def __init__(self, cfg: DiffSingerTaskConfig):
        self.cfg = cfg
        self.model = DiffSinger(cfg.model)
        self.schedule = cfg.model.schedule()

    def init_params(self, rng: jax.Array) -> dict:
        t = 16
        kw = {}
        if self.cfg.model.fs2.use_midi:
            kw = dict(pitch_midi=jnp.ones((1, t), jnp.int32),
                      midi_dur=jnp.ones((1, t)),
                      is_slur=jnp.zeros((1, t), jnp.int32))
        params = self.model.init(rng, jnp.ones((1, t), jnp.int32),
                                 rng=jax.random.PRNGKey(0), **kw)
        return {"model": params}

    def _loss(self, params, batch, rng):
        cfg = self.cfg
        mcfg = cfg.model
        k1, k2 = jax.random.split(rng)

        fs2_kw = {}
        for src, dst in (("pitch_midi", "pitch_midi"), ("midi_dur", "midi_dur"),
                         ("is_slur", "is_slur")):
            if src in batch:
                fs2_kw[dst] = batch[src]
        f0 = batch.get("f0")
        uv = batch.get("uv")
        if uv is None and f0 is not None:
            uv = (f0 == 0).astype(f0.dtype)
        if f0 is not None:
            fs2_kw["f0"] = norm_f0(f0, uv, mcfg.fs2)
            fs2_kw["uv"] = uv

        if "mel2ph" not in batch:
            # unaligned corpus → uniform fallback (same policy as FS2Task)
            batch = dict(batch)
            batch["mel2ph"] = L.uniform_mel2ph(
                batch["txt_lengths"], batch["mel_lengths"],
                batch["mels"].shape[1])

        fs2_out = self.model.apply(
            params["model"], batch["txt_tokens"], mel2ph=batch["mel2ph"],
            ref_mels=batch["mels"], **fs2_kw,
            method=DiffSinger.train_loss_inputs_full)

        cond, x0, aux = fs2_out
        b = x0.shape[0]
        t = jax.random.randint(k1, (b,), 0, mcfg.K_step)
        noise = jax.random.normal(k2, x0.shape)
        x_t = self.schedule.q_sample(x0, t, noise)
        eps = self.model.apply(params["model"], x_t, t, cond,
                               method=DiffSinger.denoise)

        w = batch.get("weight")
        frame_mask = (batch["mel2ph"] > 0).astype(jnp.float32)
        if w is not None:
            frame_mask = frame_mask * w[:, None]
        metrics = {
            "diff": (jnp.abs(eps - noise) * frame_mask[..., None]).sum()
            / jnp.maximum(frame_mask.sum() * x0.shape[-1], 1.0) * cfg.lambda_diff
        }
        metrics.update(L.dur_loss(
            aux["dur"], batch["mel2ph"], batch["txt_tokens"], w,
            lambda_ph=cfg.lambda_ph_dur, lambda_sent=cfg.lambda_sent_dur))
        if mcfg.fs2.use_pitch_embed and f0 is not None:
            metrics.update(L.f0_loss(
                aux["pitch_pred"], fs2_kw["f0"], uv, batch["mel2ph"], w,
                lambda_f0=cfg.lambda_f0, lambda_uv=cfg.lambda_uv,
                use_uv=mcfg.fs2.use_uv))
        total = sum(metrics.values())
        metrics["total_loss"] = total
        return total, metrics

    @property
    def loss_fns(self) -> Mapping[str, object]:
        return {"model": self._loss}

    @property
    def optim_cfgs(self) -> Mapping[str, OptimConfig]:
        return {"model": self.cfg.optim}
