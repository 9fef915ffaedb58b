"""DiffSinger — shallow-diffusion singing-voice synthesis, TPU-native.

Re-design of the reference stack:
  * ``GaussianDiffusion`` (``NeuralSeq/modules/diff/shallow_diffusion_tts.py:71``)
    — FastSpeech2MIDI conditioner + K-step shallow diffusion over the mel,
  * ``DiffNet`` WaveNet-style denoiser (``modules/diff/net.py:81``),
  * ``FastSpeech2MIDI`` (``modules/diffsinger_midi/fs2.py:46``) — adds
    midi-pitch / midi-duration / slur embeddings to the token embedding.

TPU re-design: the K-step ancestral loop is the shared ``ddpm_sample``
``lax.scan`` (one jit); the PLMS speedup is ``plms_interval_sample`` below
(DiffSinger's interval variant, shallow_diffusion_tts.py:169). NWC layouts.

Config (ds1000 / opencpop, ``egs/egs_bases/svs/...``): hidden 256,
residual_layers 20, residual_channels 256, dilation_cycle 4 (ds1000) or 1,
timesteps 1000, K_step 1000, linear betas 1e-4→max_beta.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audiogpt_tpu.models.diffusion.samplers import DiffusionSchedule, ddpm_sample
from audiogpt_tpu.models.tts.fastspeech2 import FastSpeech2, FastSpeech2Config


@dataclasses.dataclass(frozen=True)
class DiffNetConfig:
    mel_bins: int = 80
    encoder_hidden: int = 256
    residual_layers: int = 20
    residual_channels: int = 256
    dilation_cycle_length: int = 4


@dataclasses.dataclass(frozen=True)
class DiffSingerConfig:
    fs2: FastSpeech2Config = FastSpeech2Config(use_midi=True, rel_pos=True,
                                               use_pitch_embed=False)
    net: DiffNetConfig = DiffNetConfig()
    timesteps: int = 1000
    K_step: int = 1000
    max_beta: float = 0.02
    schedule_type: str = "linear"
    spec_min: Sequence[float] = (-6.0,) * 80
    spec_max: Sequence[float] = (1.5,) * 80
    gaussian_start: bool = True

    def schedule(self) -> DiffusionSchedule:
        if self.schedule_type == "linear":
            betas = np.linspace(1e-4, self.max_beta, self.timesteps)
            return DiffusionSchedule(
                betas.astype(np.float32),
                np.cumprod(1.0 - betas).astype(np.float32))
        return DiffusionSchedule.cosine(self.timesteps)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class DiffNet(nn.Module):
    """spec [B, T, M], t [B], cond [B, T, H] → eps [B, T, M] (NWC layout;
    the reference uses [B, 1, M, T])."""

    cfg: DiffNetConfig

    @nn.compact
    def __call__(self, spec, t, cond):
        cfg = self.cfg
        c = cfg.residual_channels
        x = nn.Conv(c, (1,), name="input_projection")(spec)
        x = jax.nn.relu(x)

        # SinusoidalPosEmb (net.py:32): sin-first halves
        half = c // 2
        freqs = jnp.exp(jnp.arange(half) * -(math.log(10000.0) / (half - 1)))
        emb = t.astype(jnp.float32)[:, None] * freqs[None]
        emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
        emb = nn.Dense(c * 4, name="mlp_0")(emb)
        emb = nn.Dense(c, name="mlp_2")(mish(emb))

        cond_proj_all = []
        skips = None
        for i in range(cfg.residual_layers):
            d = 2 ** (i % cfg.dilation_cycle_length)
            y = x + nn.Dense(c, name=f"res_{i}_diff")(emb)[:, None, :]
            y = nn.Conv(2 * c, (3,), kernel_dilation=d,
                        padding=[(d, d)], name=f"res_{i}_dilated")(y)
            y = y + nn.Conv(2 * c, (1,), name=f"res_{i}_cond")(cond)
            gate, filt = jnp.split(y, 2, axis=-1)
            y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
            y = nn.Conv(2 * c, (1,), name=f"res_{i}_out")(y)
            residual, skip = jnp.split(y, 2, axis=-1)
            x = (x + residual) / math.sqrt(2.0)
            skips = skip if skips is None else skips + skip
        x = skips / math.sqrt(cfg.residual_layers)
        x = nn.Conv(c, (1,), name="skip_projection")(x)
        x = jax.nn.relu(x)
        return nn.Conv(cfg.mel_bins, (1,), kernel_init=nn.initializers.zeros,
                       name="output_projection")(x)


def plms_interval_sample(eps_fn, schedule: DiffusionSchedule, x, cond,
                         t_max: int, interval: int):
    """DiffSinger's PLMS with fixed step interval
    (``p_sample_plms``, shallow_diffusion_tts.py:169) as a lax.scan."""
    acum = jnp.asarray(schedule.alphas_cumprod)
    b = x.shape[0]

    def x_pred(x, noise_t, t):
        a_t = acum[t]
        a_prev = jnp.where(t < interval, 1.0, acum[jnp.maximum(t - interval, 0)])
        a_t_sq, a_prev_sq = jnp.sqrt(a_t), jnp.sqrt(a_prev)
        delta = (a_prev - a_t) * (
            x / (a_t_sq * (a_t_sq + a_prev_sq))
            - noise_t / (a_t_sq * (jnp.sqrt((1 - a_prev) * a_t)
                                   + jnp.sqrt((1 - a_t) * a_prev)))
        )
        return x + delta

    ts = np.arange(0, t_max, interval)[::-1].copy()

    def body(carry, step):
        x, hist, n = carry  # hist [3, ...] newest-first, n = #entries
        t = step
        t_vec = jnp.full((b,), t, jnp.int32)
        e = eps_fn(x, t_vec, cond)
        # n==0: second-order warmup with an extra eps eval
        def warmup(_):
            xp = x_pred(x, e, t)
            t2 = jnp.maximum(t - interval, 0)
            e2 = eps_fn(xp, jnp.full((b,), t2, jnp.int32), cond)
            return (e + e2) / 2.0

        e_ab1 = (3 * e - hist[0]) / 2
        e_ab2 = (23 * e - 16 * hist[0] + 5 * hist[1]) / 12
        e_ab3 = (55 * e - 59 * hist[0] + 37 * hist[1] - 9 * hist[2]) / 24
        e_prime = jax.lax.cond(
            n == 0, warmup,
            lambda _: jnp.where(n == 1, e_ab1, jnp.where(n == 2, e_ab2, e_ab3)),
            operand=None)
        x = x_pred(x, e_prime, t)
        hist = jnp.concatenate([e[None], hist[:2]], axis=0)
        return (x, hist, jnp.minimum(n + 1, 4)), None

    hist0 = jnp.zeros((3,) + x.shape)
    (x, _, _), _ = jax.lax.scan(body, (x, hist0, jnp.zeros((), jnp.int32)),
                                jnp.asarray(ts))
    return x


class DiffSinger(nn.Module):
    """Conditioner + denoiser under one module so a single params tree serves
    training and the fused sampling program."""

    cfg: DiffSingerConfig

    def setup(self):
        self.fs2 = FastSpeech2(self.cfg.fs2, name="fs2")
        self.denoiser = DiffNet(self.cfg.net, name="denoiser")
        self._schedule = self.cfg.schedule()

    def norm_spec(self, x):
        lo = jnp.asarray(self.cfg.spec_min)
        hi = jnp.asarray(self.cfg.spec_max)
        return (x - lo) / (hi - lo) * 2.0 - 1.0

    def denorm_spec(self, x):
        lo = jnp.asarray(self.cfg.spec_min)
        hi = jnp.asarray(self.cfg.spec_max)
        return (x + 1.0) / 2.0 * (hi - lo) + lo

    def conditioner(self, tokens, mel2ph=None, f0=None, uv=None, spk_id=None,
                    pitch_midi=None, midi_dur=None, is_slur=None):
        return self.fs2(tokens, mel2ph=mel2ph, f0=f0, uv=uv, spk_id=spk_id,
                        pitch_midi=pitch_midi, midi_dur=midi_dur,
                        is_slur=is_slur, infer=True)

    def denoise(self, spec, t, cond):
        return self.denoiser(spec, t, cond)

    def train_loss_inputs(self, tokens, mel2ph, ref_mels, **kw):
        """→ (cond, x0_normed) for p_losses; the task adds noise + L1."""
        ret = self.fs2(tokens, mel2ph=mel2ph, infer=False, **kw)
        return ret["decoder_inp"], self.norm_spec(ref_mels)

    def train_loss_inputs_full(self, tokens, mel2ph, ref_mels, **kw):
        """Like :meth:`train_loss_inputs` but also returns the FS2 output
        dict so the task can add the aux duration/pitch losses
        (``diffsinger_task.py:30`` trains the conditioner jointly)."""
        ret = self.fs2(tokens, mel2ph=mel2ph, infer=False, **kw)
        return ret["decoder_inp"], self.norm_spec(ref_mels), ret

    def __call__(self, tokens, mel2ph=None, pitch_midi=None, midi_dur=None,
                 is_slur=None, rng=None, pndm_speedup: int | None = 10):
        """Full inference: score → mel (denormalized). One traced program."""
        cfg = self.cfg
        ret = self.conditioner(tokens, mel2ph=mel2ph, pitch_midi=pitch_midi,
                               midi_dur=midi_dur, is_slur=is_slur)
        cond = ret["decoder_inp"]  # [B, F, H]
        fs2_mel = ret["mel_out"]
        b, frames, _ = cond.shape
        if rng is None:
            rng = jax.random.PRNGKey(0)
        rng, k1, k2 = jax.random.split(rng, 3)
        shape = (b, frames, cfg.net.mel_bins)
        if cfg.gaussian_start:
            x = jax.random.normal(k1, shape)
        else:
            t0 = jnp.full((b,), cfg.K_step - 1, jnp.int32)
            x = self._schedule.q_sample(self.norm_spec(fs2_mel), t0,
                                        jax.random.normal(k1, shape))

        def eps_fn(x_, t_, c_):
            return self.denoiser(x_, t_, c_)

        if self.is_initializing():
            # create denoiser params in the main trace — flax can't init
            # inside the lax.scan sampler body
            return {"mel_out": self.denorm_spec(
                        eps_fn(x, jnp.zeros((b,), jnp.int32), cond)),
                    "fs2_mel": fs2_mel, "mel2ph": ret["mel2ph"],
                    "f0_denorm": ret.get("f0_denorm")}

        if pndm_speedup and pndm_speedup > 1:
            x = plms_interval_sample(eps_fn, self._schedule, x, cond,
                                     cfg.K_step, pndm_speedup)
        else:
            x = ddpm_sample(eps_fn, self._schedule, shape, cond, k2,
                            from_step=cfg.K_step, x_start=x)
        mel = self.denorm_spec(x)
        mel2ph_out = ret["mel2ph"]
        mel = mel * (mel2ph_out > 0).astype(mel.dtype)[..., None]
        return {"mel_out": mel, "fs2_mel": fs2_mel, "mel2ph": mel2ph_out,
                "f0_denorm": ret.get("f0_denorm")}
