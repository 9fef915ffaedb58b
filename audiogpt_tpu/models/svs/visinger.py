"""VISinger — VITS-class end-to-end singing-voice synthesis.

Reference: the ``t2s_VISinger`` tool (``audio-chatgpt.py:341``) drives
ESPnet2's ``SingingGenerate`` with the ``AQuarterMile/opencpop_visinger1``
checkpoint — an external model the reference never re-implements (and never
instantiates in ConversationBot). This module provides a native VITS/VISinger
architecture so the capability exists first-class:

  * score encoder: phone + MIDI-pitch + slur embeddings → FFT blocks →
    prior stats (m_p, logs_p),
  * posterior encoder (training): WaveNet conv stack over linear
    spectrogram frames → (m_q, logs_q), z ~ q(z|x),
  * residual-coupling normalizing flow bridging posterior ↔ prior
    (reverse direction at inference),
  * HiFi-GAN decoder z → waveform (shared module from models/vocoder),
  * frame duration comes from the score (VISinger uses note durations; a
    log-domain duration predictor refines per-phone length).

Training objective (VITS): KL(q ‖ flow⁻¹(prior)) + GAN + mel reconstruction
+ duration loss — the GAN/mel parts ride the existing vocoder
discriminators/losses via :class:`~audiogpt_tpu.train.tasks.vocoder_gan`
pieces.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from audiogpt_tpu.models.tts.fastspeech2 import FFTBlocks, length_regulator
from audiogpt_tpu.models.vocoder.hifigan import HifiGANConfig, HifiGANGenerator


@dataclasses.dataclass(frozen=True)
class VISingerConfig:
    vocab_size: int = 100
    hidden: int = 192
    enc_layers: int = 4
    enc_heads: int = 2
    latent_dim: int = 192
    spec_bins: int = 513            # n_fft//2+1 posterior input
    posterior_layers: int = 8
    flow_layers: int = 4
    flow_wn_layers: int = 4
    max_frames: int = 1024
    decoder: HifiGANConfig = HifiGANConfig(
        in_channels=192, upsample_rates=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4), upsample_initial_channel=256)


class WNStack(nn.Module):
    """Non-causal WaveNet stack with optional conditioning (VITS WN)."""

    hidden: int
    layers: int
    kernel: int = 5

    @nn.compact
    def __call__(self, x, g=None):
        h = x
        skip_total = 0.0
        for i in range(self.layers):
            a = nn.Conv(2 * self.hidden, (self.kernel,),
                        kernel_dilation=(1,), padding="SAME",
                        name=f"in{i}")(h)
            if g is not None:
                a = a + nn.Dense(2 * self.hidden, name=f"cond{i}")(g)
            t_act = jnp.tanh(a[..., : self.hidden])
            s_act = jax.nn.sigmoid(a[..., self.hidden:])
            acts = t_act * s_act
            rs = nn.Dense(2 * self.hidden, name=f"rs{i}")(acts)
            h = (h + rs[..., : self.hidden]) * math.sqrt(0.5)
            skip_total = skip_total + rs[..., self.hidden:]
        return skip_total


class ResidualCouplingLayer(nn.Module):
    """Mean-only affine coupling (VITS ResidualCouplingLayer)."""

    channels: int
    hidden: int
    wn_layers: int

    @nn.compact
    def __call__(self, x, mask, reverse: bool = False):
        half = self.channels // 2
        xa, xb = x[..., :half], x[..., half:]
        h = nn.Dense(self.hidden, name="pre")(xa) * mask[..., None]
        h = WNStack(self.hidden, self.wn_layers, name="wn")(h)
        m = nn.Dense(half, name="post", kernel_init=nn.initializers.zeros)(h)
        if not reverse:
            xb = (xb + m) * mask[..., None]
            logdet = jnp.zeros(x.shape[0])
        else:
            xb = (xb - m) * mask[..., None]
            logdet = None
        return jnp.concatenate([xa, xb], -1), logdet


class ResidualCouplingFlow(nn.Module):
    channels: int
    hidden: int
    n_layers: int
    wn_layers: int

    def setup(self):
        self.layers = [ResidualCouplingLayer(self.channels, self.hidden,
                                             self.wn_layers, name=f"l{i}")
                       for i in range(self.n_layers)]

    def __call__(self, x, mask, reverse: bool = False):
        if not reverse:
            for layer in self.layers:
                x, _ = layer(x, mask)
                x = jnp.flip(x, axis=-1)   # channel flip between couplings
        else:
            for layer in reversed(self.layers):
                x = jnp.flip(x, axis=-1)
                x, _ = layer(x, mask, reverse=True)
        return x


class PosteriorEncoder(nn.Module):
    cfg: VISingerConfig

    @nn.compact
    def __call__(self, spec, mask, rng):
        """linear spec [B, F, bins] → (z, m_q, logs_q)."""
        cfg = self.cfg
        h = nn.Dense(cfg.hidden, name="pre")(spec) * mask[..., None]
        h = WNStack(cfg.hidden, cfg.posterior_layers, name="wn")(h)
        stats = nn.Dense(2 * cfg.latent_dim, name="proj")(h) * mask[..., None]
        m, logs = jnp.split(stats, 2, axis=-1)
        z = (m + jnp.exp(logs) * jax.random.normal(rng, m.shape)) \
            * mask[..., None]
        return z, m, logs


class ScoreEncoder(nn.Module):
    cfg: VISingerConfig

    @nn.compact
    def __call__(self, tokens, pitch_midi, is_slur):
        cfg = self.cfg
        x = nn.Embed(cfg.vocab_size, cfg.hidden, name="phone_embed")(tokens)
        x = x + nn.Embed(130, cfg.hidden, name="midi_embed")(pitch_midi)
        x = x + nn.Embed(2, cfg.hidden, name="slur_embed")(is_slur)
        nonpad = (tokens > 0).astype(jnp.float32)
        x = FFTBlocks(cfg.hidden, cfg.enc_layers, cfg.enc_heads, 9,
                      name="fft")(x * math.sqrt(cfg.hidden), nonpad)
        stats = nn.Dense(2 * cfg.latent_dim, name="proj")(x)
        m_p, logs_p = jnp.split(stats, 2, axis=-1)
        dur_log = nn.Dense(1, name="dur_proj")(x)[..., 0]
        return x, m_p, logs_p, dur_log, nonpad


class VISinger(nn.Module):
    cfg: VISingerConfig

    def setup(self):
        cfg = self.cfg
        self.score_enc = ScoreEncoder(cfg, name="score_encoder")
        self.posterior = PosteriorEncoder(cfg, name="posterior_encoder")
        self.flow = ResidualCouplingFlow(cfg.latent_dim, cfg.hidden,
                                         cfg.flow_layers, cfg.flow_wn_layers,
                                         name="flow")
        self.decoder = HifiGANGenerator(cfg.decoder, name="decoder")

    @staticmethod
    def _expand(h, mel2ph):
        h = jnp.pad(h, ((0, 0), (1, 0), (0, 0)))
        return jnp.take_along_axis(h, mel2ph[..., None], axis=1)

    def train_step_outputs(self, tokens, pitch_midi, is_slur, mel2ph, spec,
                           rng):
        """Training forward: returns dict with z slices + KL pieces.

        spec: linear magnitude [B, F, bins]; mel2ph: frame→phone alignment
        from the score.
        """
        _, m_p_ph, logs_p_ph, dur_log, nonpad = self.score_enc(
            tokens, pitch_midi, is_slur)
        mask = (mel2ph > 0).astype(jnp.float32)
        m_p = self._expand(m_p_ph, mel2ph)
        logs_p = self._expand(logs_p_ph, mel2ph)

        z, m_q, logs_q = self.posterior(spec, mask, rng)
        z_p = self.flow(z, mask)          # posterior → prior space
        # KL(q || p) after flow (VITS kl_loss)
        kl = logs_p - logs_q - 0.5 \
            + 0.5 * (jnp.exp(2 * logs_q) + (z_p - m_p) ** 2) \
            * jnp.exp(-2 * logs_p)
        kl = (kl * mask[..., None]).sum() / \
            jnp.maximum(mask.sum() * kl.shape[-1], 1.0)
        wav = self.decoder(z)
        return {"wav": wav, "kl": kl, "dur": dur_log, "nonpad": nonpad,
                "z": z, "mask": mask}

    def __call__(self, tokens, pitch_midi, is_slur, mel2ph=None,
                 note_durs=None, frames_per_sec: float = 86.13,
                 rng=None, noise_scale: float = 0.667):
        """Inference: score → waveform. ``mel2ph`` may come from note
        durations (``note_durs`` seconds per token) or the duration head."""
        cfg = self.cfg
        _, m_p_ph, logs_p_ph, dur_log, nonpad = self.score_enc(
            tokens, pitch_midi, is_slur)
        if mel2ph is None:
            if note_durs is not None:
                dur = jnp.round(note_durs * frames_per_sec) * nonpad
            else:
                dur = jnp.clip(jnp.round(jnp.exp(dur_log) - 1.0), 0,
                               None) * nonpad
            mel2ph = length_regulator(dur, cfg.max_frames)
        mask = (mel2ph > 0).astype(jnp.float32)
        m_p = self._expand(m_p_ph, mel2ph)
        logs_p = self._expand(logs_p_ph, mel2ph)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        z_p = m_p + jnp.exp(logs_p) * jax.random.normal(rng, m_p.shape) \
            * noise_scale
        z = self.flow(z_p * mask[..., None], mask, reverse=True)
        if self.is_initializing():
            # bind posterior params too (training uses them)
            self.posterior(jnp.zeros(
                (tokens.shape[0], mask.shape[1], cfg.spec_bins)), mask,
                jax.random.PRNGKey(0))
        wav = self.decoder(z * mask[..., None])
        return {"wav": wav, "mel2ph": mel2ph}
