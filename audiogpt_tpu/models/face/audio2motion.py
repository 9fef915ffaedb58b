"""Audio → facial-landmark motion (GeneFace-class variational generator).

The reference's GeneFace tool (``audio-chatgpt.py:589-611``) drives a
``GeneFaceInfer`` binding whose ``audio_to_face`` package is absent from its
tree — the tool crashes on import. Per SURVEY §7(f) the component is rebuilt
from GeneFace's task definition: a variational motion generator that maps
audio features to per-frame facial landmarks, followed by a renderer
(``renderer.py``). Substitutions vs the paper pipeline, documented:

  * HuBERT features → the shared 80-bin LDM mel frontend (``dsp/mel.py``),
  * 3DMM + NeRF → 68-point 2-D landmarks + piecewise-affine portrait warp,
  * flow prior → a conditional Gaussian prior predicted from audio (the
    VAE stays audio-conditioned end-to-end; KL is measured q‖p).

TPU design: all convs are time-parallel (no autoregression), mel→video-rate
resampling is a static ``jax.image.resize`` (62.5 fps → 25 fps), shapes are
bucketed dyadically by the engine, and the whole generate path is one jit
program per bucket.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class Audio2MotionConfig:
    mel_bins: int = 80
    hidden: int = 256
    latent: int = 16
    landmarks: int = 68
    conv_layers: int = 3
    kernel: int = 5
    #: video frames per second; mel rate is sr/hop (62.5 for the LDM mel)
    fps: int = 25
    sample_rate: int = 16000
    hop: int = 256
    #: max landmark offset in unit-square coords (tanh clamp)
    motion_scale: float = 0.08

    @property
    def out_dim(self) -> int:
        return self.landmarks * 2

    def video_len(self, mel_len: int) -> int:
        return max(1, (mel_len * self.fps * self.hop) // self.sample_rate)


class ConvStack(nn.Module):
    """LN → Conv1d(k) → GELU residual stack (time-parallel)."""

    width: int
    layers: int
    kernel: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.width, name="in_proj")(x)
        for i in range(self.layers):
            h = nn.LayerNorm(name=f"ln_{i}")(x)
            h = nn.Conv(self.width, (self.kernel,), padding="SAME",
                        name=f"conv_{i}")(h)
            x = x + nn.gelu(h)
        return x


class Audio2MotionVAE(nn.Module):
    """Training: ``__call__(mel, motion, rng)`` → (recon, q_stats, p_stats).
    Inference: ``generate(mel, rng, temperature)`` → landmark offsets
    [B, T_video, 68*2] in unit-square coords."""

    cfg: Audio2MotionConfig

    def setup(self):
        c = self.cfg
        self.audio_enc = ConvStack(c.hidden, c.conv_layers, c.kernel,
                                   name="audio_enc")
        self.motion_enc = ConvStack(c.hidden, c.conv_layers, c.kernel,
                                    name="motion_enc")
        self.post_head = nn.Dense(2 * c.latent, name="post_head")
        self.prior_head = nn.Dense(2 * c.latent, name="prior_head")
        self.decoder = ConvStack(c.hidden, c.conv_layers, c.kernel,
                                 name="decoder")
        self.out_head = nn.Dense(c.out_dim, name="out_head",
                                 kernel_init=nn.initializers.normal(2e-2))

    def _audio_features(self, mel):
        """mel [B, T_mel, M] → features at video rate [B, T_v, H]."""
        h = self.audio_enc(mel)
        tv = self.cfg.video_len(mel.shape[1])
        return jax.image.resize(h, (h.shape[0], tv, h.shape[2]), "linear")

    def _decode(self, z, a):
        h = self.decoder(jnp.concatenate([z, a], -1))
        return jnp.tanh(self.out_head(h)) * self.cfg.motion_scale

    def __call__(self, mel, motion, rng):
        """mel [B, T_mel, M]; motion [B, T_v, 68*2] ground-truth offsets."""
        c = self.cfg
        a = self._audio_features(mel)
        q = self.post_head(self.motion_enc(
            jnp.concatenate([motion, a], -1)))
        mu_q, lv_q = jnp.split(q, 2, -1)
        p = self.prior_head(a)
        mu_p, lv_p = jnp.split(p, 2, -1)
        lv_q = jnp.clip(lv_q, -8.0, 8.0)
        lv_p = jnp.clip(lv_p, -8.0, 8.0)
        z = mu_q + jnp.exp(0.5 * lv_q) * jax.random.normal(
            rng, mu_q.shape, mu_q.dtype)
        recon = self._decode(z, a)
        return recon, (mu_q, lv_q), (mu_p, lv_p)

    def generate(self, mel, rng, temperature: float = 1.0):
        a = self._audio_features(mel)
        p = self.prior_head(a)
        mu_p, lv_p = jnp.split(p, 2, -1)
        lv_p = jnp.clip(lv_p, -8.0, 8.0)
        z = mu_p + temperature * jnp.exp(0.5 * lv_p) * jax.random.normal(
            rng, mu_p.shape, mu_p.dtype)
        return self._decode(z, a)


def kl_gauss(mu_q, lv_q, mu_p, lv_p):
    """KL(q‖p) per element, both diagonal Gaussians."""
    return 0.5 * (lv_p - lv_q + (jnp.exp(lv_q) + (mu_q - mu_p) ** 2)
                  / jnp.exp(lv_p) - 1.0)


def energy_articulation(mel: jnp.ndarray, cfg: Audio2MotionConfig,
                        gain: float = 1.0) -> jnp.ndarray:
    """Audio-energy → mouth/jaw articulation prior, [T_v, 68, 2] offsets.

    An explicit, deterministic baseline the engine blends with the learned
    residual: frame RMS (mel is log-compressed [0,1]; mean over bins) opens
    the mouth (inner/outer lip y-split, slight jaw drop). Keeps the tool
    audibly synced even before ``Audio2MotionVAE`` is trained — and gives
    the trained model a zero-mean residual target (classic articulatory
    prior + learned-residual decomposition)."""
    c = cfg
    e = mel.mean(-1)                                         # [T_mel]
    tv = c.video_len(e.shape[0])
    e = jax.image.resize(e, (tv,), "linear")
    e = jnp.clip((e - e.mean()) * 3.0 + 0.5, 0.0, 1.0) * gain
    off = jnp.zeros((tv, 68, 2))
    amp = 0.030 * e[:, None]
    # template rings (renderer.template_landmarks): outer mouth 48-59 and
    # inner 60-67 are angle-parameterized with +sin = lower (y down); jaw
    # 6-10 is the chin arc
    lower_outer = jnp.array([49, 50, 51, 52, 53])
    lower_inner = jnp.array([61, 62, 63])
    upper_inner = jnp.array([65, 66, 67])
    jaw = jnp.array([6, 7, 8, 9, 10])
    off = off.at[:, lower_outer, 1].add(amp)
    off = off.at[:, lower_inner, 1].add(amp * 0.8)
    off = off.at[:, upper_inner, 1].add(-amp * 0.2)
    off = off.at[:, jaw, 1].add(amp * 0.5)
    return off


def pseudo_motion_targets(mel, video_len: int):
    """Numpy twin of :func:`energy_articulation` flattened to [T_v, 68*2] —
    the data-loader fallback target for audio-only corpora (no video to
    extract landmarks from; ``data/loader.collate_motion``). Keeps the
    recipe drivable end-to-end and trains the VAE toward the articulation
    prior, onto which video-derived targets can later be swapped."""
    import numpy as np

    e = np.asarray(mel, np.float32).mean(-1)               # [T_mel]
    pos = np.linspace(0, len(e) - 1, video_len)
    e = np.interp(pos, np.arange(len(e)), e)
    e = np.clip((e - e.mean()) * 3.0 + 0.5, 0.0, 1.0)
    off = np.zeros((video_len, 68, 2), np.float32)
    amp = (0.030 * e)[:, None]
    off[:, [49, 50, 51, 52, 53], 1] += amp
    off[:, [61, 62, 63], 1] += amp * 0.8
    off[:, [65, 66, 67], 1] += -amp * 0.2
    off[:, [6, 7, 8, 9, 10], 1] += amp * 0.5
    return off.reshape(video_len, 136)
