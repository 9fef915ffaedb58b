"""Cnn14 (PANN) audio backbone, TPU-native NHWC.

Re-design of ``audio_to_text/captioning/models/encoder.py:336-468``
(ConvBlock ×6 with avg-pool, mel-axis mean, max+mean temporal pooling) —
the same backbone family serves the audio captioner, PANN-style AudioSet
tagging/SED, and the CLAP audio tower (``open_clap/pann_model.py``).

Frontend: 32 kHz / n_fft 1024 / hop 320 / 64 slaney mels / AmplitudeToDB —
the shared :data:`PANNS_MEL_32K` spec.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from audiogpt_tpu.dsp.mel import PANNS_MEL_32K, log_mel


@dataclasses.dataclass(frozen=True)
class Cnn14Config:
    mel_bins: int = 64
    channels: tuple = (64, 128, 256, 512, 1024, 2048)
    downsample_ratio: int = 32   # 5 × (2,2) pools on time axis
    classes_num: int = 527       # AudioSet (tagging head)


class ConvBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, pool: int = 2, train: bool = False):
        for i in (1, 2):
            x = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        use_bias=False, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5, name=f"bn{i}")(x)
            x = jax.nn.relu(x)
        if pool > 1:
            x = nn.avg_pool(x, (pool, pool), strides=(pool, pool))
        return x


class Cnn14Encoder(nn.Module):
    """waveform [B, T] @32 kHz → dict(attn_emb [B, frames/32, 2048],
    fc_emb [B, 2048], logits [B, 527] when with_head)."""

    cfg: Cnn14Config
    with_head: bool = False

    @nn.compact
    def __call__(self, wav, wav_len=None, train: bool = False):
        cfg = self.cfg
        # channels is a user-facing width knob (tools/train_tiny_clap.py
        # --channels); the pool schedule below (2 for i<5, 1 for the last)
        # is what downsample_ratio=32 encodes — a different stage count
        # would silently desync the feat_len masking
        if len(cfg.channels) != 6:
            raise ValueError(
                f"Cnn14Config.channels must have 6 stages (pool schedule "
                f"fixes downsample_ratio={cfg.downsample_ratio}); got "
                f"{len(cfg.channels)}")
        mel = log_mel(wav, PANNS_MEL_32K)          # [B, T', 64]
        x = mel[..., None]                          # NHWC: [B, T', 64, 1]
        # bn0 normalizes per-mel-bin (reference transposes to put mel on the
        # channel axis; with NHWC we batch-norm over axis=2 via reshape)
        b, t, m, _ = x.shape
        x0 = x[..., 0]
        x0 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, name="bn0")(x0)
        x = x0[..., None]
        for i, ch in enumerate(cfg.channels):
            pool = 2 if i < 5 else 1
            x = ConvBlock(ch, name=f"conv_block{i + 1}")(x, pool=pool, train=train)
        x = jnp.mean(x, axis=2)                    # mean over mel axis → [B, T/32, 2048]
        attn_emb = x

        if wav_len is None:
            feat_len = jnp.full((wav.shape[0],), attn_emb.shape[1], jnp.int32)
        else:
            feat_len = (wav_len // PANNS_MEL_32K.hop + 1) // cfg.downsample_ratio
        mask = (jnp.arange(attn_emb.shape[1])[None] < feat_len[:, None])
        maskf = mask[..., None].astype(x.dtype)
        x_mean = jnp.sum(attn_emb * maskf, axis=1) / jnp.maximum(
            jnp.sum(maskf, axis=1), 1.0)
        x_max = jnp.max(jnp.where(maskf > 0, attn_emb, -jnp.inf), axis=1)
        h = x_max + x_mean
        fc_emb = jax.nn.relu(nn.Dense(cfg.channels[-1], name="fc1")(h))
        out = {"attn_emb": attn_emb, "fc_emb": fc_emb, "attn_emb_len": feat_len}
        if self.with_head:
            # PANN tagging head (audioset_tagging_cnn Cnn14): sigmoid logits
            out["clipwise_logits"] = nn.Dense(cfg.classes_num, name="fc_audioset")(fc_emb)
            out["clipwise_output"] = jax.nn.sigmoid(out["clipwise_logits"])
        return out
