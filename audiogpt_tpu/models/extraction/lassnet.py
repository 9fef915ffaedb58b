"""LASSNet — language-queried audio source extraction, TPU-native NHWC.

Re-design of the reference's ``LASSNet`` (``sound_extraction/model/LASSNet.py:7``):
BERT-mini text CLS embedding (+ linear/relu) conditions a 6-level residual
U-Net (``resunet_film.py:4``) through additive FiLM layers (``film.py:4``);
the U-Net predicts a sigmoid magnitude mask on the STFT; the waveform is
rebuilt with the mixture phase via iSTFT (``audio-chatgpt.py:697-705``,
``sound_extraction/utils/stft.py:53``).

Spectrogram contract: [B, T, F] magnitude; T padded to a multiple of 64 and
the top 2 frequency bins dropped inside the U-Net (resunet_film.py:83-85),
restored on output.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from audiogpt_tpu.models.textenc.bert import BertConfig, BertEncoder
from audiogpt_tpu.ops.conv import ConvTranspose2d

BERT_MINI = BertConfig(hidden_size=256, num_layers=4, num_heads=4,
                       intermediate_size=1024)


@dataclasses.dataclass(frozen=True)
class LASSNetConfig:
    bert: BertConfig = BERT_MINI
    cond_dim: int = 256
    enc_channels: tuple = (32, 64, 128, 256, 384, 384)
    n_fft: int = 1024
    hop: int = 256
    sample_rate: int = 32000


class Film(nn.Module):
    """Additive FiLM (film.py:4): bias = MLP(cond) added per channel."""

    channels: int

    @nn.compact
    def __call__(self, x, cond):
        h = jax.nn.relu(nn.Dense(self.channels * 2, name="l1")(cond))
        bias = jax.nn.relu(nn.Dense(self.channels, name="l2")(h))
        return x + bias[:, None, None, :]


class ConvBlockResCond(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, cond, train=False):
        origin = x
        h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-5, name="bn1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False,
                    name="conv1")(jax.nn.leaky_relu(h, 0.01))
        h = Film(self.out_channels, name="film1")(h, cond)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-5, name="bn2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False,
                    name="conv2")(jax.nn.leaky_relu(h, 0.01))
        h = Film(self.out_channels, name="film2")(h, cond)
        if x.shape[-1] != self.out_channels:
            res = nn.Conv(self.out_channels, (1, 1), name="shortcut")(origin)
            res = Film(self.out_channels, name="film_res")(res, cond)
            return res + h
        return origin + h


class EncoderBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, cond, train=False):
        x = ConvBlockResCond(self.out_channels, name="cb1")(x, cond, train)
        x = ConvBlockResCond(self.out_channels, name="cb2")(x, cond, train)
        pooled = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return pooled, x


class DecoderBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, skip, cond, train=False):
        h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-5, name="bn1")(x)
        h = ConvTranspose2d(self.out_channels, (3, 3), (2, 2), use_bias=False,
                            name="convT")(jax.nn.relu(h))
        h = h[:, :-1, :, :]  # prune time (DecoderBlockRes2BCond.prune)
        h = jnp.concatenate([h, skip], axis=-1)
        h = ConvBlockResCond(self.out_channels, name="cb2")(h, cond, train)
        h = ConvBlockResCond(self.out_channels, name="cb3")(h, cond, train)
        return h


class UNetResFiLM(nn.Module):
    cfg: LASSNetConfig

    @nn.compact
    def __call__(self, sp, cond, train=False):
        """sp [B, T, F, 1] → mask logits, same shape."""
        cfg = self.cfg
        t0 = sp.shape[1]
        ds = 2 ** len(cfg.enc_channels)
        pad_t = (-t0) % ds
        x = jnp.pad(sp, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
        x = x[:, :, : x.shape[2] - 2, :]  # drop top 2 freq bins

        skips = []
        for i, ch in enumerate(cfg.enc_channels):
            x, skip = EncoderBlock(ch, name=f"enc_{i}")(x, cond, train)
            skips.append(skip)
        x = ConvBlockResCond(cfg.enc_channels[-1], name="center")(x, cond, train)
        dec_channels = tuple(reversed(cfg.enc_channels))  # mirror of encoder
        for i, ch in enumerate(dec_channels):
            x = DecoderBlock(ch, name=f"dec_{i}")(x, skips[-(i + 1)], cond, train)
        x = ConvBlockResCond(32, name="after_cb")(x, cond, train)
        x = nn.Conv(1, (1, 1), name="after_conv")(x)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 2), (0, 0)))
        return x[:, :t0]


class LASSNet(nn.Module):
    cfg: LASSNetConfig

    def setup(self):
        self.text_encoder = BertEncoder(self.cfg.bert, name="text_encoder")
        self.text_proj = nn.Dense(self.cfg.cond_dim, name="text_proj")
        self.unet = UNetResFiLM(self.cfg, name="unet")

    def __call__(self, sp, text_ids, text_mask=None, train=False):
        """sp [B, T, F] magnitude, text ids [B, L] → mask [B, T, F] ∈ (0,1)."""
        hidden = self.text_encoder(text_ids, text_mask)
        cond = jax.nn.relu(self.text_proj(hidden[:, 0]))
        logits = self.unet(sp[..., None], cond, train=train)
        return jax.nn.sigmoid(logits)[..., 0]
