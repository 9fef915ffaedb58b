"""AutoencoderKL (first-stage VAE of the latent diffusion), TPU-native NHWC.

Re-design of the reference's ``AutoencoderKL``
(``Make_An_Audio/ldm/models/autoencoder.py:305``) with the SD encoder/decoder
(``ldm/modules/diffusionmodules/model.py:368,462``). Config matches
``txt2audio_args.yaml``: ch 128, ch_mult [1,2,2,4] (8× downsample of the
80×624 mel), 2 res blocks, attn at tracker resolutions 106/212, z=4,
double_z.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from audiogpt_tpu.models.diffusion.unet import GroupNorm32


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (106, 212)
    in_channels: int = 1
    out_ch: int = 1
    z_channels: int = 4
    embed_dim: int = 4
    resolution: int = 848  # scalar tracker only (model.py:389)
    double_z: bool = True


def _nonlin(x):
    return nn.silu(x)


class ResnetBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        h = GroupNorm32(eps=1e-6, name="norm1")(x)
        h = _nonlin(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", name="conv1")(h)
        h = GroupNorm32(eps=1e-6, name="norm2")(h)
        h = _nonlin(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention (model.py:150)."""

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = GroupNorm32(eps=1e-6, name="norm")(x)
        q = nn.Conv(c, (1, 1), name="q")(h).reshape(b, hh * ww, c)
        k = nn.Conv(c, (1, 1), name="k")(h).reshape(b, hh * ww, c)
        v = nn.Conv(c, (1, 1), name="v")(h).reshape(b, hh * ww, c)
        w = jnp.einsum("bic,bjc->bij", q, k, preferred_element_type=jnp.float32)
        w = jax.nn.softmax(w * (c ** -0.5), axis=-1).astype(v.dtype)
        h = jnp.einsum("bij,bjc->bic", w, v).reshape(b, hh, ww, c)
        h = nn.Conv(c, (1, 1), name="proj_out")(h)
        return x + h


class DownsampleVAE(nn.Module):
    @nn.compact
    def __call__(self, x):
        # torch pads (0,1,0,1): right/bottom only, then stride-2 VALID conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                       name="conv")(x)


class UpsampleVAE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(c, (3, 3), padding="SAME", name="conv")(x)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        curr_res = cfg.resolution
        h = nn.Conv(cfg.ch, (3, 3), padding="SAME", name="conv_in")(x)
        for level, mult in enumerate(cfg.ch_mult):
            for i in range(cfg.num_res_blocks):
                h = ResnetBlock(cfg.ch * mult, name=f"down_{level}_block_{i}")(h)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(name=f"down_{level}_attn_{i}")(h)
            if level != len(cfg.ch_mult) - 1:
                h = DownsampleVAE(name=f"down_{level}_downsample")(h)
                curr_res //= 2
        h = ResnetBlock(h.shape[-1], name="mid_block_1")(h)
        h = AttnBlock(name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block_2")(h)
        h = GroupNorm32(eps=1e-6, name="norm_out")(h)
        h = _nonlin(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return nn.Conv(out_ch, (3, 3), padding="SAME", name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        n = len(cfg.ch_mult)
        curr_res = cfg.resolution // 2 ** (n - 1)
        h = nn.Conv(cfg.ch * cfg.ch_mult[-1], (3, 3), padding="SAME", name="conv_in")(z)
        h = ResnetBlock(h.shape[-1], name="mid_block_1")(h)
        h = AttnBlock(name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block_2")(h)
        for level in reversed(range(n)):
            for i in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(cfg.ch * cfg.ch_mult[level],
                                name=f"up_{level}_block_{i}")(h)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(name=f"up_{level}_attn_{i}")(h)
            if level != 0:
                h = UpsampleVAE(name=f"up_{level}_upsample")(h)
                curr_res *= 2
        h = GroupNorm32(eps=1e-6, name="norm_out")(h)
        h = _nonlin(h)
        return nn.Conv(cfg.out_ch, (3, 3), padding="SAME", name="conv_out")(h)


class GaussianMoments(NamedTuple):
    mean: jnp.ndarray
    logvar: jnp.ndarray

    def sample(self, rng):
        std = jnp.exp(0.5 * jnp.clip(self.logvar, -30.0, 20.0))
        return self.mean + std * jax.random.normal(rng, self.mean.shape, self.mean.dtype)

    def mode(self):
        return self.mean

    def kl(self):
        logvar = jnp.clip(self.logvar, -30.0, 20.0)
        return 0.5 * jnp.sum(
            self.mean ** 2 + jnp.exp(logvar) - 1.0 - logvar, axis=(1, 2, 3)
        )


class AutoencoderKL(nn.Module):
    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")
        self.quant_conv = nn.Conv(2 * self.cfg.embed_dim, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.z_channels, (1, 1),
                                       name="post_quant_conv")

    def encode(self, x) -> GaussianMoments:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return GaussianMoments(mean, logvar)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None, sample_posterior=False):
        post = self.encode(x)
        z = post.sample(rng) if sample_posterior else post.mode()
        return self.decode(z), post
