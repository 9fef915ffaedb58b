"""Vocoder engine: mel [frames, n_mels] → wav, static-shape bucketed, jitted.

Replaces the reference's eager ``HifiGAN.spec2wav``
(``NeuralSeq/vocoders/hifigan.py:54``) and ``VocoderBigVGAN.vocode``
(``bigvgan/models.py:406``) with one AOT-compiled engine shared by TTS, SVS,
and the diffusion tools.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from audiogpt_tpu.registry import ENGINES
from audiogpt_tpu.engines.base import Bucketer, Engine
from audiogpt_tpu.models.vocoder import (
    BigVGANConfig,
    BigVGANGenerator,
    HifiGANConfig,
    HifiGANGenerator,
)

DEFAULT_BUCKETS = (128, 256, 512, 1024, 2048)


@ENGINES.register("vocoder")
class VocoderEngine(Engine):
    name = "vocoder"

    def __init__(
        self,
        kind: str = "hifigan",
        cfg: Any = None,
        params: Any = None,
        buckets=DEFAULT_BUCKETS,
        rng_seed: int = 0,
        bf16: bool = False,
    ):
        """``bf16``: opt-in throughput mode — the param tree is cast to
        bfloat16 ONCE at construction (so bf16 parameter bytes stream from
        HBM, not f32 re-cast per dispatch) and activations run in bfloat16
        inside the jit program (f32 in/out). The generator is
        HBM-bandwidth-bound (BASELINE.md roofline: AI 65 ≪ 240 at batch 8),
        so halving the byte streams buys ~1.4× measured on v5e at ~39 dB
        SNR vs the f32 output of the same weights. Off by default: f32 is
        the reference parity path."""
        super().__init__()
        self.kind = kind
        if kind == "hifigan":
            self.cfg = cfg or HifiGANConfig()
            self.model = HifiGANGenerator(self.cfg)
        elif kind == "bigvgan":
            self.cfg = cfg or BigVGANConfig()
            self.model = BigVGANGenerator(self.cfg)
        elif kind == "pwg":
            from audiogpt_tpu.models.vocoder.pwg import PWGConfig, PWGGenerator

            self.cfg = cfg or PWGConfig()
            self.model = PWGGenerator(self.cfg)
        elif kind == "melgan":
            from audiogpt_tpu.models.vocoder.pwg import MelGANConfig, MelGANGenerator

            self.cfg = cfg or MelGANConfig()
            self.model = MelGANGenerator(self.cfg)
        else:
            raise ValueError(kind)
        self.n_mels = getattr(self.cfg, "in_channels", None) or getattr(
            self.cfg, "num_mels", 80
        )
        if params is None:
            dummy = jnp.zeros((1, 16, self.n_mels))
            if kind == "hifigan" and self.cfg.use_nsf:
                params = self.model.init(
                    jax.random.PRNGKey(rng_seed), dummy, jnp.zeros((1, 16))
                )
            else:
                params = self.model.init(jax.random.PRNGKey(rng_seed), dummy)
        self.bucketer = Bucketer(buckets)
        self._rng = jax.random.PRNGKey(rng_seed)
        self.bf16 = bf16
        # the params SETTER keeps the bf16 dispatch copy in sync (ckpt
        # loading assigns engine.params directly); casting once here instead
        # of inside the jitted program means the generator streams bf16
        # parameter bytes from HBM — in-program casts still read the f32
        # tree every dispatch, halving only activation bytes (ADVICE r3).
        # self.params stays f32: the parity and fused-TTS paths use it.
        self.params = params

        def _io(m):
            return m.astype(jnp.bfloat16) if bf16 else m

        if kind == "hifigan" and self.cfg.use_nsf:
            self._fn = jax.jit(
                lambda p, m, f0, k: self.model.apply(
                    p, _io(m), _io(f0), rng=k).astype(jnp.float32)
            )
        else:
            self._fn = jax.jit(lambda p, m: self.model.apply(
                p, _io(m)).astype(jnp.float32))

    @property
    def params(self):
        return self._params

    @params.setter
    def params(self, p):
        self._params = p
        if self.bf16:
            self._run_params = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, p)
        else:
            self._run_params = p

    @property
    def hop_size(self) -> int:
        return self.cfg.hop_size

    def warmup(self, buckets=None) -> None:
        for b in buckets or self.bucketer.buckets:
            self.__call__(np.zeros((b, self.n_mels), np.float32))

    def __call__(self, mel: np.ndarray, f0: np.ndarray | None = None) -> np.ndarray:
        """mel [frames, n_mels] (or [B, frames, n_mels]) → wav [samples]
        (or [B, samples])."""
        squeeze = mel.ndim == 2
        mel = np.asarray(mel, np.float32)
        if squeeze:
            mel = mel[None]
        padded, true_len = self.bucketer.pad_to_bucket(mel, axis=1)
        if self.kind == "hifigan" and self.cfg.use_nsf:
            if f0 is None:
                f0 = np.zeros(mel.shape[:2], np.float32)
            if f0.ndim == 1:
                f0 = f0[None]
            f0p, _ = self.bucketer.pad_to_bucket(np.asarray(f0, np.float32), axis=1)
            self._rng, k = jax.random.split(self._rng)
            wav = self._fn(self._run_params, jnp.asarray(padded),
                           jnp.asarray(f0p), k)
        else:
            wav = self._fn(self._run_params, jnp.asarray(padded))
        wav = np.asarray(wav)[:, : true_len * self.hop_size]
        return wav[0] if squeeze else wav


def denoise(wav: np.ndarray, v: float = 0.1, n_fft: int = 1024,
            hop: int = 256, win_length: int | None = None) -> np.ndarray:
    """Spectral-magnitude-subtraction denoise for vocoder output
    (``NeuralSeq/vocoders/vocoder_utils.py:7``: |S|−v floored at 0, mixture
    phase kept, iSTFT) — jitted JAX instead of librosa on host."""
    from audiogpt_tpu.dsp.stft import istft, stft

    x = jnp.asarray(wav, jnp.float32)
    spec = stft(x, n_fft, hop, win_length, pad_mode="constant")
    mag = jnp.abs(spec)
    mag = jnp.clip(mag - v, 0.0, None)
    phase = jnp.where(mag > 0, spec / jnp.maximum(jnp.abs(spec), 1e-9), 0.0)
    out = istft(mag * phase, n_fft, hop, win_length, length=x.shape[-1])
    return np.asarray(out)
