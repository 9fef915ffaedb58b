"""Mel filterbanks and the framework's named log-mel specs.

The filterbank reproduces librosa's ``filters.mel`` math exactly (Slaney mel
scale, triangular filters, Slaney area normalization) so PyTorch-trained
checkpoints see bit-compatible features. Each model family's frontend is a
named :class:`MelSpec`:

  * ``LDM_MEL_16K``  — Make-An-Audio ``TRANSFORMS_16000``
    (``ldm/data/extract_mel_spectrogram.py:140``: sr16k nfft1024 hop256 80mel
    fmin125 fmax7600, power 1, then max(1e-5)→log10→*20−20+100→/100→clip[0,1])
  * ``PANNS_MEL_32K`` — PVT detection frontend
    (``audio_infer/pytorch/models.py:146-162``: sr32k nfft1024 hop320 64mel
    fmin50 fmax14000, power 2, 10*log10(max(x,1e-10)), reflect padding)
  * ``NEURALSEQ_MEL_22K`` — NeuralSeq TTS/vocoder frontend
    (``NeuralSeq/utils/audio.py``: amp_to_db = 20*log10(max(1e-5,x)), then
    (S - min_level_db)/-min_level_db with min_level_db=-100 … configs use the
    un-normalized log10 variant; we expose both)
  * ``CAPTION_MEL_32K`` — audio captioner Cnn14 frontend (sr32k hop320 64mel,
    fmin50 fmax14000; ``audio_to_text/captioning/models/encoder.py``)
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from audiogpt_tpu.dsp.stft import spectrogram


# ---------------------------------------------------------------------------
# librosa-compatible mel filterbank (Slaney variant)
# ---------------------------------------------------------------------------

_F_SP = 200.0 / 3  # Hz per mel below the break
_BRK_HZ = 1000.0
_BRK_MEL = _BRK_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def _hz_to_mel(f, htk: bool = False):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    mel = f / _F_SP
    log_t = f >= _BRK_HZ
    mel = np.where(log_t, _BRK_MEL + np.log(np.maximum(f, 1e-10) / _BRK_HZ) / _LOGSTEP, mel)
    return mel


def _mel_to_hz(m, htk: bool = False):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f = m * _F_SP
    log_t = m >= _BRK_MEL
    f = np.where(log_t, _BRK_HZ * np.exp(_LOGSTEP * (m - _BRK_MEL)), f)
    return f


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank ``[n_fft//2+1, n_mels]`` (transposed vs.
    librosa so the mel projection is a plain right-matmul on the MXU)."""
    fmax = fmax if fmax is not None else sr / 2.0
    fft_freqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]  # [n_mels+2, n_bins]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))  # [n_mels, n_bins]

    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # [n_bins, n_mels]


# ---------------------------------------------------------------------------
# Named frontend specs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MelSpec:
    sr: int
    n_fft: int
    hop: int
    win_length: int
    n_mels: int
    fmin: float
    fmax: float
    power: float = 1.0          # 1 = magnitude, 2 = power spectrogram
    pad_mode: str = "constant"  # librosa default vs torchlibrosa 'reflect'
    log: str = "log10"          # 'log10' | 'db10' | 'db20' | 'none'
    amin: float = 1e-5

    def filterbank(self) -> np.ndarray:
        return mel_filterbank(self.sr, self.n_fft, self.n_mels, self.fmin, self.fmax)

    @property
    def frames_per_second(self) -> float:
        return self.sr / self.hop


LDM_MEL_16K = MelSpec(16000, 1024, 256, 1024, 80, 125.0, 7600.0,
                      power=1.0, pad_mode="constant", log="log10", amin=1e-5)
PANNS_MEL_32K = MelSpec(32000, 1024, 320, 1024, 64, 50.0, 14000.0,
                        power=2.0, pad_mode="reflect", log="db10", amin=1e-10)
# HTSAT-tiny CLAP audio tower (open_clap/model_configs/HTSAT-tiny.json:
# sr 48k, nfft/win 1024, hop 480, 64 mels, 50-14000 Hz; torchlibrosa
# Spectrogram power 2 + LogmelFilterBank ref=1 amin=1e-10 top_db=None)
HTSAT_MEL_48K = MelSpec(48000, 1024, 480, 1024, 64, 50.0, 14000.0,
                        power=2.0, pad_mode="reflect", log="db10", amin=1e-10)
CAPTION_MEL_32K = PANNS_MEL_32K
NEURALSEQ_MEL_22K = MelSpec(22050, 1024, 256, 1024, 80, 80.0, 7600.0,
                            power=1.0, pad_mode="constant", log="log10", amin=1e-5)
# opencpop SVS frontend (egs/egs_bases/svs/midi/e2e/opencpop/ds1000.yaml:
# sr 24k, fft/win 512, hop 128, 80 mels, 30-12000 Hz)
NEURALSEQ_MEL_24K = MelSpec(24000, 512, 128, 512, 80, 30.0, 12000.0,
                            power=1.0, pad_mode="constant", log="log10", amin=1e-5)
WHISPER_MEL_16K = MelSpec(16000, 400, 160, 400, 80, 0.0, 8000.0,
                          power=2.0, pad_mode="reflect", log="log10", amin=1e-10)


@functools.partial(jax.jit, static_argnames=("spec",))
def log_mel(x: jnp.ndarray, spec: MelSpec) -> jnp.ndarray:
    """Waveform ``[..., T]`` → log-mel ``[..., frames, n_mels]``."""
    s = spectrogram(
        x, spec.n_fft, spec.hop, spec.win_length,
        center=True, pad_mode=spec.pad_mode, power=spec.power,
    )
    mel = jnp.matmul(s, jnp.asarray(spec.filterbank()),
                     preferred_element_type=jnp.float32)
    if spec.log == "none":
        return mel
    clamped = jnp.maximum(mel, spec.amin)
    if spec.log == "log10":
        return jnp.log10(clamped)
    if spec.log == "db10":
        return 10.0 * jnp.log10(clamped)
    if spec.log == "db20":
        return 20.0 * jnp.log10(clamped)
    raise ValueError(spec.log)


def ldm_normalize(log10_mel: jnp.ndarray) -> jnp.ndarray:
    """TRANSFORMS_16000 tail: 20*log10(mel) − 20 + 100, /100, clip [0,1]."""
    return jnp.clip((log10_mel * 20.0 - 20.0 + 100.0) / 100.0, 0.0, 1.0)


def ldm_denormalize(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`ldm_normalize` back to log10-mel."""
    return (x * 100.0 - 100.0 + 20.0) / 20.0


def ldm_mel(x: jnp.ndarray) -> jnp.ndarray:
    """Full Make-An-Audio frontend: wav 16k → normalized mel in [0,1],
    ``[..., frames, 80]`` (reference is ``[80, frames]``; transpose at the
    torch boundary)."""
    return ldm_normalize(log_mel(x, LDM_MEL_16K))


def amp_to_db(x: jnp.ndarray) -> jnp.ndarray:
    """NeuralSeq ``utils/audio.py:amp_to_db``: 20*log10(max(1e-5, x))."""
    return 20.0 * jnp.log10(jnp.maximum(1e-5, x))


def normalize_db(s_db: jnp.ndarray, min_level_db: float = -100.0) -> jnp.ndarray:
    return (s_db - min_level_db) / -min_level_db


def denormalize_db(x: jnp.ndarray, min_level_db: float = -100.0) -> jnp.ndarray:
    return x * -min_level_db + min_level_db
