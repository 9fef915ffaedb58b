"""Fundamental-frequency (f0) estimation and CWT decomposition.

The reference extracts f0 with parselmouth/Praat on the host
(``NeuralSeq/data_gen/tts/data_gen_utils.py`` ``get_pitch``) and decomposes it
into a 10-scale continuous wavelet transform with pycwt
(``NeuralSeq/utils/cwt.py:53-79``) for FastSpeech2's CWT pitch mode.

TPU re-design: a batched, jittable normalized-autocorrelation pitch tracker
(frame → rFFT autocorrelation → peak pick with parabolic interpolation) that
runs on-device next to the mel frontend, plus a NumPy Mexican-hat CWT with the
same scale layout as the reference (dt=0.005, dj=1, s0=2dt, J=9 → 10 scales)
and the reference's fixed-weight inverse recomposition
(``cwt.py:inverse_cwt``: weights ``(i+1+2.5)^-2.5``, then re-standardize).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# f0 → coarse bucket constants (pitch_utils.py:15-19)
F0_BIN = 256
F0_MAX = 1100.0
F0_MIN = 50.0
_F0_MEL_MIN = 1127.0 * np.log(1.0 + F0_MIN / 700.0)
_F0_MEL_MAX = 1127.0 * np.log(1.0 + F0_MAX / 700.0)


# ---------------------------------------------------------------------------
# On-device pitch tracking (replaces parselmouth ac method on host CPU)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("sr", "hop", "win", "fmin", "fmax"))
def estimate_f0(
    wav: jnp.ndarray,
    sr: int = 22050,
    hop: int = 256,
    win: int = 1024,
    fmin: float = 80.0,
    fmax: float = 750.0,
    voicing_threshold: float = 0.45,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized-autocorrelation f0 tracker.

    Args:
      wav: [T] mono audio.
    Returns:
      (f0, uv): per-frame Hz (0 where unvoiced) and voiced mask, each of
      length ``ceil(T / hop)`` to line up with mel frames (center-padded).
    """
    n_frames = (wav.shape[0] + hop - 1) // hop
    pad = win // 2
    x = jnp.pad(wav, (pad, pad + n_frames * hop))
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(win)[None, :]
    frames = x[idx]                                       # [F, win]
    frames = frames - frames.mean(axis=-1, keepdims=True)

    # Autocorrelation via rFFT (win zero-padded to 2*win for linear acf).
    n_fft = 2 * win
    spec = jnp.fft.rfft(frames, n=n_fft)
    acf = jnp.fft.irfft(spec * jnp.conj(spec), n=n_fft)[:, :win]  # [F, win]
    energy = acf[:, :1]
    nacf = acf / jnp.maximum(energy, 1e-10)

    lag_min = int(sr / fmax)
    lag_max = min(int(sr / fmin), win - 2)
    lags = jnp.arange(win)
    valid = (lags >= lag_min) & (lags <= lag_max)
    scores = jnp.where(valid[None, :], nacf, -1.0)
    best = jnp.argmax(scores, axis=-1)                    # [F]

    # Parabolic interpolation around the peak for sub-sample lag accuracy.
    f_idx = jnp.arange(n_frames)
    y0 = nacf[f_idx, jnp.maximum(best - 1, 0)]
    y1 = nacf[f_idx, best]
    y2 = nacf[f_idx, jnp.minimum(best + 1, win - 1)]
    denom = y0 - 2.0 * y1 + y2
    delta = jnp.where(jnp.abs(denom) > 1e-8,
                      0.5 * (y0 - y2) / jnp.where(jnp.abs(denom) > 1e-8, denom, 1.0),
                      0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    lag = best.astype(jnp.float32) + delta

    f0 = sr / jnp.maximum(lag, 1.0)
    peak = y1
    voiced = (peak > voicing_threshold) & (energy[:, 0] > 1e-7) & \
        (f0 >= fmin) & (f0 <= fmax)
    f0 = jnp.where(voiced, f0, 0.0)
    return f0, voiced.astype(jnp.float32)


def f0_to_coarse(f0: np.ndarray) -> np.ndarray:
    """Quantize Hz → 256 mel-spaced buckets (pitch_utils.py:22-31)."""
    f0 = np.asarray(f0, np.float64)
    f0_mel = 1127.0 * np.log(1.0 + f0 / 700.0)
    pos = f0_mel > 0
    f0_mel[pos] = (f0_mel[pos] - _F0_MEL_MIN) * (F0_BIN - 2) / \
        (_F0_MEL_MAX - _F0_MEL_MIN) + 1.0
    f0_mel = np.clip(f0_mel, 1.0, F0_BIN - 1)
    return np.rint(f0_mel).astype(np.int32)


# ---------------------------------------------------------------------------
# Continuous f0 + CWT decomposition (cwt.py parity)
# ---------------------------------------------------------------------------

def continuous_f0(f0: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(uv, continuous f0): hold-extend the edges, linearly interpolate the
    unvoiced gaps (cwt.py:convert_continuos_f0)."""
    f0 = np.asarray(f0, np.float64).copy()
    uv = (f0 != 0).astype(np.float32)
    nz = np.flatnonzero(f0)
    if nz.size == 0:
        return uv, f0
    f0[: nz[0]] = f0[nz[0]]
    f0[nz[-1]:] = f0[nz[-1]]
    nz = np.flatnonzero(f0)
    cont = np.interp(np.arange(len(f0)), nz, f0[nz])
    return uv, cont


def continuous_lf0(f0: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    uv, cont = continuous_f0(f0)
    return uv, np.log(np.maximum(cont, 1e-8))


# Reference scale layout (cwt.py:60-64): Mexican hat, 10 dyadic scales.
CWT_DT = 0.005
CWT_DJ = 1.0
CWT_S0 = 2 * CWT_DT
CWT_J = 9
CWT_SCALES = CWT_S0 * 2.0 ** (CWT_DJ * np.arange(CWT_J + 1))


def _mexican_hat_ft(w: np.ndarray) -> np.ndarray:
    """Fourier transform of the DOG(m=2) 'Mexican hat' mother wavelet
    (Torrence & Compo 1998, Table 1)."""
    m = 2
    from scipy.special import gamma as _gamma
    norm = 1.0 / np.sqrt(_gamma(m + 0.5))
    return norm * (w ** m) * np.exp(-0.5 * w ** 2) * (w > 0)


def cwt_lf0(lf0: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Mexican-hat CWT of a (normalized) log-f0 track.

    Returns (W, scales): W is real, shape [T, 10] — same layout as
    ``get_lf0_cwt`` (cwt.py:53-69).
    """
    x = np.asarray(lf0, np.float64)
    n = len(x)
    n_fft = int(2 ** np.ceil(np.log2(n))) if n > 1 else 2
    x_hat = np.fft.fft(x, n_fft)
    w_k = 2.0 * np.pi * np.fft.fftfreq(n_fft, CWT_DT)

    out = np.empty((CWT_J + 1, n))
    for j, s in enumerate(CWT_SCALES):
        # T&C eq. 4 with the sqrt(2*pi*s/dt) energy normalization.
        psi_hat = np.sqrt(2.0 * np.pi * s / CWT_DT) * _mexican_hat_ft(s * w_k)
        out[j] = np.real(np.fft.ifft(x_hat * np.conj(psi_hat)))[:n]
    return out.T, CWT_SCALES.copy()


def norm_scale(W: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Standardize each of the 10 scales (cwt.py:norm_scale)."""
    mean = W.mean(axis=0, keepdims=True)
    std = W.std(axis=0, keepdims=True)
    return (W - mean) / np.maximum(std, 1e-8), mean, std


def inverse_cwt(W, scales=None):
    """Fixed-weight recomposition used at inference (cwt.py:inverse_cwt):
    sum over scales with weights ``(i+1+2.5)^-2.5``, then re-standardize.
    Accepts [B, T, S] (numpy or jnp)."""
    xp = jnp if isinstance(W, jnp.ndarray) else np
    n_scales = W.shape[-1] if scales is None else len(scales)
    b = (xp.arange(n_scales)[None, None, :] + 1.0 + 2.5) ** (-2.5)
    rec = (W * b).sum(-1)
    mean = rec.mean(-1, keepdims=True)
    std = rec.std(-1, keepdims=True)
    return (rec - mean) / xp.maximum(std, 1e-8)


def cwt2f0(cwt_spec, mean, std):
    """[B, T, 10] CWT + per-utterance lf0 (mean, std) → f0 Hz (cwt.py:cwt2f0)."""
    xp = jnp if isinstance(cwt_spec, jnp.ndarray) else np
    lf0 = inverse_cwt(cwt_spec)
    lf0 = lf0 * std[:, None] + mean[:, None]
    return xp.exp(lf0)
