"""STFT / iSTFT as pure jnp ops (framing → window → rFFT).

On TPU the FFT runs on XLA's native FFT; framing is a strided gather that XLA
fuses with the window multiply. This one implementation serves every model
family (librosa semantics: center padding, hann analysis window padded to
n_fft; cf. ``extract_mel_spectrogram.py:36``, ``audio_infer/pytorch/models.py:155``,
``NeuralSeq/utils/audio.py:_stft``).

Conventions: input waveforms are float32 arrays shaped ``[..., T]``; outputs
are ``[..., frames, n_fft//2+1]`` (time-major — the natural layout for
downstream mel matmul on the MXU; note librosa is freq-major).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audiogpt_tpu.dsp.window import hann_window, pad_center


def n_frames(n_samples: int, hop: int, n_fft: int, center: bool = True) -> int:
    if center:
        return 1 + n_samples // hop
    return 1 + (n_samples - n_fft) // hop


def frame(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Frame ``[..., T]`` into ``[..., n_frames, frame_length]`` windows."""
    t = x.shape[-1]
    num = 1 + (t - frame_length) // hop
    # gather-based framing: XLA lowers this to an efficient strided copy
    idx = np.arange(frame_length)[None, :] + hop * np.arange(num)[:, None]
    return x[..., idx]


def _pad_signal(x: jnp.ndarray, n_fft: int, pad_mode: str) -> jnp.ndarray:
    pad = n_fft // 2
    cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    if pad_mode == "constant":
        return jnp.pad(x, cfg)
    if pad_mode == "reflect":
        return jnp.pad(x, cfg, mode="reflect")
    raise ValueError(f"pad_mode {pad_mode}")


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop", "win_length", "center", "pad_mode")
)
def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_length: int | None = None,
    center: bool = True,
    pad_mode: str = "constant",
) -> jnp.ndarray:
    """Complex STFT, ``[..., T] -> [..., frames, n_fft//2+1]``."""
    win_length = win_length or n_fft
    window = pad_center(hann_window(win_length), n_fft)
    if center:
        x = _pad_signal(x, n_fft, pad_mode)
    frames = frame(x, n_fft, hop) * jnp.asarray(window)
    return jnp.fft.rfft(frames, axis=-1)


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop", "win_length", "center", "pad_mode", "power")
)
def spectrogram(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_length: int | None = None,
    center: bool = True,
    pad_mode: str = "constant",
    power: float = 1.0,
) -> jnp.ndarray:
    """Magnitude (power=1) or power (power=2) spectrogram."""
    s = stft(x, n_fft, hop, win_length, center, pad_mode)
    mag2 = s.real * s.real + s.imag * s.imag
    if power == 2.0:
        return mag2
    if power == 1.0:
        return jnp.sqrt(mag2)
    return jnp.power(mag2, power / 2.0)


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop", "win_length", "center", "length")
)
def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_length: int | None = None,
    center: bool = True,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT by windowed overlap-add with window-sumsquare
    normalization (the standard NOLA inverse; cf. the reference's conv iSTFT
    ``sound_extraction/utils/stft.py:10-80``).

    ``spec``: ``[..., frames, n_fft//2+1]`` complex → ``[..., T]`` float32.
    """
    win_length = win_length or n_fft
    window = jnp.asarray(pad_center(hann_window(win_length), n_fft))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window  # [..., F, n_fft]

    num = spec.shape[-2]
    t_full = n_fft + hop * (num - 1)

    # scatter-add overlapping frames: dimension_numbers via segment-sum trick
    def _ola(fr):  # fr: [F, n_fft]
        idx = (
            np.arange(n_fft)[None, :] + hop * np.arange(num)[:, None]
        ).reshape(-1)
        sig = jax.ops.segment_sum(fr.reshape(-1), idx, num_segments=t_full)
        wss = jax.ops.segment_sum(
            jnp.tile(window * window, (num,)), jnp.asarray(idx), num_segments=t_full
        )
        return sig / jnp.maximum(wss, 1e-11)

    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, num, n_fft))
    out = jax.vmap(_ola)(flat).reshape(batch_shape + (t_full,))

    if center:
        out = out[..., n_fft // 2 : t_full - n_fft // 2]
    if length is not None:
        out = out[..., :length]
        pad = length - out.shape[-1]
        if pad > 0:
            out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, pad)])
    return out.astype(jnp.float32)
