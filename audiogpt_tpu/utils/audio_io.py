"""WAV I/O without librosa/soundfile (neither ships in this image).

Covers the reference's usage: ``soundfile.write`` / ``wavfile.write`` of
int16/float wavs (``audio-chatgpt.py:210,294``, ``NeuralSeq/utils/audio.py:
save_wav``) and ``librosa.core.load(sr=..., mono=True)`` — load + mixdown +
resample (``audio-chatgpt.py:636``).
"""

from __future__ import annotations

import numpy as np
from scipy.io import wavfile

from audiogpt_tpu.dsp.resample import resample


def save_wav(wav: np.ndarray, path: str, sr: int, norm: bool = False) -> None:
    wav = np.asarray(wav, dtype=np.float32)
    if norm and np.abs(wav).max() > 0:
        wav = wav / np.abs(wav).max()
    wav = np.clip(wav, -1.0, 1.0)
    wavfile.write(path, sr, (wav * 32767).astype(np.int16))


def load_wav(path: str, sr: int | None = None, mono: bool = True):
    """Returns (wav float32 in [-1,1], sample_rate). If ``sr`` is given the
    audio is resampled (librosa.load semantics)."""
    file_sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        wav = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        wav = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        wav = (data.astype(np.float32) - 128.0) / 128.0
    else:
        wav = data.astype(np.float32)
    if mono and wav.ndim == 2:
        wav = wav.mean(axis=1)
    if sr is not None and sr != file_sr:
        wav = np.asarray(resample(wav, file_sr, sr))
        file_sr = sr
    return wav, file_sr


def wav_stream_header(sr: int, channels: int = 1, bits: int = 16) -> bytes:
    """RIFF/WAVE header for a PCM stream of unknown length (chunk sizes
    0xFFFFFFFF — the streaming-WAV convention players accept; the HTTP
    ``/tts/stream`` endpoint writes this once, then raw PCM as synthesized)."""
    import struct

    byte_rate = sr * channels * bits // 8
    block_align = channels * bits // 8
    return (b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, sr,
                                    byte_rate, block_align, bits)
            + b"data" + struct.pack("<I", 0xFFFFFFFF))
