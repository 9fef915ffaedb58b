"""Shared DSP frontend — one implementation of STFT / iSTFT / log-mel /
resample / f0 utilities for every model family.

Replaces the reference's scattered per-model transforms:
  * Make-An-Audio's ``TRANSFORMS_16000`` librosa chain
    (``ldm/data/extract_mel_spectrogram.py:140``),
  * torchlibrosa ``Spectrogram`` + ``LogmelFilterBank`` in PVT
    (``audio_detection/audio_infer/pytorch/models.py:155-162``),
  * NeuralSeq's ``utils/audio.py`` librosa STFT + amp_to_db,
  * sound_extraction's hand-written conv STFT/iSTFT
    (``sound_extraction/utils/stft.py:53``).

Everything here is pure jnp, static-shaped, jit- and vmap-friendly.
"""

from audiogpt_tpu.dsp.window import hann_window  # noqa: F401
from audiogpt_tpu.dsp.stft import stft, istft, frame, spectrogram  # noqa: F401
from audiogpt_tpu.dsp.mel import (  # noqa: F401
    mel_filterbank,
    MelSpec,
    LDM_MEL_16K,
    PANNS_MEL_32K,
    NEURALSEQ_MEL_22K,
    CAPTION_MEL_32K,
    log_mel,
    ldm_normalize,
    ldm_denormalize,
)
from audiogpt_tpu.dsp.resample import resample  # noqa: F401
