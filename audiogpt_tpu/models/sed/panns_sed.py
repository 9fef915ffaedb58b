"""Sound-event detection with framewise output (AudioSet, 527 classes).

The reference serves a PVT transformer over the PANN frontend
(``audio_detection/audio_infer/pytorch/models.py:141``; 32 kHz / 1024 fft /
320 hop / 64 mel; framewise sigmoid + 32× interpolation + clipwise pooling).
Per SURVEY.md §7.8 we provide the cleaner PANN decision-level architecture on
the same frontend with the same output contract:

  * ``framewise_output`` [B, frames, 527] — sigmoid per frame, ×32
    interpolated back to mel-frame rate,
  * ``clipwise_output`` [B, 527],
  * the same AudioSet label set (bundled ``data/audioset_labels.csv``, public
    AudioSet metadata the reference loads at ``audio_infer/utils/config.py:4``).

The tool layer draws the same "top-k event curves" payload the reference
plots (``audio-chatgpt.py:658-673``) from ``detect_events``.
"""

from __future__ import annotations

import csv
import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audiogpt_tpu.models.caption.cnn14 import Cnn14Config, Cnn14Encoder


@dataclasses.dataclass(frozen=True)
class SEDConfig:
    cnn14: Cnn14Config = Cnn14Config()
    classes_num: int = 527
    interpolate_ratio: int = 32
    sample_rate: int = 32000
    hop: int = 320


@functools.lru_cache(maxsize=1)
def audioset_labels() -> list[str]:
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "data", "audioset_labels.csv")
    with open(path) as f:
        return [row["display_name"] for row in csv.DictReader(f)]


class SEDModel(nn.Module):
    cfg: SEDConfig

    @nn.compact
    def __call__(self, wav, wav_len=None, train: bool = False):
        cfg = self.cfg
        enc = Cnn14Encoder(cfg.cnn14, name="backbone")(wav, wav_len, train=train)
        attn = enc["attn_emb"]                     # [B, frames/32, 2048]
        frame_logits = nn.Dense(cfg.classes_num, name="fc_frame")(attn)
        framewise = jax.nn.sigmoid(frame_logits)   # [B, T/32, C]
        # nearest-neighbor 32× interpolation (models.py interpolate():204)
        framewise_up = jnp.repeat(framewise, cfg.interpolate_ratio, axis=1)
        clipwise = jnp.clip(jnp.max(framewise, axis=1), 1e-7, 1.0)
        return {
            "framewise_output": framewise_up,
            "clipwise_output": clipwise,
            "embedding": enc["fc_emb"],
        }


def detect_events(framewise: np.ndarray, labels: list[str] | None = None,
                  top_k: int = 10, frames_per_second: float = 100.0):
    """Top-k classes by peak framewise probability with their curves —
    the payload the reference plots (``audio-chatgpt.py:655-673``)."""
    labels = labels or audioset_labels()
    peak = framewise.max(axis=0)
    idx = np.argsort(peak)[::-1][:top_k]
    return [
        {
            "label": labels[i] if i < len(labels) else str(i),
            "peak": float(peak[i]),
            "curve": framewise[:, i],
            "frames_per_second": frames_per_second,
        }
        for i in idx
    ]
