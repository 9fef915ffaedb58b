"""Target sound detection (TSD): detect on/offsets of a *described* sound.

Re-design of the reference's CDur_CNN14
(``audio_detection/target_sound_detection/src/models.py:964``): Cnn10
features (4 PANN conv blocks, pooling schedule by time resolution) → frame
features concatenated with a conditioning embedding (CLIP-text match against
reference embeddings, ``audio-chatgpt.py:833-875``) → BiGRU → 2-way softmax
per frame → linear interpolation back to input frames.

Post-processing (numpy): binarize → median filter → contiguous regions →
(onset, offset) seconds — ``src/utils.py:median_filter/decode_with_timestamps``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from scipy import ndimage

from audiogpt_tpu.ops.rnn import GRU

_POOL_SCHEDULES = {
    8: ((2, 2), (2, 2), (2, 4), (1, 4)),
    4: ((2, 2), (2, 2), (1, 4), (1, 4)),
    2: ((2, 2), (1, 2), (1, 4), (1, 4)),
    0: ((1, 2), (1, 2), (1, 4), (1, 4)),
}


@dataclasses.dataclass(frozen=True)
class TSDConfig:
    mel_bins: int = 64
    embedding_dim: int = 128
    scale: int = 8                  # time_resolution 125 ← input 500 frames
    gru_hidden: int = 512
    channels: tuple = (64, 128, 256, 512)


class TSDModel(nn.Module):
    cfg: TSDConfig

    @nn.compact
    def __call__(self, mel, embedding, train: bool = False):
        """mel [B, T, M], embedding [B, E] → (decision_time [B, T', ],
        decision_up [B, T, 2])."""
        cfg = self.cfg
        t_in = mel.shape[1]
        x = mel[..., None]  # NHWC [B, T, M, 1]
        for bi, (ch, pool) in enumerate(zip(cfg.channels, _POOL_SCHEDULES[cfg.scale])):
            # PANN ConvBlock with a rectangular pooling schedule
            for i in (1, 2):
                x = nn.Conv(ch, (3, 3), padding="SAME", use_bias=False,
                            name=f"b{bi}_conv{i}")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name=f"b{bi}_bn{i}")(x)
                x = jax.nn.relu(x)
            x = nn.avg_pool(x, pool, strides=pool)
        b, t, m, c = x.shape
        x = x.transpose(0, 1, 3, 2).reshape(b, t, c * m)  # flatten(ch, mel)
        emb = jnp.repeat(embedding[:, None, :], t, axis=1)
        x = jnp.concatenate([x, emb], axis=-1)
        x = GRU(cfg.gru_hidden, bidirectional=True, name="gru")(x)
        x = nn.Dense(256, name="fc")(x)
        decision_time = jax.nn.softmax(nn.Dense(2, name="outputlayer")(x), axis=-1)
        # linear interpolation back to the input frame count
        up = jax.image.resize(decision_time, (b, t_in, 2), method="linear")
        return decision_time[..., 0], up


def binarize(x: np.ndarray, threshold: float = 0.5) -> np.ndarray:
    return (x > threshold).astype(np.int32)


def median_filter(x: np.ndarray, window_size: int, threshold: float = 0.5):
    """src/utils.py:189 semantics."""
    x = binarize(x, threshold)
    if x.ndim == 3:
        size = (1, window_size, 1)
    elif x.ndim == 2 and x.shape[0] == 1:
        size = (1, window_size)
    else:
        size = (window_size, 1)
    return ndimage.median_filter(x, size=size)


def find_contiguous_regions(activity: np.ndarray) -> np.ndarray:
    change = np.logical_xor(activity[1:], activity[:-1]).nonzero()[0] + 1
    if activity[0]:
        change = np.r_[0, change]
    if activity[-1]:
        change = np.r_[change, activity.size]
    return change.reshape((-1, 2))


def decode_timestamps(probs: np.ndarray, frame_rate: float,
                      window_size: int = 1, threshold: float = 0.5):
    """probs [T] → [(onset_sec, offset_sec), ...]."""
    act = median_filter(probs[None], window_size, threshold)[0].astype(bool)
    if not act.any():
        return []
    return [(s / frame_rate, e / frame_rate) for s, e in find_contiguous_regions(act)]
