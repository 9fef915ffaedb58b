"""Sample-rate conversion as a jnp polyphase FIR (replaces librosa.resample,
used by the reference at e.g. ``audio-chatgpt.py:814`` and implicitly in every
``librosa.core.load(sr=...)``).

Design: rational resampling L/M with a Kaiser-windowed sinc prototype, applied
as a strided conv — a single ``lax.conv_general_dilated`` with input dilation,
which XLA maps onto the MXU/VPU. Static shapes: output length is a pure
function of input length.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as _sig


@functools.lru_cache(maxsize=None)
def _kernel(up: int, down: int, zeros: int = 24, beta: float = 14.769656459379492):
    """Kaiser-windowed sinc lowpass at cutoff min(1/up, 1/down)."""
    cutoff = 0.5 / max(up, down)
    half = zeros * max(up, down)
    n = np.arange(-half, half + 1, dtype=np.float64)
    taps = 2 * cutoff * np.sinc(2 * cutoff * n) * _sig.windows.kaiser(2 * half + 1, beta)
    return (taps * up).astype(np.float32)


def _ratio(orig_sr: int, target_sr: int) -> tuple[int, int]:
    g = math.gcd(orig_sr, target_sr)
    return target_sr // g, orig_sr // g


def output_length(n: int, orig_sr: int, target_sr: int) -> int:
    up, down = _ratio(orig_sr, target_sr)
    return int(np.ceil(n * up / down))


@functools.partial(jax.jit, static_argnames=("orig_sr", "target_sr"))
def resample(x: jnp.ndarray, orig_sr: int, target_sr: int) -> jnp.ndarray:
    """Resample ``[..., T]`` from ``orig_sr`` to ``target_sr``."""
    if orig_sr == target_sr:
        return x
    up, down = _ratio(orig_sr, target_sr)
    taps = jnp.asarray(_kernel(up, down))
    k = taps.shape[0]
    n_in = x.shape[-1]
    n_out = output_length(n_in, orig_sr, target_sr)

    batch_shape = x.shape[:-1]
    xf = x.reshape((-1, 1, n_in))  # NCW
    # upsample by input dilation, filter, then take every `down`-th sample.
    # NOTE: lhs_dilation compiles slowly on XLA:TPU (see ops/conv.py), but
    # this op runs on the offline data-prep path (binarizer/wav_processors)
    # and compiles once per (sr-pair, bucket) — the rational up/down phase
    # decomposition isn't worth its index bookkeeping here.
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        xf,
        taps.reshape(1, 1, k),
        window_strides=(down,),
        padding=[(pad, pad + down)],
        lhs_dilation=(up,),
        dimension_numbers=("NCW", "OIW", "NCW"),
    )
    y = y[..., :n_out]
    # pad if conv produced fewer than the ceil-length samples
    short = n_out - y.shape[-1]
    if short > 0:
        y = jnp.pad(y, ((0, 0), (0, 0), (0, short)))
    return y.reshape(batch_shape + (n_out,)).astype(x.dtype)
