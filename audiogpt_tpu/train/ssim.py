"""SSIM on mel 'images' — FastSpeech2's auxiliary reconstruction loss.

Reference: ``NeuralSeq/modules/commons/ssim.py`` (391 LoC torch port of the
classic Wang et al. implementation; invoked with window 11, sigma 1.5, inputs
shifted by +6 in ``tasks/tts/fs2.py:164-173``). Here: ~40 lines of JAX — the
gaussian-window convolutions become two depthwise convs that XLA fuses.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=8)
def _gaussian_window(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, win: np.ndarray) -> jnp.ndarray:
    """Separable gaussian filter over the last two axes of [B, H, W]."""
    k = len(win)
    pad = k // 2
    w_h = jnp.asarray(win).reshape(1, 1, k, 1)
    w_w = jnp.asarray(win).reshape(1, 1, 1, k)
    x = img[:, None]  # [B, 1, H, W]
    x = lax.conv_general_dilated(x, w_h, (1, 1), [(pad, pad), (0, 0)])
    x = lax.conv_general_dilated(x, w_w, (1, 1), [(0, 0), (pad, pad)])
    return x[:, 0]


def ssim(x: jnp.ndarray, y: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5, c1: float = 0.01 ** 2,
         c2: float = 0.03 ** 2) -> jnp.ndarray:
    """Per-pixel SSIM map for [B, H, W] images (no averaging — callers weight
    by the padding mask as the reference's ``size_average=False`` path does)."""
    win = _gaussian_window(window_size, sigma)
    mu_x, mu_y = _blur(x, win), _blur(y, win)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = _blur(x * x, win) - mu_x2
    sig_y = _blur(y * y, win) - mu_y2
    sig_xy = _blur(x * y, win) - mu_xy
    return ((2 * mu_xy + c1) * (2 * sig_xy + c2)) / \
        ((mu_x2 + mu_y2 + c1) * (sig_x + sig_y + c2))


def ssim_loss(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray,
              bias: float = 6.0) -> jnp.ndarray:
    """1 - SSIM, masked mean — mirrors ``FastSpeech2Task.ssim_loss``
    (``fs2.py:164-173``). pred/target [B, T, M], mask [B, T]."""
    s = ssim(pred + bias, target + bias)
    w = mask[..., None]
    return ((1.0 - s) * w).sum() / jnp.maximum(w.sum() * pred.shape[-1], 1.0)
