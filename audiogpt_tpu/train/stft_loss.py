"""Multi-resolution STFT loss for vocoder training.

Reference: ``NeuralSeq/modules/parallel_wavegan/losses/stft_loss.py`` (153
LoC): per-resolution spectral-convergence loss ‖|S_r|-|S_f|‖_F / ‖|S_r|‖_F
plus log-magnitude L1, averaged over resolutions (1024/120/600, 2048/240/1200,
512/50/240). Here both terms ride the shared jitted STFT."""

from __future__ import annotations

import jax.numpy as jnp

from audiogpt_tpu.dsp.stft import stft

RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def _magnitude(x: jnp.ndarray, n_fft: int, hop: int, win: int) -> jnp.ndarray:
    s = stft(x, n_fft=n_fft, hop=hop, win_length=win)
    return jnp.sqrt(jnp.clip((s.real ** 2 + s.imag ** 2), 1e-7, None))


def stft_loss(fake: jnp.ndarray, real: jnp.ndarray,
              resolutions=RESOLUTIONS) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(spectral_convergence, log_magnitude) losses, each averaged over
    resolutions. Inputs [B, T]."""
    sc, mag = 0.0, 0.0
    for n_fft, hop, win in resolutions:
        mf = _magnitude(fake, n_fft, hop, win)
        mr = _magnitude(real, n_fft, hop, win)
        sc += jnp.linalg.norm(mr - mf) / jnp.clip(jnp.linalg.norm(mr), 1e-7)
        mag += jnp.mean(jnp.abs(jnp.log(mr) - jnp.log(mf)))
    n = len(resolutions)
    return sc / n, mag / n
