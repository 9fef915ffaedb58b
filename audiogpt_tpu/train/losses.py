"""Shared masked loss helpers for TTS/SVS tasks.

Reference: ``NeuralSeq/tasks/tts/fs2.py:140-286`` (mel L1/SSIM with
nonzero-speech weights, log-domain duration MSE, f0 L1 + uv BCE, energy MSE).
All losses here take explicit masks — the static-shape batches carry padded
frames AND whole dummy rows (``batch['weight']``), and both must zero out.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return (x * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def weights_nonzero_speech(target: jnp.ndarray) -> jnp.ndarray:
    """[B, T, M] mel → [B, T] 1.0 where the frame isn't all-zero padding
    (fs2.py ``weights_nonzero_speech``)."""
    return (jnp.abs(target).sum(-1) > 0).astype(jnp.float32)


def mel_l1_loss(pred, target, row_weight=None):
    w = weights_nonzero_speech(target)
    if row_weight is not None:
        w = w * row_weight[:, None]
    return (jnp.abs(pred - target) * w[..., None]).sum() / \
        jnp.maximum(w.sum() * target.shape[-1], 1.0)


def uniform_mel2ph(txt_lengths: jnp.ndarray, mel_lengths: jnp.ndarray,
                   n_frames: int) -> jnp.ndarray:
    """Uniform frame→phone alignment for corpora without forced alignment
    (the reference REQUIRES MFA TextGrids, ``base_binarizer.py:188``; this
    fallback distributes each item's frames evenly over its tokens so the
    duration/pitch losses stay defined)."""
    b = txt_lengths.shape[0]
    f_idx = jnp.arange(n_frames)[None, :]
    valid = f_idx < mel_lengths[:, None]
    ph = jnp.floor(f_idx * txt_lengths[:, None] /
                   jnp.maximum(mel_lengths[:, None], 1)) + 1
    ph = jnp.clip(ph, 1, jnp.maximum(txt_lengths[:, None], 1))
    return jnp.where(valid, ph, 0).astype(jnp.int32)


def mel2ph_to_dur(mel2ph: jnp.ndarray, n_tokens: int) -> jnp.ndarray:
    """[B, F] frame→phone map → [B, T] per-phone frame counts
    (``modules/fastspeech/tts_modules.py`` mel2ph_to_dur)."""
    b = mel2ph.shape[0]
    counts = jnp.zeros((b, n_tokens + 1), jnp.float32)
    counts = counts.at[jnp.arange(b)[:, None], mel2ph].add(1.0)
    return counts[:, 1:]


def dur_loss(dur_pred_log, mel2ph, txt_tokens, row_weight=None,
             lambda_ph: float = 0.1, lambda_sent: float = 1.0):
    """Log-domain phone-duration MSE + sentence-duration MSE
    (fs2.py:175-218, 'mse' branch)."""
    nonpad = (txt_tokens > 0).astype(jnp.float32)
    if row_weight is not None:
        nonpad = nonpad * row_weight[:, None]
    dur_gt = mel2ph_to_dur(mel2ph, txt_tokens.shape[1]) * nonpad
    pdur = masked_mean((dur_pred_log - jnp.log(dur_gt + 1.0)) ** 2, nonpad)
    losses = {"pdur": pdur * lambda_ph}
    if lambda_sent > 0:
        sent_p = (jnp.exp(dur_pred_log) - 1.0).clip(0) * nonpad
        sdur = (jnp.log(sent_p.sum(-1) + 1.0) - jnp.log(dur_gt.sum(-1) + 1.0)) ** 2
        if row_weight is not None:
            sdur = (sdur * row_weight).sum() / jnp.maximum(row_weight.sum(), 1.0)
        else:
            sdur = sdur.mean()
        losses["sdur"] = sdur * lambda_sent
    return losses


def f0_loss(pitch_pred, f0_norm, uv, mel2ph, row_weight=None,
            lambda_f0: float = 1.0, lambda_uv: float = 1.0,
            use_uv: bool = True):
    """f0 L1 on voiced frames + uv logit BCE (fs2.py:254-269)."""
    nonpad = (mel2ph > 0).astype(jnp.float32)
    if row_weight is not None:
        nonpad = nonpad * row_weight[:, None]
    losses = {}
    if use_uv:
        logits = pitch_pred[..., 1]
        bce = jnp.maximum(logits, 0) - logits * uv + \
            jnp.log1p(jnp.exp(-jnp.abs(logits)))
        losses["uv"] = masked_mean(bce, nonpad) * lambda_uv
        nonpad = nonpad * (uv == 0).astype(jnp.float32)
    losses["f0"] = masked_mean(
        jnp.abs(pitch_pred[..., 0] - f0_norm), nonpad) * lambda_f0
    return losses


def energy_loss(energy_pred, energy, lambda_energy: float = 0.1):
    nonpad = (energy != 0).astype(jnp.float32)
    return masked_mean((energy_pred - energy) ** 2, nonpad) * lambda_energy
