"""HTSAT — hierarchical token-semantic audio transformer (CLAP audio tower).

Checkpoint-compatible rebuild of ``ldm/modules/encoders/open_clap/htsat.py``
(1021 LoC torch Swin for audio, factory at ``open_clap/factory.py``,
HTSAT-tiny config at ``open_clap/model_configs/HTSAT-tiny.json``):

  wav → power-spec log-mel (48 kHz / 1024 / 480 / 64 mels) → per-mel-bin
  BatchNorm (``bn0``) → ``reshape_wav2img`` (bicubic align-corners stretch of
  the time axis to ``spec_size·freq_ratio`` frames, then freq_ratio time
  chunks stacked along the frequency axis → a square [256, 256] image) →
  4×4 patch embed → 4 Swin stages (windowed MSA with relative position bias,
  **masked** shifted windows between blocks, patch merging between stages) →
  final LayerNorm → mean-pooled ``embedding`` [B, 8·embed_dim] + a
  token-semantic conv head (``tscam_conv``) for clip/framewise AudioSet
  logits.

TPU notes: windows partition via reshape (static shapes); shifts via
``jnp.roll`` **with the Swin boundary attention mask** (without it rolled
windows attend across wrap-around edges — the round-1 divergence); masks and
relative-position indices are numpy constants baked at trace time. Weight
import: ``utils/torch_import.py`` family ``htsat`` / ``clap_audio``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audiogpt_tpu.dsp.mel import HTSAT_MEL_48K, MelSpec, log_mel


@dataclasses.dataclass(frozen=True)
class HTSATConfig:
    mel: MelSpec = HTSAT_MEL_48K
    spec_size: int = 256            # Swin input image side
    patch: int = 4                  # patch size == patch stride (htsat.py:624)
    window: int = 8
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    mlp_ratio: int = 4
    num_classes: int = 527
    d_proj: int = 1024              # CLAP joint space (audio_projection out)
    project: bool = True            # apply the CLAP audio_projection MLP

    @property
    def freq_ratio(self) -> int:
        # htsat.py:668: spec_size // mel_bins time-chunks stack along freq
        return self.spec_size // self.mel.n_mels

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))


# ---------------------------------------------------------------------------
# static (numpy) helpers
# ---------------------------------------------------------------------------

def _window_partition(x, w):
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _window_reverse(win, w, b, h, wd):
    x = win.reshape(b, h // w, wd // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, -1)


@functools.lru_cache(maxsize=None)
def _rel_pos_index(w: int) -> np.ndarray:
    """Swin relative-position index [W², W²] (htsat.py:305-316)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    return ((rel[0] + w - 1) * (2 * w - 1) + (rel[1] + w - 1)).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _shift_attn_mask(h: int, wd: int, win: int, shift: int) -> np.ndarray:
    """SW-MSA boundary mask [nW, W², W²], 0 or -100 (htsat.py:416-434):
    after the cyclic roll, pairs that came from different image regions must
    not attend to each other."""
    img = np.zeros((h, wd), np.int32)
    cnt = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(h // win, win, wd // win, win).transpose(
        0, 2, 1, 3).reshape(-1, win * win)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _resize_time_bicubic(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Bicubic align_corners=True resize along axis 1 (x [B, T, F]) —
    torch ``F.interpolate(..., mode='bicubic', align_corners=True)`` used by
    ``reshape_wav2img`` (htsat.py:840-843). Cubic-convolution a = -0.75."""
    t_in = x.shape[1]
    if t_in == out_len:
        return x
    if t_in == 1:
        return jnp.repeat(x, out_len, axis=1)
    pos = jnp.arange(out_len) * ((t_in - 1) / (out_len - 1))
    i0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - i0
    a = -0.75
    offs = jnp.arange(-1, 3)                            # [4]
    idx = jnp.clip(i0[None, :] + offs[:, None], 0, t_in - 1)  # [4, out]
    d = jnp.abs(frac[None, :] - offs[:, None])          # [4, out]
    w = jnp.where(
        d <= 1.0, (a + 2.0) * d ** 3 - (a + 3.0) * d ** 2 + 1.0,
        jnp.where(d < 2.0,
                  a * d ** 3 - 5.0 * a * d ** 2 + 8.0 * a * d - 4.0 * a, 0.0))
    gathered = x[:, idx]                                # [B, 4, out, F]
    return (gathered * w[None, :, :, None]).sum(axis=1)


def reshape_wav2img(mel: jnp.ndarray, spec_size: int,
                    freq_ratio: int) -> jnp.ndarray:
    """[B, T, F] log-mel → [B, spec, spec, 1] Swin image (htsat.py:833-848):
    stretch/crop T to spec·ratio frames, then stack freq_ratio time chunks
    along the frequency axis. (The reference asserts T ≤ target and only
    stretches; we crop longer inputs instead of failing.)"""
    target_t = spec_size * freq_ratio
    if mel.shape[1] > target_t:
        mel = mel[:, :target_t]
    if mel.shape[1] < target_t:
        mel = _resize_time_bicubic(mel, target_t)
    b, t, f = mel.shape
    x = mel.transpose(0, 2, 1)                          # [B, F, T]
    x = x.reshape(b, f, freq_ratio, t // freq_ratio)
    x = x.transpose(0, 2, 1, 3).reshape(b, freq_ratio * f, t // freq_ratio)
    return x[..., None]                                 # [B, H, W, 1]


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------

class WindowAttention(nn.Module):
    """W-MSA with relative position bias (htsat.py:279); ``mask`` is the
    static SW-MSA boundary mask [nW, L, L] or None."""

    dim: int
    heads: int
    window: int

    @nn.compact
    def __call__(self, x, mask: np.ndarray | None = None):
        n, l, c = x.shape
        w = self.window
        qkv = nn.Dense(3 * self.dim, name="qkv")(x).reshape(
            n, l, 3, self.heads, self.dim // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = (self.dim // self.heads) ** -0.5
        logits = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale

        table = self.param("rel_pos_bias",
                           nn.initializers.normal(0.02),
                           ((2 * w - 1) * (2 * w - 1), self.heads))
        idx = _rel_pos_index(w)
        bias = table[jnp.asarray(idx.reshape(-1))].reshape(
            l, l, self.heads).transpose(2, 0, 1)
        logits = logits + bias[None]

        if mask is not None:
            nw = mask.shape[0]
            logits = logits.reshape(n // nw, nw, self.heads, l, l)
            logits = logits + jnp.asarray(mask)[None, :, None]
            logits = logits.reshape(n, self.heads, l, l)

        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("nhqk,nkhd->nqhd", probs, v).reshape(n, l, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class SwinBlock(nn.Module):
    """One Swin block on [B, H, W, C] (htsat.py:364). Reference clamp rule
    (htsat.py:393-396): if the grid is not larger than the window, use one
    full-grid window and NO shift."""

    dim: int
    heads: int
    window: int
    shift: int
    mlp_ratio: int

    @nn.compact
    def __call__(self, x):
        b, h, wd, c = x.shape
        w, shift = self.window, self.shift
        if min(h, wd) <= w:
            w, shift = min(h, wd), 0
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        mask = None
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = _shift_attn_mask(h, wd, w, shift)
        win = _window_partition(x, w)
        win = WindowAttention(self.dim, self.heads, w, name="attn")(win, mask)
        x = _window_reverse(win, w, b, h, wd)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + x
        hdn = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        hdn = nn.Dense(self.dim * self.mlp_ratio, name="fc1")(hdn)
        x = x + nn.Dense(self.dim, name="fc2")(
            jax.nn.gelu(hdn, approximate=False))
        return x


class PatchMerging(nn.Module):
    """2×2 merge with the reference concat order x0(h0w0) x1(h1w0) x2(h0w1)
    x3(h1w1) (htsat.py:503-516) — order matters for weight import."""

    dim_out: int

    @nn.compact
    def __call__(self, x):
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(self.dim_out, use_bias=False, name="reduction")(x)


class HTSATSwin(nn.Module):
    """The Swin core on the [B, spec, spec, 1] image → dict with
    ``embedding`` [B, num_features], ``clipwise`` [B, classes] (sigmoided),
    ``framewise`` [B, T', classes] (htsat.py:774-818 forward_features;
    the reference's ``head`` linear is dead code there — weights accepted by
    the converter, not applied)."""

    cfg: HTSATConfig

    @nn.compact
    def __call__(self, img):
        cfg = self.cfg
        p = cfg.patch
        x = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p),
                    name="patch_proj")(img)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)

        dim = cfg.embed_dim
        for i, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
            for d in range(depth):
                shift = 0 if d % 2 == 0 else cfg.window // 2
                x = SwinBlock(dim, heads, cfg.window, shift, cfg.mlp_ratio,
                              name=f"layer{i}_block{d}")(x)
            if i < len(cfg.depths) - 1:
                dim *= 2
                x = PatchMerging(dim, name=f"downsample{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)   # [B, SF, ST, C]

        b, sf, st, c = x.shape
        # the mean over all cells equals the reference's grouped-reshape +
        # avgpool 'embedding' (the reshape only permutes cells)
        embedding = x.mean(axis=(1, 2))

        # token-semantic head: regroup the freq_ratio time chunks back into
        # the time axis (htsat.py:790-795), then Conv(kernel=(c_freq_bin, 3))
        fr = cfg.freq_ratio
        cfb = sf // fr
        t = x.transpose(0, 3, 1, 2)                      # [B, C, SF, ST]
        t = t.reshape(b, c, fr, cfb, st)
        t = t.transpose(0, 1, 3, 2, 4).reshape(b, c, cfb, fr * st)
        t = t.transpose(0, 2, 3, 1)                      # NHWC [B, cfb, T', C]
        logits = nn.Conv(cfg.num_classes, (cfb, 3), padding=((0, 0), (1, 1)),
                         name="tscam_conv")(t)           # [B, 1, T', classes]
        logits = logits[:, 0]
        framewise = jax.nn.sigmoid(logits)
        # interpolate(ratio=8*patch_stride) — framewise repeats to frame rate
        framewise = jnp.repeat(framewise, 8 * cfg.patch, axis=1)
        clipwise = jax.nn.sigmoid(logits.mean(axis=1))
        return {"embedding": embedding, "clipwise": clipwise,
                "framewise": framewise}


class AudioProjection(nn.Module):
    """CLAP ``audio_projection``: Linear → ReLU → Linear (model.py:540)."""

    d_proj: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.d_proj, name="fc1")(x)
        return nn.Dense(self.d_proj, name="fc2")(nn.relu(x))


class HTSATAudioEncoder(nn.Module):
    """wav [B, T] @cfg.mel.sr → CLAP audio embedding [B, d_proj] (or the raw
    Swin outputs with ``return_dict=True``). Frontend: log-mel → bn0
    (inference-mode per-mel-bin BatchNorm, htsat.py:688) → wav2img."""

    cfg: HTSATConfig = HTSATConfig()

    @nn.compact
    def __call__(self, wav, wav_len=None, return_dict: bool = False):
        cfg = self.cfg
        mel = log_mel(wav, cfg.mel)                      # [B, T, F]
        # bn0: running stats + affine over the mel axis; explicit params
        # (not a mutable collection) so weight import is a plain tree
        f = cfg.mel.n_mels
        mean = self.param("bn0_mean", nn.initializers.zeros, (f,))
        var = self.param("bn0_var", nn.initializers.ones, (f,))
        scale = self.param("bn0_scale", nn.initializers.ones, (f,))
        bias = self.param("bn0_bias", nn.initializers.zeros, (f,))
        mel = (mel - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias

        img = reshape_wav2img(mel, cfg.spec_size, cfg.freq_ratio)
        out = HTSATSwin(cfg, name="swin")(img)
        if not cfg.project:
            return out if return_dict else out["embedding"]
        proj = AudioProjection(cfg.d_proj, name="projection")(
            out["embedding"])
        if return_dict:
            return {**out, "projected": proj}
        return proj
