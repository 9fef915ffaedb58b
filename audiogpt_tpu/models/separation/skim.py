"""SkiM — Skipping-Memory LSTM speech separation.

Reference: the Speech_SS tool loads ESPnet's ``wsj0_2mix_skim_noncausal``
(``audio-chatgpt.py:1010``); SkiM (Li & Luo, 2022) replaces dual-path
transformers with segment-local LSTMs whose hidden/cell states hop between
segments through a memory LSTM — linear-time in sequence length.

Structure here (ESPnet SkiMSeparator layout): conv encoder → chunk into
segments [B, S, K, N] → R × (SegLSTM over K with carried (h,c) → MemLSTM
over S refreshing the carried states) → mask head per source → overlap-free
reconstruction → transposed-conv decoder. All scans static-shape.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class SkiMConfig:
    n_src: int = 2
    enc_dim: int = 128          # N
    enc_kernel: int = 16        # L (stride L/2)
    hidden: int = 128           # LSTM hidden (per direction)
    segment_size: int = 50      # K
    n_blocks: int = 4           # R (SegLSTM+MemLSTM rounds)
    sample_rate: int = 16000

    @property
    def stride(self) -> int:
        return self.enc_kernel // 2


class BiLSTM(nn.Module):
    """Bidirectional LSTM over axis 1, via flax scan of LSTMCell."""

    hidden: int

    @nn.compact
    def __call__(self, x, h0=None, c0=None):
        """x [B, T, D]; optional initial (h0, c0) [B, hidden] for the fwd
        direction (the SkiM carried state). → ([B, T, 2H], (hT, cT))."""
        cell = nn.OptimizedLSTMCell(self.hidden, name="fwd")
        bcell = nn.OptimizedLSTMCell(self.hidden, name="bwd")
        b = x.shape[0]
        if h0 is None:
            h0 = jnp.zeros((b, self.hidden), x.dtype)
        if c0 is None:
            c0 = jnp.zeros((b, self.hidden), x.dtype)

        fwd = nn.RNN(cell, return_carry=True, name="rnn_fwd")
        bwd = nn.RNN(bcell, reverse=True, keep_order=True, name="rnn_bwd")
        (c_T, h_T), ys_f = fwd(x, initial_carry=(c0, h0))
        ys_b = bwd(x)
        return jnp.concatenate([ys_f, ys_b], -1), (h_T, c_T)


class SkiMBlock(nn.Module):
    cfg: SkiMConfig

    @nn.compact
    def __call__(self, x, h, c):
        """x [B, S, K, N]; carried (h, c) [B, S, H] → (x', h', c')."""
        cfg = self.cfg
        b, s, k, n = x.shape
        seg = x.reshape(b * s, k, n)
        hs = h.reshape(b * s, -1)
        cs = c.reshape(b * s, -1)
        out, (h_T, c_T) = BiLSTM(cfg.hidden, name="seg_lstm")(seg, hs, cs)
        out = nn.Dense(n, name="seg_proj")(out)
        out = nn.LayerNorm(name="seg_norm")(out)
        x = x + out.reshape(b, s, k, n)

        # memory LSTM across segments refreshes the carried states
        h_seq = h_T.reshape(b, s, -1)
        c_seq = c_T.reshape(b, s, -1)
        h_new, _ = BiLSTM(cfg.hidden, name="mem_lstm_h")(h_seq)
        c_new, _ = BiLSTM(cfg.hidden, name="mem_lstm_c")(c_seq)
        h_new = nn.Dense(cfg.hidden, name="mem_proj_h")(h_new)
        c_new = nn.Dense(cfg.hidden, name="mem_proj_c")(c_new)
        # shift: segment s+1 starts from memory-processed state of segment s
        h_next = jnp.pad(h_new, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        c_next = jnp.pad(c_new, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        return x, h_next, c_next


class SkiM(nn.Module):
    """mix [B, T] → separated [B, n_src, T] (same contract as ConvTasNet)."""

    cfg: SkiMConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b, t = wav.shape
        stride, L = cfg.stride, cfg.enc_kernel
        # conv encoder (free-basis frontend)
        feats = nn.Conv(cfg.enc_dim, (L,), strides=(stride,), padding="SAME",
                        name="encoder")(wav[..., None])
        feats = jax.nn.relu(feats)                   # [B, F, N]
        f = feats.shape[1]
        k = cfg.segment_size
        pad = (k - f % k) % k
        x = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
        s = x.shape[1] // k
        x = x.reshape(b, s, k, cfg.enc_dim)

        h = jnp.zeros((b, s, cfg.hidden))
        c = jnp.zeros((b, s, cfg.hidden))
        for r in range(cfg.n_blocks):
            x, h, c = SkiMBlock(cfg, name=f"block{r}")(x, h, c)

        x = x.reshape(b, s * k, cfg.enc_dim)[:, :f]
        masks = nn.Dense(cfg.n_src * cfg.enc_dim, name="mask_head")(x)
        masks = jax.nn.relu(masks).reshape(b, f, cfg.n_src, cfg.enc_dim)
        masked = feats[:, :, None, :] * masks        # [B, F, n_src, N]

        masked = masked.transpose(0, 2, 1, 3).reshape(b * cfg.n_src, f,
                                                      cfg.enc_dim)
        out = nn.ConvTranspose(1, (L,), strides=(stride,), padding="SAME",
                               name="decoder")(masked)[..., 0]
        out = out[:, :t]
        if out.shape[1] < t:
            out = jnp.pad(out, ((0, 0), (0, t - out.shape[1])))
        return out.reshape(b, cfg.n_src, t)
