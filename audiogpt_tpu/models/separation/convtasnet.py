"""Conv-TasNet — time-domain speech separation / enhancement, TPU-native.

The reference serves separation and enhancement through external ESPnet
models (``SeparateSpeech`` wrappers, ``audio-chatgpt.py:957-1048``: ConvTasNet
for chime4 enhancement, SkiM for wsj0-2mix separation). Per SURVEY.md §2.7
those external wheels are replaced by an in-framework model; Conv-TasNet
(Luo & Mesgarani, 2019) is the canonical choice covering both tasks
(n_src=1 → enhancement, n_src=2 → separation).

TPU-first: NWC layout; the TCN is a static python loop of dilated depthwise
convs (XLA fuses the pointwise/PReLU/gLN chains); one jit for a whole
segment; streaming via the same 2.4 s / 0.8 s overlap-add contract the
reference uses (``audio-chatgpt.py:976-987``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ConvTasNetConfig:
    n_src: int = 2
    enc_dim: int = 512        # N
    enc_kernel: int = 16      # L
    bottleneck: int = 128     # B
    hidden: int = 512         # H
    skip: int = 128           # Sc
    kernel: int = 3           # P
    n_blocks: int = 8         # X (dilations 1..2^7)
    n_repeats: int = 3        # R
    mask_act: str = "relu"
    sample_rate: int = 16000

    @property
    def stride(self) -> int:
        return self.enc_kernel // 2


class GlobalLayerNorm(nn.Module):
    """gLN: normalize over (time, channels) jointly.

    ``mask`` [B, T, 1] (1=valid) excludes padded frames from the statistics —
    without it, bucket zero-padding dilutes mean/var and changes the masks
    for the REAL samples (gLN is global, so padding is not free)."""

    @nn.compact
    def __call__(self, x, mask=None):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        if mask is None:
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.mean((x - mean) ** 2, axis=(1, 2), keepdims=True)
        else:
            n = jnp.maximum(jnp.sum(mask, axis=(1, 2), keepdims=True), 1.0) * c
            mean = jnp.sum(x * mask, axis=(1, 2), keepdims=True) / n
            var = jnp.sum(((x - mean) * mask) ** 2, axis=(1, 2),
                          keepdims=True) / n
        return (x - mean) * jax.lax.rsqrt(var + 1e-8) * gamma + beta


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, a * x)


class TCNBlock(nn.Module):
    hidden: int
    skip: int
    bottleneck: int
    kernel: int
    dilation: int

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.Conv(self.hidden, (1,), name="conv1x1")(x)
        h = PReLU(name="prelu1")(h)
        h = GlobalLayerNorm(name="norm1")(h, mask)
        pad = (self.kernel - 1) * self.dilation // 2
        h = nn.Conv(self.hidden, (self.kernel,), kernel_dilation=self.dilation,
                    padding=[(pad, pad)], feature_group_count=self.hidden,
                    name="dconv")(h)
        h = PReLU(name="prelu2")(h)
        h = GlobalLayerNorm(name="norm2")(h, mask)
        res = nn.Conv(self.bottleneck, (1,), name="res_conv")(h)
        skip = nn.Conv(self.skip, (1,), name="skip_conv")(h)
        return x + res, skip


class ConvTasNet(nn.Module):
    cfg: ConvTasNetConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray, valid_len=None) -> jnp.ndarray:
        """wav [B, T] → sources [B, n_src, T]. ``valid_len`` [B] marks how
        many samples are real when T is a padded bucket; normalization
        statistics then ignore the padded tail (a traced array — one
        compile serves every length in the bucket)."""
        cfg = self.cfg
        t_in = wav.shape[-1]
        stride = cfg.stride
        pad = (-(t_in - cfg.enc_kernel)) % stride
        x = jnp.pad(wav, ((0, 0), (0, pad)))[..., None]  # [B, T, 1]

        # encoder
        w = jax.nn.relu(
            nn.Conv(cfg.enc_dim, (cfg.enc_kernel,), strides=(stride,),
                    padding="VALID", use_bias=False, name="encoder")(x))
        frames = w.shape[1]
        mask = None
        if valid_len is not None:
            nf = jnp.ceil(valid_len / stride).astype(jnp.int32)  # [B]
            mask = (jnp.arange(frames)[None] < nf[:, None]
                    ).astype(w.dtype)[..., None]                 # [B, F, 1]

        # separator
        h = GlobalLayerNorm(name="ln_in")(w, mask)
        h = nn.Conv(cfg.bottleneck, (1,), name="bottleneck")(h)
        skip_sum = 0.0
        for r in range(cfg.n_repeats):
            for b in range(cfg.n_blocks):
                h, skip = TCNBlock(cfg.hidden, cfg.skip, cfg.bottleneck,
                                   cfg.kernel, 2 ** b, name=f"tcn_{r}_{b}")(
                    h, mask)
                skip_sum = skip_sum + skip
        m = PReLU(name="mask_prelu")(skip_sum)
        m = nn.Conv(cfg.n_src * cfg.enc_dim, (1,), name="mask_conv")(m)
        if cfg.mask_act == "relu":
            m = jax.nn.relu(m)
        else:
            m = jax.nn.sigmoid(m)
        m = m.reshape(m.shape[0], frames, cfg.n_src, cfg.enc_dim)

        # decoder: masked encoder features → transposed conv per source,
        # in polyphase form (stride-1 conv with `stride` output phases +
        # interleave — no lhs_dilation, see ops/conv.py ConvTranspose1d)
        masked = w[:, :, None, :] * m  # [B, F, S, N]
        masked = masked.transpose(0, 2, 1, 3).reshape(-1, frames, cfg.enc_dim)
        kernel = self.param("decoder_kernel", nn.initializers.lecun_normal(),
                            (cfg.enc_kernel, 1, cfg.enc_dim))
        kp = (cfg.enc_kernel + stride - 1) // stride
        kpad = jnp.pad(kernel[:, 0, :],
                       ((0, kp * stride - cfg.enc_kernel), (0, 0)))
        wk = jnp.flip(kpad.reshape(kp, stride, cfg.enc_dim), axis=0)
        wk = wk.transpose(0, 2, 1)                      # [kp, N, stride]
        y = jax.lax.conv_general_dilated(
            masked, wk.astype(masked.dtype),
            window_strides=(1,),
            padding=[(kp - 1, kp - 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )                                               # [B', F+kp-1, stride]
        y = y.reshape(y.shape[0], (frames + kp - 1) * stride)
        y = y[:, : (frames - 1) * stride + cfg.enc_kernel]
        y = y[:, : t_in + pad][:, :t_in]
        return y.reshape(wav.shape[0], cfg.n_src, t_in)


@functools.lru_cache(maxsize=8)
def _sep_fn(model: ConvTasNet):
    """One jitted program per model (ConvTasNet is a hashable dataclass
    module). A fresh ``jax.jit`` wrapper per call would re-trace and
    re-compile every request — the 1.3 s/call bug this replaces.

    Returns ``fn(params, x, valid_len)``; models without a ``valid_len``
    kwarg (e.g. SkiM, whose segment LayerNorms are local) ignore it."""
    import inspect

    try:
        takes_len = "valid_len" in inspect.signature(
            type(model).__call__).parameters
    except (TypeError, ValueError):
        takes_len = False
    if takes_len:
        return jax.jit(lambda p, x, n: model.apply(p, x, n))
    return jax.jit(lambda p, x, n: model.apply(p, x))


def separate_streaming(model: ConvTasNet, params, wav: np.ndarray,
                       segment_sec: float = 2.4, hop_sec: float = 0.8,
                       max_chunk_batch: int = 64) -> np.ndarray:
    """Overlap-add streaming (the reference tool's 2.4 s / 0.8 s contract,
    audio-chatgpt.py:976-987) with triangular cross-fade.

    All overlap chunks run as ONE batched device call (padded to a dyadic
    chunk-count bucket so long inputs reuse a handful of compilations) —
    the reference streams chunk-by-chunk on GPU; per-chunk dispatch would
    waste the TPU on overhead. Short inputs pad up to a dyadic sample
    bucket (one compile per bucket, never per length)."""
    cfg = model.cfg
    sr = cfg.sample_rate
    seg = int(segment_sec * sr)
    hop = int(hop_sec * sr)
    t = len(wav)
    fn = _sep_fn(model)
    if t <= seg:
        bucket = min(max(sr // 4, 1 << (max(t - 1, 1)).bit_length()), seg)
        padded = np.zeros(bucket, np.float32)
        padded[:t] = wav
        out = np.asarray(fn(params, jnp.asarray(padded[None]),
                            jnp.asarray([t], np.int32)))[0]
        return out[:, :t]

    starts = list(range(0, t - seg + hop, hop))
    chunks = np.zeros((len(starts), seg), np.float32)
    lens = np.zeros(len(starts), np.int32)
    for i, start in enumerate(starts):
        end = min(start + seg, t)
        chunks[i, : end - start] = wav[start:end]
        lens[i] = end - start

    # pad the chunk count to a power-of-two bucket (static batch shapes)
    n = len(starts)
    bucket = 1
    while bucket < min(n, max_chunk_batch):
        bucket *= 2
    outs = []
    for ofs in range(0, n, bucket):
        block = chunks[ofs: ofs + bucket]
        blens = lens[ofs: ofs + bucket]
        if block.shape[0] < bucket:
            short = bucket - block.shape[0]
            block = np.pad(block, ((0, short), (0, 0)))
            blens = np.pad(blens, (0, short))
        outs.append(np.asarray(fn(params, jnp.asarray(block),
                                  jnp.asarray(blens))))
    out_chunks = np.concatenate(outs, axis=0)[:n]   # [N, n_src, seg]

    acc = np.zeros((cfg.n_src, t), np.float64)
    norm = np.zeros(t, np.float64)
    win = np.hanning(seg) + 1e-3
    for i, start in enumerate(starts):
        end = min(start + seg, t)
        acc[:, start:end] += out_chunks[i][:, : end - start] * win[: end - start]
        norm[start:end] += win[: end - start]
    return (acc / np.maximum(norm, 1e-8)).astype(np.float32)
