"""1-D conv building blocks in NWC layout (TPU-friendly: channels on lanes).

The reference's vocoders use torch ``weight_norm`` convs everywhere
(``NeuralSeq/modules/hifigan/hifigan.py:35``). Here weight norm is a
*parametrization* kept only for training; :func:`fold_weight_norm` bakes g/v
into a plain kernel for inference (equivalent to the reference's
``remove_weight_norm``), so the serving path is a single fused conv.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def same_pad(kernel_size: int, dilation: int = 1) -> int:
    """torch get_padding: SAME padding for stride-1 dilated conv."""
    return (kernel_size * dilation - dilation) // 2


class Conv1d(nn.Module):
    """Plain 1-D conv, input [B, T, C]. Matches torch Conv1d semantics with
    explicit symmetric padding."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: int | str | None = None  # None -> torch 'same' for stride 1
    use_bias: bool = True
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.padding is None:
            pad = same_pad(self.kernel_size, self.dilation)
        else:
            pad = self.padding
        pad_cfg = [(pad, pad)] if isinstance(pad, int) else pad
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding=pad_cfg if not isinstance(pad, str) else pad,
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            dtype=x.dtype,
            param_dtype=jnp.float32,
        )(x)


class ConvTranspose1d(nn.Module):
    """Transposed 1-D conv matching torch ConvTranspose1d(k, s, padding=p):
    out_len = (in_len - 1) * s - 2p + k. Input [B, T, C].

    Default ``impl='phase'`` computes the polyphase decomposition as ONE
    regular stride-1 conv with s·O output channels and an interleaving
    reshape: ``y[m·s+r] = Σ_d x[m-d]·W[d·s+r]`` — identical output, but no
    ``lhs_dilation`` (which XLA:TPU compiles pathologically slowly for the
    vocoder upsampler shapes) and an MXU-friendly [K', I, s·O] contraction.
    ``impl='dilated'`` keeps the literal fractionally-strided form.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True
    impl: str = "phase"   # 'phase' | 'dilated'

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s, p = self.kernel_size, self.stride, self.padding
        o, i = self.features, x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.normal(0.01),
            (k, o, i),  # [W, O, I] for transpose
            jnp.float32,
        )
        if self.impl == "phase" and s > 1:
            kp = (k + s - 1) // s          # taps per phase
            t = x.shape[1]
            kpad = jnp.pad(kernel, ((0, kp * s - k), (0, 0), (0, 0)))
            w = kpad.reshape(kp, s, o, i)              # [d, r, O, I]
            w = jnp.flip(w, axis=0)                    # j = kp-1-d
            w = w.transpose(0, 3, 1, 2).reshape(kp, i, s * o)
            y = jax.lax.conv_general_dilated(
                x.astype(kernel.dtype), w.astype(kernel.dtype),
                window_strides=(1,),
                padding=[(kp - 1, kp - 1)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            )                                          # [B, T+kp-1, s*O]
            y = y.reshape(y.shape[0], (t + kp - 1) * s, o)
            y = y[:, p: p + (t - 1) * s - 2 * p + k]
        else:
            # torch conv_transpose == grad of conv: conv_general_dilated with
            # lhs_dilation=stride and flipped kernel;
            # out = (in-1)*s + 1 + 2*(k-1-p) - (k-1) = (in-1)*s - 2p + k
            y = jax.lax.conv_general_dilated(
                x.astype(kernel.dtype),
                jnp.flip(kernel, axis=0).transpose(0, 2, 1),  # [W, I, O]
                window_strides=(1,),
                padding=[(k - 1 - p, k - 1 - p)],
                lhs_dilation=(s,),
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b
        return y.astype(x.dtype)


def fold_weight_norm(g: jnp.ndarray, v: jnp.ndarray, axes: Sequence[int]) -> jnp.ndarray:
    """w = g * v / ||v|| with the norm over ``axes`` (torch dim=0 semantics
    translated to the given layout)."""
    norm = jnp.sqrt(jnp.sum(v * v, axis=tuple(axes), keepdims=True))
    return g * v / jnp.maximum(norm, 1e-12)


class ConvTranspose2d(nn.Module):
    """Transposed 2-D conv matching torch ConvTranspose2d(k, s, padding=0):
    out = (in-1)*s + k per spatial dim. Input [B, H, W, C].

    Default ``impl='phase'`` is the 2-D polyphase decomposition (one regular
    stride-1 conv with sh·sw·O channels + interleaving reshapes) — no
    ``lhs_dilation`` (see :class:`ConvTranspose1d`). ``impl='dilated'``
    keeps the literal form.
    """

    features: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int]
    use_bias: bool = True
    impl: str = "phase"   # 'phase' | 'dilated'

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        sh, sw = self.stride
        o, i = self.features, x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, o, i),  # [Kh, Kw, O, I]
            jnp.float32,
        )
        if self.impl == "phase" and (sh > 1 or sw > 1):
            khp, kwp = (kh + sh - 1) // sh, (kw + sw - 1) // sw
            h, w = x.shape[1], x.shape[2]
            kpad = jnp.pad(kernel, ((0, khp * sh - kh), (0, kwp * sw - kw),
                                    (0, 0), (0, 0)))
            wk = kpad.reshape(khp, sh, kwp, sw, o, i)      # [dh,rh,dw,rw,O,I]
            wk = jnp.flip(wk, axis=(0, 2))                 # j = k'-1-d per dim
            # conv kernel [Khp, Kwp, I, (rh, rw, o)]
            wk = wk.transpose(0, 2, 5, 1, 3, 4).reshape(
                khp, kwp, i, sh * sw * o)
            y = jax.lax.conv_general_dilated(
                x.astype(kernel.dtype), wk.astype(kernel.dtype),
                window_strides=(1, 1),
                padding=[(khp - 1, khp - 1), (kwp - 1, kwp - 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )                                              # [B, Mh, Mw, sh*sw*O]
            mh, mw = h + khp - 1, w + kwp - 1
            y = y.reshape(y.shape[0], mh, mw, sh, sw, o)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
                y.shape[0], mh * sh, mw * sw, o)
            y = y[:, : (h - 1) * sh + kh, : (w - 1) * sw + kw]
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(kernel.dtype),
                jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2),  # [Kh,Kw,I,O]
                window_strides=(1, 1),
                padding=[(kh - 1, kh - 1), (kw - 1, kw - 1)],
                lhs_dilation=(sh, sw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b
        return y.astype(x.dtype)
