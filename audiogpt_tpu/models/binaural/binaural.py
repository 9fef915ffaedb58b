"""Mono→binaural rendering, TPU-native.

Re-design of the reference's ``BinauralNetwork``
(``mono2binaural/src/models.py:86``): a geometric time warp (ray ITD from
7-dof tx/rx view: position + quaternion) plus a learned neural warpfield
(4 causal k=2 convs), combined, clamped causal, applied by a monotone linear
interp warp.

The reference needed a hand-written ``torch.autograd.Function`` for the warp
backward (``src/warping.py:14`` — the only custom autograd op in the whole
reference); in JAX the gather+lerp warp differentiates automatically.

Chunked streaming (1 s chunks + 1000-sample receptive-field halo,
``audio-chatgpt.py:747-765``) is :func:`binauralize_chunked`.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

SPEED_OF_SOUND = 343.0
MOUTH_OFFSET = np.array([0.09, 0.0, -0.20], np.float32)
LEFT_EAR = np.array([0.0, -0.08, -0.22], np.float32)
RIGHT_EAR = np.array([0.0, 0.08, -0.22], np.float32)


@dataclasses.dataclass(frozen=True)
class BinauralConfig:
    view_dim: int = 7
    warpnet_layers: int = 4
    warpnet_channels: int = 64
    sample_rate: int = 48000
    view_rate_div: int = 400  # one view frame per 400 samples


def quat_apply_inverse(quat: jnp.ndarray, v: np.ndarray) -> jnp.ndarray:
    """Rotate vector ``v`` by the INVERSE of quaternions ``quat`` [..., 4]
    (x, y, z, w — scipy layout, as the reference's R.from_quat...apply(
    inverse=True), models.py:25-26)."""
    q = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-12)
    xyz, w = q[..., :3], q[..., 3:4]
    vv = jnp.broadcast_to(jnp.asarray(v), xyz.shape)
    # inverse rotation: conjugate quaternion
    t = 2.0 * jnp.cross(-xyz, vv)
    return vv + w * t + jnp.cross(-xyz, t)


def geometric_warpfield(view: jnp.ndarray, seq_length: int,
                        sample_rate: int) -> jnp.ndarray:
    """view [B, 7, K] → warpfield [B, 2, T] (relative negative delays)."""
    pos, quat = view[:, :3, :], view[:, 3:, :]  # [B, 3, K], [B, 4, K]
    # zero-padded quats → unit-ish to avoid NaN (models.py:22-24)
    norms = jnp.linalg.norm(quat, axis=1, keepdims=True)
    quat = quat + (norms == 0).astype(quat.dtype)
    mouth = quat_apply_inverse(quat.transpose(0, 2, 1), MOUTH_OFFSET)  # [B, K, 3]
    mouth = mouth.transpose(0, 2, 1)
    disp_l = pos + mouth - jnp.asarray(LEFT_EAR)[None, :, None]
    disp_r = pos + mouth - jnp.asarray(RIGHT_EAR)[None, :, None]
    disp = jnp.stack([disp_l, disp_r], axis=1)  # [B, 2, 3, K]
    dist = jnp.sqrt(jnp.sum(disp ** 2, axis=2))  # [B, 2, K]
    dist = jax.image.resize(dist, (dist.shape[0], 2, seq_length), "nearest")  # torch F.interpolate default
    return -dist / SPEED_OF_SOUND * sample_rate


def monotone_warp(signal: jnp.ndarray, warpfield: jnp.ndarray) -> jnp.ndarray:
    """Linear-interp warp with monotonicity (cummax), [B, 2, T] each."""
    t = signal.shape[-1]
    pos = jnp.clip(warpfield + jnp.arange(t, dtype=warpfield.dtype)[None, None],
                   0, t - 1)
    pos = jax.lax.cummax(pos, axis=pos.ndim - 1)
    idx_l = jnp.floor(pos).astype(jnp.int32)
    idx_r = jnp.clip(jnp.ceil(pos).astype(jnp.int32), 0, t - 1)
    alpha = pos - jnp.floor(pos)
    gl = jnp.take_along_axis(signal, idx_l, axis=-1)
    gr = jnp.take_along_axis(signal, idx_r, axis=-1)
    return (1.0 - alpha) * gl + alpha * gr


class BinauralNetwork(nn.Module):
    cfg: BinauralConfig

    @nn.compact
    def __call__(self, mono: jnp.ndarray, view: jnp.ndarray) -> jnp.ndarray:
        """mono [B, T], view [B, 7, T//400] → binaural [B, 2, T]."""
        cfg = self.cfg
        t = mono.shape[-1]
        geo = geometric_warpfield(view, t, cfg.sample_rate)
        # neural warpfield: causal convs over view frames (Warpnet:63-71)
        x = view.transpose(0, 2, 1)  # [B, K, 7]
        for i in range(cfg.warpnet_layers):
            x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))  # left pad (causal)
            x = nn.Conv(cfg.warpnet_channels, (2,), padding="VALID",
                        name=f"warp_conv_{i}")(x)
            x = jax.nn.relu(x)
        x = nn.Conv(2, (1,), name="warp_linear")(x)  # [B, K, 2]
        neural = jax.image.resize(x.transpose(0, 2, 1),
                                  (x.shape[0], 2, t), "nearest")
        warpfield = geo + neural
        warpfield = -jax.nn.relu(-warpfield)  # causality clamp
        stereo = jnp.stack([mono, mono], axis=1)
        return monotone_warp(stereo, warpfield)


@functools.lru_cache(maxsize=4)
def _binaural_fn(model: BinauralNetwork):
    """One jitted program per model — a fresh ``jax.jit`` per call would
    re-trace/re-compile every request."""
    return jax.jit(lambda p, m, v: model.apply(p, m, v))


def binauralize_chunked(model: BinauralNetwork, params, mono: np.ndarray,
                        view: np.ndarray, chunk_size: int = 48000,
                        rec_field: int = 800) -> np.ndarray:
    """Reference chunking scheme (audio-chatgpt.py:747-765): 1 s chunks with a
    receptive-field halo (multiple of 400), outputs concatenated."""
    div = model.cfg.view_rate_div
    t = (mono.shape[-1] // div) * div
    mono = mono[:t]
    view = view[:, : t // div]
    fn = _binaural_fn(model)
    outs = []
    for i in range(0, t, chunk_size):
        lo = max(0, i - rec_field)
        m = mono[lo : i + chunk_size][None]
        v = view[:, lo // div : (i + chunk_size) // div][None]
        out = np.asarray(fn(params, jnp.asarray(m), jnp.asarray(v)))[0]
        if i > 0:
            out = out[:, rec_field:]
        outs.append(out)
    return np.clip(np.concatenate(outs, axis=-1), -1.0, 1.0)
