"""Multi-head attention with optional KV cache — the shared attention op for
ASR decode, audio captioning, diffusion cross-attention and the text towers.

The reference has three separate MHA implementations
(``NeuralSeq/modules/commons/transformer.py``, ``ldm/modules/attention.py:152``,
``audio_to_text`` torch.nn.MultiheadAttention); this single functional op
replaces them. Uses ``jax.nn.dot_product_attention`` so XLA can pick the
fused/flash path on TPU; falls back to the naive einsum on CPU tests.

Autoregressive decode keeps a static-shape KV cache ``[B, max_len, H, D]``
updated with ``lax.dynamic_update_slice`` — no dynamic shapes under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KVCache(NamedTuple):
    k: jnp.ndarray  # [B, max_len, H, D]
    v: jnp.ndarray  # [B, max_len, H, D]
    index: jnp.ndarray  # scalar int32 — next write position

    @classmethod
    def create(cls, batch: int, max_len: int, heads: int, dim: int, dtype=jnp.float32):
        return cls(
            k=jnp.zeros((batch, max_len, heads, dim), dtype),
            v=jnp.zeros((batch, max_len, heads, dim), dtype),
            index=jnp.zeros((), jnp.int32),
        )

    def update(self, k_new: jnp.ndarray, v_new: jnp.ndarray) -> "KVCache":
        """Append ``[B, t, H, D]`` at the current index."""
        t = k_new.shape[1]
        k = jax.lax.dynamic_update_slice(self.k, k_new, (0, self.index, 0, 0))
        v = jax.lax.dynamic_update_slice(self.v, v_new, (0, self.index, 0, 0))
        return KVCache(k, v, self.index + t)


def attention(
    q: jnp.ndarray,  # [B, Tq, H, D]
    k: jnp.ndarray,  # [B, Tk, H, D]
    v: jnp.ndarray,  # [B, Tk, H, D]
    mask: jnp.ndarray | None = None,  # broadcastable to [B, H, Tq, Tk], True=keep
    is_causal: bool = False,
    kv_mask: jnp.ndarray | None = None,  # [B, Tk] 1=valid — enables flash path
    use_flash: bool | None = None,
) -> jnp.ndarray:
    """``use_flash=None`` auto-dispatches to the Pallas blockwise kernel on
    TPU for long sequences when the mask (if any) is key-padding style."""
    if use_flash is None:
        use_flash = (jax.default_backend() == "tpu" and mask is None
                     and q.shape[1] * k.shape[1] >= 256 * 256)
    if use_flash and mask is None:
        from audiogpt_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, kv_mask=kv_mask, causal=is_causal)
    if kv_mask is not None:
        km = kv_mask[:, None, None, :] > 0
        mask = km if mask is None else (mask & km)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if is_causal:
        tq, tk = q.shape[1], k.shape[1]
        causal = jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)
        logits = jnp.where(causal[None, None], logits, -1e30)
    if mask is not None:
        logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
