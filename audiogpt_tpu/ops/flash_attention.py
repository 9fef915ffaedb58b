"""Blockwise (flash) attention as a Pallas TPU kernel.

The reference computes full-sequence SDPA everywhere
(``NeuralSeq/modules/commons/transformer.py``, ``ldm/modules/attention.py:152``)
— O(T²) logits materialized in HBM. This kernel streams K/V blocks through
VMEM with the online-softmax recurrence, so the T² score matrix never leaves
the chip. It is the long-sequence upgrade path SURVEY.md §2.6 calls out
(Whisper's 1500-frame encoder, captioner Cnn14 grids, long diffusion
canvases).

Layout: grid = (B*H, Tq/bq, Tk/bk); the K axis is the fastest (sequential)
grid dim, so the f32 VMEM scratch (acc, running max m, running sum l)
persists across K blocks of one (head, q-block). Block sizes default to the
MXU-native 128. Backward: recompute-based VJP through the XLA reference path
(inference is the hot loop here; training sequences in this framework are
short — SURVEY.md §5 long-context).

Off-TPU the kernel runs in interpreter mode (tests); numerics match the
naive path to ~1e-5.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
                  acc_ref, m_ref, l_ref, *, scale: float, causal: bool,
                  block_q: int, block_k: int, tk_true: int):
    i = pl.program_id(1)
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    def compute():
        q = q_ref[0]                      # [bq, D]
        k = k_ref[0]                      # [bk, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [bq, bk]

        if mask_ref is not None:
            s = jnp.where(mask_ref[0, 0][None, :] > 0, s, NEG_INF)
        if tk_true % block_k:
            # static pad-tail mask — compile-time knowledge, no mask input
            k_pos1 = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1)
            s = jnp.where(k_pos1 < tk_true, s, NEG_INF)
        if causal:
            q_pos = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_pos = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(q_pos >= k_pos, s, NEG_INF)

        m_prev = m_ref[:, :1]                         # [bq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)    # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        # clamp: rows where every key so far is masked keep exp(0)=…=0 sums
        p = jnp.exp(s - m_new)                        # [bq, bk]
        alpha = jnp.exp(m_prev - m_new)               # [bq, 1]
        l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    if causal:
        # skip blocks fully above the diagonal
        @pl.when(j * block_k <= i * block_q + (block_q - 1))
        def _():
            compute()
    else:
        compute()

    @pl.when(j == nk - 1)
    def _finalize():
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[:] / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def _flash_forward(q, k, v, kv_mask, scale, causal, block_q, block_k,
                   interpret):
    """q [BH, Tq, D], k/v [BH, Tk, D], kv_mask [BH, Tk] or None."""
    bh, tq, d = q.shape
    tk = k.shape[1]
    nq = pl.cdiv(tq, block_q)
    nk = pl.cdiv(tk, block_k)

    pq = nq * block_q - tq
    pk = nk * block_k - tk
    if pq:
        q = jnp.pad(q, ((0, 0), (0, pq), (0, 0)))
    if pk:
        k = jnp.pad(k, ((0, 0), (0, pk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pk), (0, 0)))
    # pad tail is masked in-kernel from the static tk; only a RUNTIME
    # key-padding mask travels as an input, shaped [BH, 1, Tk] so the TPU
    # block (1, 1, block_k) matches the array's second-to-last dim exactly
    if kv_mask is not None:
        kv_mask = jnp.pad(kv_mask.astype(jnp.float32),
                          ((0, 0), (0, pk)))[:, None, :]

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [q, k, v]
    if kv_mask is not None:
        in_specs.append(pl.BlockSpec((1, 1, block_k),
                                     lambda b, i, j: (b, 0, j),
                                     memory_space=pltpu.VMEM))
        operands.append(kv_mask)

    if kv_mask is not None:
        def kernel(q_ref, k_ref, v_ref, m_ref, o_ref, acc, m, l):  # noqa: F811
            _flash_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, acc, m, l,
                          scale=scale, causal=causal,
                          block_q=block_q, block_k=block_k, tk_true=tk)
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref, acc, m, l):  # noqa: F811
            _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, acc, m, l,
                          scale=scale, causal=causal,
                          block_q=block_q, block_k=block_k, tk_true=tk)

    out = pl.pallas_call(
        kernel,
        grid=(bh, nq, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, nq * block_q, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * (nq * block_q) * (nk * block_k) * d,
            bytes_accessed=4 * bh * (nq * block_q + 2 * nk * block_k) * d,
            transcendentals=bh * nq * block_q * nk * block_k),
        interpret=interpret,
    )(*operands)
    return out[:, :tq]


def _reference(q, k, v, kv_mask, scale, causal):
    logits = jnp.einsum("bqd,bkd->bqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, :] > 0, logits, NEG_INF)
    if causal:
        tq, tk = q.shape[1], k.shape[1]
        cm = jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)
        logits = jnp.where(cm[None], logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkd->bqd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_core(q, k, v, kv_mask, scale, causal, block_q, block_k, interpret):
    return _flash_forward(q, k, v, kv_mask, scale, causal, block_q, block_k,
                          interpret)


def _flash_core_fwd(q, k, v, kv_mask, scale, causal, block_q, block_k,
                    interpret):
    out = _flash_forward(q, k, v, kv_mask, scale, causal, block_q, block_k,
                         interpret)
    return out, (q, k, v, kv_mask)


def _flash_core_bwd(scale, causal, block_q, block_k, interpret, res, g):
    q, k, v, kv_mask = res
    # recompute-based backward through the XLA reference path: O(T²) but
    # training sequences here are short (SURVEY.md §5)
    _, vjp = jax.vjp(lambda q_, k_, v_: _reference(q_, k_, v_, kv_mask,
                                                   scale, causal), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(
    q: jnp.ndarray,            # [B, Tq, H, D]
    k: jnp.ndarray,            # [B, Tk, H, D]
    v: jnp.ndarray,            # [B, Tk, H, D]
    kv_mask: jnp.ndarray | None = None,   # [B, Tk], 1 = valid
    causal: bool = False,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in for :func:`audiogpt_tpu.ops.attention.attention` (key-padding
    masks only). Returns [B, Tq, H, D]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, tq, h, d = q.shape
    tk = k.shape[1]
    scale = d ** -0.5

    def _clamp(block, t):
        # don't pad short sequences up to a huge block: shrink to the next
        # 128-multiple ≥ t (128 = MXU tile)
        need = ((t + 127) // 128) * 128
        return max(128, min(block, need))

    block_q = _clamp(block_q, tq)
    block_k = _clamp(block_k, tk)

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    mask_bh = None
    if kv_mask is not None:
        mask_bh = jnp.repeat(kv_mask, h, axis=0)  # [B*H, Tk]
    out = _flash_core(to_bh(q), to_bh(k), to_bh(v), mask_bh, scale, causal,
                      block_q, block_k, interpret)
    return out.reshape(b, h, tq, d).transpose(0, 2, 1, 3)
