"""Fused anti-aliased snake activation — Pallas TPU kernel.

One kernel computes BigVGAN's ``upsample2x → snake → downsample2x`` chain
(``alias_free_torch/act.py`` around ``activations.py:Snake``) without ever
materializing the 2× intermediate, using the polyphase identity derived in
:class:`audiogpt_tpu.models.vocoder.bigvgan.SnakeAA`:

    e[t]  = Σ_a u[2a]  · x[t+a-3]          (clip-indexed, u = kaiser taps ×2)
    o[t]  = Σ_a u[2a+1]· x[t+a-2]
    s_e   = snake(e),  s_o = snake(o)
    out[t]= Σ_b d[2b+1]·SE[t+b-2] + d[2b]·SO[t+b-3]

where SE/SO extend s_e/s_o with the down-stage edge padding: positions < 0
clamp to ``s_e[0]`` and positions > T-1 clamp to ``s_o[T-1]`` (both phases —
the reference edge-pads the *interleaved* 2× signal, whose first sample is
``s_e[0]`` and last is ``s_o[T-1]``).

The XLA formulation of the same math compiles pathologically (slice-heavy
graph); here each grid step loads one (T_BLK+16)-row window once into VMEM —
the main (T_BLK) block plus a 16-row halo block mapped to the next
T_BLK-aligned offset — and does all twelve 6-tap FIR terms plus the snake in
registers. HBM traffic: read T_BLK+16 rows, write T_BLK rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T_BLK = 512           # rows per grid step (multiple of 16)
_HALO = 16             # halo rows (≥ 12 needed; 16 keeps blocks tile-aligned)


def _taps():
    from audiogpt_tpu.models.vocoder.bigvgan import kaiser_sinc_filter1d

    up = (kaiser_sinc_filter1d(0.25, 0.3, 12) * 2.0).astype(np.float64)
    dn = kaiser_sinc_filter1d(0.25, 0.3, 12).astype(np.float64)
    return [float(v) for v in up], [float(v) for v in dn]


def _kernel(xq_ref, halo_ref, alpha_ref, inv_beta_ref, out_ref, *,
            t_total: int, t_blk: int, up, dn):
    i = pl.program_id(1)
    t0 = i * t_blk
    # compute in f32 regardless of storage dtype: Mosaic has no bf16
    # transcendental lowering (math.sin fails to legalize), and with bf16
    # HBM tensors the bandwidth win is in the loads/stores, not the ALU
    xb = jnp.concatenate([xq_ref[0], halo_ref[0]],
                         axis=0).astype(jnp.float32)        # [t_blk+H, C]
    a = alpha_ref[:].astype(jnp.float32)                    # [1, C]
    inv_b = inv_beta_ref[:].astype(jnp.float32)

    # xb row r holds x[clip(t0 + r - 6)]; phase FIRs on the extended range
    # u ∈ [t0-3, t0+t_blk+2] → local row u-t0+3 of s_e/s_o (t_blk+6 rows).
    n = t_blk + 6
    e = sum(up[2 * k] * xb[k: k + n] for k in range(6))         # x[u+k-3]
    o = sum(up[2 * k + 1] * xb[k + 1: k + 1 + n] for k in range(6))
    s_e = e + inv_b * jnp.sin(e * a) ** 2
    s_o = o + inv_b * jnp.sin(o * a) ** 2

    # down-stage edge clamps (global boundaries only)
    pos = t0 - 3 + jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    s_e0 = s_e[3]                          # = global s_e[0] when t0 == 0
    s_oT = jnp.sum(jnp.where(pos == t_total - 1, s_o, 0.0), axis=0)
    se = jnp.where(pos < 0, s_e0[None], s_e)
    se = jnp.where(pos > t_total - 1, s_oT[None], se)
    so = jnp.where(pos < 0, s_e0[None], s_o)
    so = jnp.where(pos > t_total - 1, s_oT[None], so)

    # out[t] = Σ_b dn[2b+1]·SE[t+b-2] + dn[2b]·SO[t+b-3]
    # local SE row for u=t+b-2: (t-t0) + b + 1 ; SO row for u=t+b-3: (t-t0)+b
    out_ref[0] = sum(
        dn[2 * b + 1] * se[b + 1: b + 1 + t_blk] + dn[2 * b] * so[b: b + t_blk]
        for b in range(6)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def snake_aa_pallas(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """x [B, T, C] f32, per-channel alpha/beta (post-exp) → [B, T, C].

    Matches ``SnakeAA`` (literal and polyphase paths) to float tolerance.
    """
    b, t, c = x.shape
    # Lane packing: for narrow channel counts the (sublane=T, lane=C) layout
    # wastes most of the 128 vector lanes (C=32 → 25% — measured the kernel
    # VPU-bound there, ~5.2 ms at [3,159744,32]). Fold batch into lanes:
    # [B,T,C] → [1,T,B·C]. The FIR slices run along sublanes uniformly over
    # all lanes and the edge-clamp tests are row(=global t)-based, so each
    # batch's lane-group computes exactly its own answer.
    if b > 1 and c < 128 and b * c <= 512:
        xf = jnp.transpose(x, (1, 0, 2)).reshape(1, t, b * c)
        y = snake_aa_pallas(xf, jnp.tile(alpha, b), jnp.tile(beta, b),
                            interpret=interpret)
        return jnp.transpose(y.reshape(t, b, c), (1, 0, 2))
    t_blk = min(_T_BLK, max(16, ((t + 15) // 16) * 16))
    nt = pl.cdiv(t, t_blk)
    up, dn = _taps()

    # xq row r = x[clip(r - 6, 0, t-1)], padded so every halo read is valid
    total_rows = nt * t_blk + _HALO
    left = jnp.repeat(x[:, :1], 6, axis=1)
    right = jnp.repeat(x[:, -1:], total_rows - (t + 6), axis=1)
    xq = jnp.concatenate([left, x, right], axis=1)          # [B, rows, C]

    alpha2 = jnp.broadcast_to(alpha.astype(x.dtype)[None], (1, c))
    inv_beta2 = (1.0 / (beta.astype(x.dtype) + 1e-9))[None]

    kernel = functools.partial(_kernel, t_total=t, t_blk=t_blk,
                               up=up, dn=dn)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, nt * t_blk, c), x.dtype),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, t_blk, c), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, _HALO, c),
                         lambda bi, ti: (bi, (ti + 1) * (t_blk // _HALO), 0)),
            pl.BlockSpec((1, c), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t_blk, c), lambda bi, ti: (bi, ti, 0)),
        interpret=interpret,
    )(xq, xq, alpha2, inv_beta2)[:, :t]
