"""GRU with torch-compatible parameterization, as a ``lax.scan``.

The reference uses ``torch.nn.GRU`` in the captioner (``RnnEncoder``,
``audio_to_text/captioning/models/encoder.py:519``) and in CDur-family TSD
models (``target_sound_detection/src/models.py``). Gate order and formulas
match torch exactly (r, z, n; ``h' = (1-z)·n + z·h``) so state dicts convert
by transposing the packed weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class GRU(nn.Module):
    hidden_size: int
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x, lengths=None):
        """x [B, T, D] → [B, T, H·(1+bidirectional)]."""
        h = self._run(x, "fwd", reverse=False)
        if not self.bidirectional:
            return h
        if lengths is None:
            hb = self._run(x, "bwd", reverse=True)
        else:
            # reverse only the valid prefix of each row (torch packed-seq
            # semantics): flip within [0, len) and keep padding at the tail
            idx = jnp.arange(x.shape[1])[None]
            rev_idx = jnp.where(idx < lengths[:, None],
                                lengths[:, None] - 1 - idx, idx)
            xr = jnp.take_along_axis(x, rev_idx[..., None], axis=1)
            hb_r = self._run(xr, "bwd", reverse=False)
            hb = jnp.take_along_axis(hb_r, rev_idx[..., None], axis=1)
        return jnp.concatenate([h, hb], axis=-1)

    def _run(self, x, prefix, reverse):
        hsz = self.hidden_size
        d = x.shape[-1]
        w_ih = self.param(f"{prefix}_w_ih", nn.initializers.lecun_normal(), (d, 3 * hsz))
        w_hh = self.param(f"{prefix}_w_hh", nn.initializers.lecun_normal(), (hsz, 3 * hsz))
        b_ih = self.param(f"{prefix}_b_ih", nn.initializers.zeros, (3 * hsz,))
        b_hh = self.param(f"{prefix}_b_hh", nn.initializers.zeros, (3 * hsz,))

        xi = x @ w_ih + b_ih  # precompute input projections [B, T, 3H]

        def step(h, xi_t):
            gates_h = h @ w_hh + b_hh
            ir, iz, inn = jnp.split(xi_t, 3, axis=-1)
            hr, hz, hn = jnp.split(gates_h, 3, axis=-1)
            r = jax.nn.sigmoid(ir + hr)
            z = jax.nn.sigmoid(iz + hz)
            n = jnp.tanh(inn + r * hn)
            h = (1.0 - z) * n + z * h
            return h, h

        h0 = jnp.zeros((x.shape[0], hsz), x.dtype)
        seq = jnp.swapaxes(xi, 0, 1)  # [T, B, 3H]
        _, hs = jax.lax.scan(step, h0, seq, reverse=reverse)
        return jnp.swapaxes(hs, 0, 1)
