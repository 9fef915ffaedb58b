"""Flash-attention kernel vs naive SDPA (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiogpt_tpu.ops.attention import attention
from audiogpt_tpu.ops.flash_attention import flash_attention


def _rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("tq,tk", [(128, 128), (256, 384), (100, 200)])
def test_matches_naive(tq, tk):
    b, h, d = 2, 3, 64
    q, k, v = (_rand((b, t, h, d), i) for i, t in enumerate([tq, tk, tk]))
    out = flash_attention(q, k, v)
    ref = attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_causal():
    b, h, d, t = 1, 2, 32, 256
    q, k, v = (_rand((b, t, h, d), i) for i in range(3))
    out = flash_attention(q, k, v, causal=True)
    ref = attention(q, k, v, is_causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_kv_mask():
    b, h, d, tq, tk = 2, 2, 32, 128, 256
    q, k, v = (_rand((b, t, h, d), i) for i, t in enumerate([tq, tk, tk]))
    lens = jnp.asarray([100, 256])
    kv_mask = (jnp.arange(tk)[None, :] < lens[:, None]).astype(jnp.float32)
    out = flash_attention(q, k, v, kv_mask=kv_mask)
    ref = attention(q, k, v, mask=kv_mask[:, None, None, :] > 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_grad_flows():
    b, h, d, t = 1, 1, 32, 128
    q, k, v = (_rand((b, t, h, d), i) for i in range(3))

    def loss_flash(q, k, v):
        return flash_attention(q, k, v).sum()

    def loss_ref(q, k, v):
        return attention(q, k, v).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5, rtol=2e-5)


def test_jit_and_odd_dims():
    # non-multiple lengths exercise the padding path under jit
    b, h, d = 1, 2, 64
    q, k, v = (_rand((b, t, h, d), i) for i, t in enumerate([77, 131, 131]))
    f = jax.jit(lambda q, k, v: flash_attention(q, k, v))
    out = f(q, k, v)
    ref = attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
