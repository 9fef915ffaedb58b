"""Mesh/sharding runtime tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from audiogpt_tpu.parallel import MeshSpec, make_mesh, replicate, shard_batch


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() == 8
    return make_mesh(MeshSpec(data=-1, model=1))


class TestMesh:
    def test_shapes(self, mesh8):
        assert mesh8.shape == {"data": 8, "model": 1}

    def test_2x4(self):
        m = make_mesh(MeshSpec(data=2, model=4))
        assert m.shape == {"data": 2, "model": 4}

    def test_bad_spec(self):
        with pytest.raises(ValueError):
            make_mesh(MeshSpec(data=3, model=1))

    def test_shard_batch(self, mesh8):
        batch = {"x": np.ones((16, 4), np.float32), "y": np.zeros((16,), np.int32)}
        out = shard_batch(batch, mesh8)
        assert out["x"].sharding.spec == P("data", None)
        assert out["y"].sharding.spec == P("data")
        np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])

    def test_replicate(self, mesh8):
        params = {"w": np.ones((4, 4), np.float32)}
        out = replicate(params, mesh8)
        assert out["w"].sharding.is_fully_replicated

    def test_psum_dp_gradients(self, mesh8):
        """DP grad allreduce: jit with sharded batch + replicated params gives
        the same grads as single-device (the DDP-equivalence property)."""
        w = jnp.ones((4, 2), jnp.float32)
        x = np.random.RandomState(0).randn(16, 4).astype(np.float32)

        def loss(w, x):
            return jnp.mean((x @ w) ** 2)

        g_single = jax.grad(loss)(w, jnp.asarray(x))

        xs = jax.device_put(x, NamedSharding(mesh8, P("data", None)))
        wr = jax.device_put(w, NamedSharding(mesh8, P()))
        g_sharded = jax.jit(jax.grad(loss))(wr, xs)
        np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single), atol=1e-6)
