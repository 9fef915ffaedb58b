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


class TestTPRules:
    """TP param sharding: a 2-way model-parallel FS2 forward must equal the
    replicated run (XLA inserts the collectives; SURVEY.md §2.6 TP plan)."""

    def test_tp_forward_equivalence(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        from audiogpt_tpu.models.tts.fastspeech2 import (
            FastSpeech2, FastSpeech2Config,
        )
        from audiogpt_tpu.parallel import MeshSpec, make_mesh
        from audiogpt_tpu.parallel.mesh import param_sharding
        from audiogpt_tpu.parallel.tp_rules import tp_rules

        cfg = FastSpeech2Config(
            vocab_size=30, hidden_size=64, enc_layers=1, dec_layers=1,
            num_heads=2, enc_ffn_kernel_size=3, dec_ffn_kernel_size=3,
            n_mels=16, dur_predictor_layers=1, predictor_layers=1,
            predictor_hidden=64, max_frames=32)
        model = FastSpeech2(cfg)
        tokens = jnp.asarray([[3, 5, 7, 9]] * 4, jnp.int32)
        params = model.init(jax.random.PRNGKey(0), tokens, infer=True)
        ref = model.apply(params, tokens, infer=True)["mel_out"]

        mesh = make_mesh(MeshSpec(data=4, model=2))
        shardings = param_sharding(params, mesh,
                                   rules=tp_rules(tp=2, min_dim=16))
        # at least one param actually sharded over 'model'
        assert any("model" in str(s.spec) for s in jax.tree.leaves(shardings))
        params_tp = jax.device_put(params, shardings)
        data_sh = NamedSharding(mesh, P("data", None))
        tokens_tp = jax.device_put(tokens, data_sh)

        fn = jax.jit(lambda p, t: model.apply(p, t, infer=True)["mel_out"])
        with mesh:
            out = fn(params_tp, tokens_tp)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
