"""Captioner: GRU/decoder-layer parity vs torch; pipeline smoke test."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audiogpt_tpu.models.caption import CaptionConfig, CaptionModel, caption_greedy_decode
from audiogpt_tpu.models.caption.cnn14 import Cnn14Config, Cnn14Encoder, ConvBlock
from audiogpt_tpu.ops.rnn import GRU


class TestGRUParity:
    @pytest.mark.parametrize("bidirectional", [False, True])
    def test_matches_torch_gru(self, bidirectional):
        torch.manual_seed(0)
        ref = torch.nn.GRU(6, 5, batch_first=True, bidirectional=bidirectional).eval()
        x = np.random.RandomState(0).randn(2, 7, 6).astype(np.float32)
        with torch.no_grad():
            y_ref, _ = ref(torch.from_numpy(x))

        model = GRU(5, bidirectional)
        p = {}
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        p["fwd_w_ih"] = sd["weight_ih_l0"].T
        p["fwd_w_hh"] = sd["weight_hh_l0"].T
        p["fwd_b_ih"] = sd["bias_ih_l0"]
        p["fwd_b_hh"] = sd["bias_hh_l0"]
        if bidirectional:
            p["bwd_w_ih"] = sd["weight_ih_l0_reverse"].T
            p["bwd_w_hh"] = sd["weight_hh_l0_reverse"].T
            p["bwd_b_ih"] = sd["bias_ih_l0_reverse"]
            p["bwd_b_hh"] = sd["bias_hh_l0_reverse"]
        y = np.asarray(model.apply({"params": p}, jnp.asarray(x)))
        np.testing.assert_allclose(y, y_ref.numpy(), atol=1e-5)

    def test_length_aware_reverse(self):
        """With lengths, the backward pass flips only the valid prefix."""
        model = GRU(4, bidirectional=True)
        x = np.random.RandomState(1).randn(2, 6, 3).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        lens = jnp.asarray([6, 3])
        full = model.apply(params, jnp.asarray(x), lens)
        # row 0 has full length → identical to no-lengths path
        nolen = model.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(full)[0], np.asarray(nolen)[0], atol=1e-6)


class TestConvBlockParity:
    def test_matches_torch(self):
        torch.manual_seed(0)
        conv1 = torch.nn.Conv2d(1, 8, 3, padding=1, bias=False)
        conv2 = torch.nn.Conv2d(8, 8, 3, padding=1, bias=False)
        bn1, bn2 = torch.nn.BatchNorm2d(8).eval(), torch.nn.BatchNorm2d(8).eval()
        for bn in (bn1, bn2):
            bn.running_mean.normal_(); bn.running_var.uniform_(0.5, 2.0)
            bn.weight.data.normal_(); bn.bias.data.normal_()
        x = np.random.RandomState(0).randn(2, 1, 8, 6).astype(np.float32)
        with torch.no_grad():
            y = torch.nn.functional.avg_pool2d(
                torch.relu(bn2(conv2(torch.relu(bn1(conv1(torch.from_numpy(x))))))), 2
            ).numpy()

        model = ConvBlock(8)
        params = {
            "params": {
                "conv1": {"kernel": conv1.weight.detach().numpy().transpose(2, 3, 1, 0)},
                "conv2": {"kernel": conv2.weight.detach().numpy().transpose(2, 3, 1, 0)},
                "bn1": {"scale": bn1.weight.detach().numpy(), "bias": bn1.bias.detach().numpy()},
                "bn2": {"scale": bn2.weight.detach().numpy(), "bias": bn2.bias.detach().numpy()},
            },
            "batch_stats": {
                "bn1": {"mean": bn1.running_mean.numpy(), "var": bn1.running_var.numpy()},
                "bn2": {"mean": bn2.running_mean.numpy(), "var": bn2.running_var.numpy()},
            },
        }
        out = np.asarray(model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(out.transpose(0, 3, 1, 2), y, atol=1e-5)


TINY = CaptionConfig(
    cnn14=Cnn14Config(channels=(8, 8, 8, 8, 8, 16)),
    rnn_hidden=8, rnn_bidirectional=True, vocab_size=50, emb_dim=16,
    nhead=2, nlayers=1, dim_feedforward=32, max_caption_len=6,
)


class TestCaptionPipeline:
    def test_greedy_decode(self):
        model = CaptionModel(TINY)
        wav = jnp.zeros((1, 32000))
        words = jnp.zeros((1, 4), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), wav, words)
        toks = caption_greedy_decode(model, variables, wav)
        assert toks.shape == (1, 6)
        assert toks[0, 0] == TINY.sos_id

    def test_teacher_forcing_shapes(self):
        model = CaptionModel(TINY)
        wav = jnp.zeros((2, 32000))
        words = jnp.zeros((2, 5), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), wav, words)
        logits = model.apply(variables, wav, words)
        assert logits.shape == (2, 5, 50)


def test_beam_decode_matches_greedy_at_k1():
    """beam_size=1 must reproduce greedy exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from audiogpt_tpu.models.caption.captioner import (
        CaptionConfig, CaptionModel, caption_beam_decode,
        caption_greedy_decode,
    )
    from audiogpt_tpu.models.caption.cnn14 import Cnn14Config

    cfg = CaptionConfig(cnn14=Cnn14Config(channels=(8, 8, 16, 16, 32, 32)),
                        rnn_hidden=16, vocab_size=30, emb_dim=16, nhead=2,
                        nlayers=1, dim_feedforward=32, max_caption_len=6)
    model = CaptionModel(cfg)
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 32000))
    params = model.init(jax.random.PRNGKey(1), wav,
                        jnp.zeros((2, 4), jnp.int32))
    g = caption_greedy_decode(model, params, wav)
    b1 = caption_beam_decode(model, params, wav, beam_size=1)
    np.testing.assert_array_equal(g, b1)
    # k=3 returns valid hypotheses with sos prefix
    b3 = caption_beam_decode(model, params, wav, beam_size=3)
    assert b3.shape == g.shape
    assert (b3[:, 0] == cfg.sos_id).all()
