"""Checkpoint-import CLI: torch trainer ckpt → converter → orbax → parity."""

import numpy as np
import pytest
import torch

import ref_torch


def test_hifigan_import_roundtrip(tmp_path, monkeypatch):
    ref_torch.add_neuralseq_path()
    from modules.hifigan.hifigan import HifiGanGenerator

    import audiogpt_tpu.import_ckpt as ic
    from audiogpt_tpu.import_ckpt import restore_params
    from audiogpt_tpu.models.vocoder import HifiGANConfig, HifiGANGenerator

    torch.manual_seed(0)
    h = {"resblock_kernel_sizes": [3, 7, 11], "upsample_rates": [8, 8, 2, 2],
         "upsample_kernel_sizes": [16, 16, 4, 4],
         "upsample_initial_channel": 128, "resblock": "1",
         "resblock_dilation_sizes": [[1, 3, 5]] * 3,
         "use_pitch_embed": False}
    ref = HifiGanGenerator(h).eval()
    # trainer-dict wrapper + model_gen. prefix, as the reference saves it
    # (pl_utils.py:743)
    sd = {"model_gen." + k: v for k, v in ref.state_dict().items()}
    ckpt = str(tmp_path / "ref.pt")
    torch.save({"state_dict": sd}, ckpt)

    cfg = HifiGANConfig(upsample_initial_channel=128, use_nsf=False)
    monkeypatch.setattr(ic, "default_config", lambda fam: cfg)
    out = str(tmp_path / "params")
    ic.main(["--family", "hifigan", "--ckpt", ckpt, "--out", out])

    params = restore_params(out)
    model = HifiGANGenerator(cfg)
    rng = np.random.RandomState(0)
    mel = rng.randn(1, 80, 23).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(mel)).numpy()[:, 0, :]
    import jax.numpy as jnp

    y = np.asarray(model.apply(params, jnp.asarray(mel.transpose(0, 2, 1))))
    np.testing.assert_allclose(y, y_ref, atol=1e-4)


def test_unknown_family_errors(tmp_path):
    import audiogpt_tpu.import_ckpt as ic

    with pytest.raises(KeyError, match="unknown family"):
        ic.convert("nope", {}, None)


def test_convert_cnn14_tree_and_forward():
    """PANN Cnn14 converter: official audioset_tagging_cnn names → our
    NHWC tree; batch-stats land in the right collection (changing a
    running_var changes the forward)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from audiogpt_tpu.import_ckpt import convert, default_config
    from audiogpt_tpu.models.caption.cnn14 import Cnn14Config, Cnn14Encoder

    cfg = Cnn14Config(channels=(8, 8, 8, 8, 8, 16), classes_num=10)
    rng = np.random.default_rng(0)
    sd = {"bn0.weight": np.ones(64), "bn0.bias": np.zeros(64),
          "bn0.running_mean": np.zeros(64), "bn0.running_var": np.ones(64)}
    cin = 1
    for i, ch in enumerate(cfg.channels):
        blk = f"conv_block{i + 1}"
        for j, ic in ((1, cin), (2, ch)):
            sd[f"{blk}.conv{j}.weight"] = rng.normal(
                size=(ch, ic, 3, 3)).astype(np.float32) * 0.05
            sd[f"{blk}.bn{j}.weight"] = np.ones(ch, np.float32)
            sd[f"{blk}.bn{j}.bias"] = np.zeros(ch, np.float32)
            sd[f"{blk}.bn{j}.running_mean"] = np.zeros(ch, np.float32)
            sd[f"{blk}.bn{j}.running_var"] = np.ones(ch, np.float32)
        cin = ch
    sd["fc1.weight"] = rng.normal(size=(16, 16)).astype(np.float32) * 0.05
    sd["fc1.bias"] = np.zeros(16, np.float32)
    sd["fc_audioset.weight"] = rng.normal(size=(10, 16)).astype(np.float32)
    sd["fc_audioset.bias"] = np.zeros(10, np.float32)

    variables = convert("cnn14", sd, cfg)
    model = Cnn14Encoder(cfg, with_head=True)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32000)))
    # identical tree structure and shapes
    assert jax.tree.structure(ref) == jax.tree.structure(
        jax.tree.map(jnp.asarray, variables))
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(
            jax.tree.map(jnp.asarray, variables))):
        assert a.shape == b.shape

    wav = jnp.asarray(rng.normal(size=(1, 32000)), jnp.float32) * 0.1
    out = model.apply(variables, wav)
    assert np.isfinite(np.asarray(out["clipwise_output"])).all()
    # running stats are live: inflating a running_var shifts the output
    v2 = jax.tree.map(lambda x: x, variables)
    v2["batch_stats"]["conv_block1"]["bn1"]["var"] = \
        v2["batch_stats"]["conv_block1"]["bn1"]["var"] * 100.0
    out2 = model.apply(v2, wav)
    assert float(jnp.abs(out2["fc_emb"] - out["fc_emb"]).max()) > 0.0

    assert default_config("cnn14").mel_bins == 64


def test_pwg_import_parity(tmp_path, monkeypatch):
    """ParallelWaveGAN generator: torch ckpt → converter → output parity
    (ConvInUpsampleNetwork path; torch takes a context-padded mel while our
    SAME-padded conv_in sees the identical zero padding)."""
    ref_torch.add_neuralseq_path()
    from modules.parallel_wavegan.models.parallel_wavegan import (
        ParallelWaveGANGenerator,
    )

    import audiogpt_tpu.import_ckpt as ic
    from audiogpt_tpu.import_ckpt import restore_params
    from audiogpt_tpu.models.vocoder.pwg import PWGConfig, PWGGenerator

    torch.manual_seed(0)
    cw = 2
    scales = [4, 4]
    ref = ParallelWaveGANGenerator(
        layers=6, stacks=2, residual_channels=8, gate_channels=16,
        skip_channels=8, aux_channels=10, aux_context_window=cw,
        upsample_params={"upsample_scales": scales}).eval()
    ckpt = str(tmp_path / "pwg.pt")
    torch.save({"state_dict": {"model_gen." + k: v
                               for k, v in ref.state_dict().items()}}, ckpt)

    cfg = PWGConfig(layers=6, stacks=2, residual_channels=8,
                    gate_channels=16, skip_channels=8, aux_channels=10,
                    aux_context_window=cw, upsample_scales=tuple(scales),
                    upsample="conv_in")
    monkeypatch.setattr(ic, "default_config", lambda fam: cfg)
    out = str(tmp_path / "params")
    ic.main(["--family", "pwg", "--ckpt", ckpt, "--out", out])
    params = restore_params(out)

    rng = np.random.RandomState(0)
    frames, hop = 11, int(np.prod(scales))
    mel = rng.randn(1, frames, 10).astype(np.float32)
    noise = rng.randn(1, frames * hop).astype(np.float32)
    mel_t = np.pad(mel, ((0, 0), (cw, cw), (0, 0)))  # torch: VALID conv_in
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(noise[:, None, :]),
                    torch.from_numpy(mel_t.transpose(0, 2, 1))).numpy()[:, 0]

    import jax.numpy as jnp

    model = PWGGenerator(cfg)
    y = np.asarray(model.apply(params, jnp.asarray(mel),
                               noise=jnp.asarray(noise)))
    np.testing.assert_allclose(y, y_ref, atol=2e-4)


def test_caption_converter_tree_matches():
    """AudioCapModel converter: torch-named state dict (real torch GRU /
    TransformerDecoder modules supply the names) → our CaptionModel tree."""
    import jax
    import jax.numpy as jnp
    import torch.nn as tnn

    from audiogpt_tpu.import_ckpt import convert
    from audiogpt_tpu.models.caption.captioner import (
        CaptionConfig, CaptionModel,
    )
    from audiogpt_tpu.models.caption.cnn14 import Cnn14Config

    cfg = CaptionConfig(
        cnn14=Cnn14Config(channels=(8, 8, 8, 8, 8, 16)),
        rnn_hidden=8, rnn_bidirectional=True, vocab_size=30, emb_dim=16,
        nhead=2, nlayers=2, dim_feedforward=32)

    torch.manual_seed(0)
    sd = {}
    # cnn (PANN names)
    rng = np.random.default_rng(0)
    sd["encoder.cnn.bn0.weight"] = np.ones(64, np.float32)
    sd["encoder.cnn.bn0.bias"] = np.zeros(64, np.float32)
    sd["encoder.cnn.bn0.running_mean"] = np.zeros(64, np.float32)
    sd["encoder.cnn.bn0.running_var"] = np.ones(64, np.float32)
    cin = 1
    for i, ch in enumerate(cfg.cnn14.channels):
        blk = f"encoder.cnn.conv_block{i + 1}"
        for j, ic in ((1, cin), (2, ch)):
            sd[f"{blk}.conv{j}.weight"] = rng.normal(size=(ch, ic, 3, 3)
                                                     ).astype(np.float32)
            for stat, val in (("weight", np.ones(ch)), ("bias", np.zeros(ch)),
                              ("running_mean", np.zeros(ch)),
                              ("running_var", np.ones(ch))):
                sd[f"{blk}.bn{j}.{stat}"] = val.astype(np.float32)
        cin = ch
    sd["encoder.cnn.fc1.weight"] = rng.normal(size=(16, 16)).astype(np.float32)
    sd["encoder.cnn.fc1.bias"] = np.zeros(16, np.float32)
    # rnn + decoder from real torch modules (name source of truth)
    gru = tnn.GRU(16, cfg.rnn_hidden, bidirectional=True, batch_first=True)
    for k, v in gru.state_dict().items():
        sd[f"encoder.rnn.network.{k}"] = v.numpy()
    layer = tnn.TransformerDecoderLayer(cfg.emb_dim, cfg.nhead,
                                        cfg.dim_feedforward)
    dec = tnn.TransformerDecoder(layer, cfg.nlayers)
    for k, v in dec.state_dict().items():
        sd[f"decoder.model.{k}"] = v.numpy()
    emb = tnn.Embedding(cfg.vocab_size, cfg.emb_dim)
    sd["decoder.word_embedding.weight"] = emb.weight.detach().numpy()
    lin = tnn.Linear(cfg.emb_dim, cfg.vocab_size)
    sd["decoder.classifier.weight"] = lin.weight.detach().numpy()
    sd["decoder.classifier.bias"] = lin.bias.detach().numpy()
    ap = tnn.Linear(16, cfg.emb_dim)
    sd["decoder.attn_proj.0.weight"] = ap.weight.detach().numpy()
    sd["decoder.attn_proj.0.bias"] = ap.bias.detach().numpy()
    ln = tnn.LayerNorm(cfg.emb_dim)
    sd["decoder.attn_proj.3.weight"] = ln.weight.detach().numpy()
    sd["decoder.attn_proj.3.bias"] = ln.bias.detach().numpy()

    variables = convert("caption", sd, cfg)
    model = CaptionModel(cfg)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32000)),
                     jnp.zeros((1, 4), jnp.int32))
    got = jax.tree.map(jnp.asarray, variables)
    assert jax.tree.structure(ref) == jax.tree.structure(got)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref),
            jax.tree_util.tree_leaves_with_path(got)):
        assert a.shape == b.shape, (ka, a.shape, b.shape)
    # forward runs with the converted tree
    out = model.apply(got, jnp.zeros((1, 32000)),
                      jnp.zeros((1, 4), jnp.int32))
    assert np.isfinite(np.asarray(jax.tree.leaves(out)[0])).all()
