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


def test_pvt_import_parity():
    """PVT SED converter: a torch module with the reference's exact layer
    names/math (audio_detection/audio_infer/pytorch/models.py:141 PVT +
    :619-935 PVTv2 internals — q/kv SR-attention, mix-FFN dwconv, overlap
    patch embeds padded k//3) → convert('pvt') → framewise/clipwise parity
    on the post-mel path (both sides consume the same log-mel)."""
    import jax
    import jax.numpy as jnp
    from torch import nn

    from audiogpt_tpu.dsp.mel import log_mel
    from audiogpt_tpu.import_ckpt import convert
    from audiogpt_tpu.models.sed.pvt import PVTConfig, PVTSED

    cfg = PVTConfig(classes_num=5, embed_dims=(8, 16), depths=(1, 2),
                    num_heads=(1, 2), mlp_ratios=(2, 2), sr_ratios=(2, 1))

    class Attn(nn.Module):
        def __init__(self, dim, heads, sr):
            super().__init__()
            self.heads, self.sr_ratio = heads, sr
            self.q = nn.Linear(dim, dim, bias=True)
            self.kv = nn.Linear(dim, dim * 2, bias=True)
            self.proj = nn.Linear(dim, dim)
            if sr > 1:
                self.sr = nn.Conv2d(dim, dim, kernel_size=sr, stride=sr)
                self.norm = nn.LayerNorm(dim, eps=1e-6)

        def forward(self, x, H, W):
            B, N, C = x.shape
            hd = C // self.heads
            q = self.q(x).reshape(B, N, self.heads, hd).permute(0, 2, 1, 3)
            if self.sr_ratio > 1:
                x_ = x.permute(0, 2, 1).reshape(B, C, H, W)
                x_ = self.sr(x_).reshape(B, C, -1).permute(0, 2, 1)
                x_ = self.norm(x_)
            else:
                x_ = x
            kv = self.kv(x_).reshape(B, -1, 2, self.heads, hd).permute(
                2, 0, 3, 1, 4)
            k, v = kv[0], kv[1]
            a = (q @ k.transpose(-2, -1)) * hd ** -0.5
            x = (a.softmax(dim=-1) @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    class Mlp(nn.Module):
        def __init__(self, dim, ratio):
            super().__init__()
            inner = dim * ratio
            self.fc1 = nn.Linear(dim, inner)
            self.dwconv = nn.Module()
            self.dwconv.dwconv = nn.Conv2d(inner, inner, 3, 1, 1, groups=inner)
            self.fc2 = nn.Linear(inner, dim)

        def forward(self, x, H, W):
            x = self.fc1(x)
            B, N, C = x.shape
            x = self.dwconv.dwconv(
                x.transpose(1, 2).view(B, C, H, W)).flatten(2).transpose(1, 2)
            return self.fc2(nn.functional.gelu(x))

    class Block(nn.Module):
        def __init__(self, dim, heads, sr, ratio):
            super().__init__()
            self.norm1 = nn.LayerNorm(dim, eps=1e-6)
            self.attn = Attn(dim, heads, sr)
            self.norm2 = nn.LayerNorm(dim, eps=1e-6)
            self.mlp = Mlp(dim, ratio)

        def forward(self, x, H, W):
            x = x + self.attn(self.norm1(x), H, W)
            return x + self.mlp(self.norm2(x), H, W)

    class Embed(nn.Module):
        def __init__(self, cin, dim, k, s):
            super().__init__()
            self.proj = nn.Conv2d(cin, dim, k, s, padding=k // 3)
            self.norm = nn.LayerNorm(dim, eps=1e-6)

        def forward(self, x):
            x = self.proj(x)
            _, _, H, W = x.shape
            return self.norm(x.flatten(2).transpose(1, 2)), H, W

    class RefPVT(nn.Module):
        def __init__(self):
            super().__init__()
            self.bn0 = nn.BatchNorm2d(64)
            t = nn.Module()
            cin = 1
            for i, dim in enumerate(cfg.embed_dims):
                setattr(t, f"patch_embed{i + 1}",
                        Embed(cin, dim, 7 if i == 0 else 3, 4 if i == 0 else 2))
                setattr(t, f"block{i + 1}", nn.ModuleList(
                    [Block(dim, cfg.num_heads[i], cfg.sr_ratios[i],
                           cfg.mlp_ratios[i]) for _ in range(cfg.depths[i])]))
                setattr(t, f"norm{i + 1}", nn.LayerNorm(dim, eps=1e-6))
                cin = dim
            self.pvt_transformer = t
            self.fc_audioset = nn.Linear(cfg.embed_dims[-1], cfg.classes_num)

        def forward(self, mel):                       # [B, 1, T, 64]
            x = self.bn0(mel.transpose(1, 3)).transpose(1, 3)
            B = x.shape[0]
            for i in range(len(cfg.embed_dims)):
                t = self.pvt_transformer
                x, H, W = getattr(t, f"patch_embed{i + 1}")(x)
                for blk in getattr(t, f"block{i + 1}"):
                    x = blk(x, H, W)
                x = getattr(t, f"norm{i + 1}")(x)
                x = x.reshape(B, H, W, -1).permute(0, 3, 1, 2).contiguous()
            x = x.mean(dim=3).transpose(1, 2)          # [B, H, C]
            framewise = torch.sigmoid(self.fc_audioset(x))
            clip = framewise.mean(dim=1)
            return framewise, clip

    torch.manual_seed(0)
    ref = RefPVT().eval()
    with torch.no_grad():                    # non-trivial running stats
        ref.bn0.running_mean.uniform_(-0.5, 0.5)
        ref.bn0.running_var.uniform_(0.5, 2.0)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()
          if "num_batches" not in k}

    variables = convert("pvt", sd, cfg)
    variables = {k: v for k, v in variables.items()}

    rng = np.random.RandomState(0)
    wav = rng.randn(1, 32000).astype(np.float32) * 0.1
    mel = log_mel(jnp.asarray(wav), cfg.mel)
    with torch.no_grad():
        fw_ref, clip_ref = ref(torch.from_numpy(np.asarray(mel))[:, None])
    fw_ref = np.repeat(fw_ref.numpy(), cfg.interpolate_ratio, axis=1)

    out = PVTSED(cfg).apply(jax.tree.map(jnp.asarray, variables),
                            jnp.asarray(wav))
    n = min(fw_ref.shape[1], out["framewise_output"].shape[1])
    np.testing.assert_allclose(np.asarray(out["framewise_output"])[:, :n],
                               fw_ref[:, :n], atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["clipwise_output"]),
                               clip_ref.numpy(), atol=2e-4)


def test_lassnet_import_parity():
    """LASSNet converter: reference UNetRes_FiLM (imported from the reference
    tree) + a tiny offline HF BertModel → convert('lassnet') → full
    text+spectrogram forward parity (sound_extraction/model/LASSNet.py:7:
    bert CLS → linear/relu → FiLM U-Net → sigmoid mask)."""
    import jax
    import jax.numpy as jnp
    from transformers import BertConfig as HFConfig, BertModel

    import ref_torch as rt
    rt.add_sound_extraction_path()
    from model.resunet_film import UNetRes_FiLM

    from audiogpt_tpu.import_ckpt import convert
    from audiogpt_tpu.models.extraction.lassnet import LASSNet, LASSNetConfig
    from audiogpt_tpu.models.textenc.bert import BertConfig

    torch.manual_seed(0)
    cond_dim = 8
    hf = HFConfig(vocab_size=50, hidden_size=16, num_hidden_layers=1,
                  num_attention_heads=2, intermediate_size=32,
                  max_position_embeddings=32)
    bert_ref = BertModel(hf, add_pooling_layer=False).eval()
    proj_ref = torch.nn.Linear(16, cond_dim)
    unet_ref = UNetRes_FiLM(channels=1, cond_embedding_dim=cond_dim).eval()
    with torch.no_grad():
        for m in unet_ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 2.0)

    sd = {}
    for k, v in bert_ref.state_dict().items():
        sd[f"text_embedder.bert_layer.{k}"] = v.numpy()
    sd["text_embedder.linear_layer.0.weight"] = proj_ref.weight.detach().numpy()
    sd["text_embedder.linear_layer.0.bias"] = proj_ref.bias.detach().numpy()
    for k, v in unet_ref.state_dict().items():
        if "num_batches" not in k:
            sd[f"UNet.{k}"] = v.numpy()

    cfg = LASSNetConfig(
        bert=BertConfig(vocab_size=50, hidden_size=16, num_layers=1,
                        num_heads=2, intermediate_size=32, max_position=32),
        cond_dim=cond_dim)
    variables = convert("lassnet", sd, cfg)

    model = LASSNet(cfg)
    ref_tree = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 513)),
                          jnp.zeros((1, 6), jnp.int32))
    got = jax.tree.map(jnp.asarray, variables)
    assert jax.tree.structure(ref_tree) == jax.tree.structure(got)

    rng = np.random.RandomState(0)
    sp = np.abs(rng.randn(1, 8, 513)).astype(np.float32)
    ids = rng.randint(0, 50, size=(1, 6)).astype(np.int64)
    with torch.no_grad():
        cls = bert_ref(input_ids=torch.from_numpy(ids),
                       attention_mask=torch.ones(1, 6, dtype=torch.long)
                       ).last_hidden_state[:, 0]
        cond = torch.relu(proj_ref(cls))
        logits = unet_ref(torch.from_numpy(sp)[:, None], cond, cond)
        mask_ref = torch.sigmoid(logits).numpy()[:, 0]

    mask = np.asarray(model.apply(got, jnp.asarray(sp),
                                  jnp.asarray(ids.astype(np.int32))))
    np.testing.assert_allclose(mask, mask_ref, atol=2e-4)


def test_tsd_import_parity():
    """CDur_CNN14 converter: the reference model (imported from the
    reference tree, torchlibrosa shimmed) → convert('tsd') → decision
    parity on a random mel + conditioning embedding."""
    import jax
    import jax.numpy as jnp

    import ref_torch as rt
    rt.add_tsd_path()
    from target_sound_detection.src.models import CDur_CNN14

    from audiogpt_tpu.import_ckpt import convert
    from audiogpt_tpu.models.sed.tsd import TSDConfig, TSDModel

    torch.manual_seed(0)
    ref = CDur_CNN14(inputdim=64, outputdim=2, time_resolution=125).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 2.0)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()
          if "num_batches" not in k}

    cfg = TSDConfig(scale=8)
    variables = convert("tsd", sd, cfg)
    model = TSDModel(cfg)
    got = jax.tree.map(jnp.asarray, variables)
    ref_tree = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 500, 64)),
                          jnp.zeros((1, 128)))
    assert jax.tree.structure(ref_tree) == jax.tree.structure(got)

    rng = np.random.RandomState(0)
    mel = rng.randn(1, 500, 64).astype(np.float32)
    emb = rng.randn(1, 128).astype(np.float32)
    with torch.no_grad():
        dt_ref, up_ref = ref(torch.from_numpy(mel), torch.from_numpy(emb))
    dt, up = model.apply(got, jnp.asarray(mel), jnp.asarray(emb))
    np.testing.assert_allclose(np.asarray(dt), dt_ref.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(up), up_ref.numpy(), atol=2e-4)


def test_binaural_import_parity():
    """BinauralNetwork converter: the reference net (imported from
    mono2binaural/src) → convert('binaural') → binaural output parity
    (geometric + neural warpfields, monotone time warp)."""
    import sys

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/reference/mono2binaural")
    from src.models import BinauralNetwork as RefNet

    from audiogpt_tpu.import_ckpt import convert
    from audiogpt_tpu.models.binaural import BinauralConfig, BinauralNetwork

    torch.manual_seed(0)
    ref = RefNet(warpnet_layers=2, warpnet_channels=8, use_cuda=False).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    cfg = BinauralConfig(warpnet_layers=2, warpnet_channels=8)
    variables = convert("binaural", sd, cfg)
    model = BinauralNetwork(cfg)

    rng = np.random.RandomState(0)
    t, k = 4000, 10
    mono = rng.randn(1, t).astype(np.float32) * 0.1
    view = rng.randn(1, 7, k).astype(np.float32) * 0.1
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(mono[:, None]),
                    torch.from_numpy(view)).numpy()

    got = jax.tree.map(jnp.asarray, variables)
    ref_tree = model.init(jax.random.PRNGKey(0), jnp.zeros((1, t)),
                          jnp.zeros((1, 7, k)))
    assert jax.tree.structure(ref_tree) == jax.tree.structure(got)
    y = np.asarray(model.apply(got, jnp.asarray(mono), jnp.asarray(view)))
    np.testing.assert_allclose(y, y_ref, atol=2e-4)


class _OpenCLIPBlock(torch.nn.Module):
    """torch replica with open_clip's exact names/math
    (ResidualAttentionBlock: pre-LN packed-in-proj MHA + quick-GELU MLP)."""

    def __init__(self, d, heads):
        super().__init__()
        from collections import OrderedDict
        self.ln_1 = torch.nn.LayerNorm(d)
        self.attn = torch.nn.MultiheadAttention(d, heads)
        self.ln_2 = torch.nn.LayerNorm(d)
        self.mlp = torch.nn.Sequential(OrderedDict(
            [("c_fc", torch.nn.Linear(d, 4 * d)),
             ("c_proj", torch.nn.Linear(4 * d, d))]))

    def forward(self, x, attn_mask=None):  # x [L, B, D]
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, need_weights=False, attn_mask=attn_mask)
        x = x + a
        h = self.mlp.c_fc(self.ln_2(x))
        return x + self.mlp.c_proj(h * torch.sigmoid(1.702 * h))


def test_clip_vision_import_parity():
    """open_clip visual tower converter → CLIPVisionEncoder output parity
    (patch conv, cls+pos, pre-LN blocks, ln_post[CLS] @ proj, L2 norm)."""
    import jax
    import jax.numpy as jnp

    from audiogpt_tpu.import_ckpt import convert
    from audiogpt_tpu.models.textenc.clip import (
        CLIPVisionConfig, CLIPVisionEncoder,
    )

    torch.manual_seed(0)
    cfg = CLIPVisionConfig(image_size=8, patch_size=4, width=16, layers=2,
                           heads=2, embed_dim=12)
    n = (cfg.image_size // cfg.patch_size) ** 2
    conv1 = torch.nn.Conv2d(3, cfg.width, cfg.patch_size, cfg.patch_size,
                            bias=False)
    blocks = torch.nn.ModuleList(
        [_OpenCLIPBlock(cfg.width, cfg.heads) for _ in range(cfg.layers)])
    ln_pre, ln_post = torch.nn.LayerNorm(16), torch.nn.LayerNorm(16)
    cls_emb = torch.randn(cfg.width) * 0.1
    pos_emb = torch.randn(n + 1, cfg.width) * 0.1
    proj = torch.randn(cfg.width, cfg.embed_dim) * 0.2
    for ln in (ln_pre, ln_post):
        torch.nn.init.normal_(ln.weight, 1.0, 0.1)
        torch.nn.init.normal_(ln.bias, 0.0, 0.1)

    sd = {"visual.conv1.weight": conv1.weight.detach().numpy(),
          "visual.class_embedding": cls_emb.numpy(),
          "visual.positional_embedding": pos_emb.numpy(),
          "visual.proj": proj.numpy()}
    for pre, m in (("visual.ln_pre", ln_pre), ("visual.ln_post", ln_post)):
        sd[f"{pre}.weight"] = m.weight.detach().numpy()
        sd[f"{pre}.bias"] = m.bias.detach().numpy()
    for i, b in enumerate(blocks):
        for k, v in b.state_dict().items():
            sd[f"visual.transformer.resblocks.{i}.{k}"] = v.numpy()

    variables = convert("clip_vision", sd, cfg)
    img = torch.randn(2, 3, 8, 8)
    with torch.no_grad():
        x = conv1(img).reshape(2, cfg.width, n).permute(0, 2, 1)
        x = torch.cat([cls_emb[None, None].expand(2, 1, -1), x], dim=1)
        x = ln_pre(x + pos_emb[None])
        x = x.permute(1, 0, 2)
        for b in blocks:
            x = b(x)
        z = ln_post(x.permute(1, 0, 2)[:, 0]) @ proj
        z_ref = (z / z.norm(dim=-1, keepdim=True)).numpy()

    import numpy as _np
    model = CLIPVisionEncoder(cfg)
    z = model.apply(jax.tree.map(jnp.asarray, variables),
                    jnp.asarray(img.permute(0, 2, 3, 1).numpy()))
    _np.testing.assert_allclose(_np.asarray(z), z_ref, atol=2e-5)


def test_clip_text_import_parity():
    """open_clip text tower converter → CLIPTextTower parity (causal blocks,
    EOT-argmax pooling, text_projection, L2 norm)."""
    import jax
    import jax.numpy as jnp

    from audiogpt_tpu.import_ckpt import convert
    from audiogpt_tpu.models.textenc.clip import CLIPTextConfig, CLIPTextTower

    torch.manual_seed(1)
    cfg = CLIPTextConfig(vocab_size=60, context_length=10, width=16,
                         layers=2, heads=2, embed_dim=12)
    tok_emb = torch.randn(cfg.vocab_size, cfg.width) * 0.1
    pos_emb = torch.randn(cfg.context_length, cfg.width) * 0.1
    blocks = torch.nn.ModuleList(
        [_OpenCLIPBlock(cfg.width, cfg.heads) for _ in range(cfg.layers)])
    ln_final = torch.nn.LayerNorm(cfg.width)
    torch.nn.init.normal_(ln_final.weight, 1.0, 0.1)
    proj = torch.randn(cfg.width, cfg.embed_dim) * 0.2

    sd = {"token_embedding.weight": tok_emb.numpy(),
          "positional_embedding": pos_emb.numpy(),
          "text_projection": proj.numpy(),
          "ln_final.weight": ln_final.weight.detach().numpy(),
          "ln_final.bias": ln_final.bias.detach().numpy()}
    for i, b in enumerate(blocks):
        for k, v in b.state_dict().items():
            sd[f"transformer.resblocks.{i}.{k}"] = v.numpy()

    variables = convert("clip_text_tower", sd, cfg)
    ids = np.array([[5, 9, 30, 59, 2, 1, 0, 0, 0, 0],
                    [7, 59, 0, 0, 0, 0, 0, 0, 0, 0]], np.int64)
    L = ids.shape[1]
    causal = torch.full((L, L), float("-inf")).triu(1)
    with torch.no_grad():
        x = tok_emb[torch.from_numpy(ids)] + pos_emb[None]
        x = x.permute(1, 0, 2)
        for b in blocks:
            x = b(x, attn_mask=causal)
        x = ln_final(x.permute(1, 0, 2))
        eot = ids.argmax(axis=-1)
        z = x[torch.arange(2), torch.from_numpy(eot)] @ proj
        z_ref = (z / z.norm(dim=-1, keepdim=True)).numpy()

    model = CLIPTextTower(cfg)
    z = model.apply(jax.tree.map(jnp.asarray, variables),
                    jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(z), z_ref, atol=2e-5)


def test_diffsinger_full_ckpt_import_parity():
    """Full DiffSinger E2E ckpt (FastSpeech2MIDI conditioner + DiffNet
    denoiser, reference classes imported with opencpop-e2e hparams) →
    convert('diffsinger') → conditioner + denoiser output parity."""
    import jax
    import jax.numpy as jnp

    ref_torch.add_neuralseq_path()
    from utils.hparams import hparams as H

    H.clear()
    H.update({
        "hidden_size": 24, "enc_layers": 2, "dec_layers": 2, "num_heads": 2,
        "enc_ffn_kernel_size": 9, "dec_ffn_kernel_size": 9,
        "encoder_type": "fft", "decoder_type": "fft",
        "use_spk_id": False, "use_split_spk_id": False, "use_spk_embed": False,
        "use_pitch_embed": False, "use_energy_embed": False,
        "pitch_type": "frame", "pitch_norm": "standard", "use_uv": True,
        "pitch_ar": False, "f0_mean": 200.0, "f0_std": 60.0,
        "predictor_hidden": 24, "predictor_layers": 2, "predictor_kernel": 5,
        "predictor_dropout": 0.0, "predictor_grad": 0.1,
        "dur_predictor_layers": 2, "dur_predictor_kernel": 3,
        "dur_loss": "mse", "dropout": 0.0, "ffn_act": "gelu",
        "ffn_padding": "SAME", "audio_num_mel_bins": 16,
        "use_pos_embed": True, "use_bert": False, "rel_pos": True,
        "residual_layers": 4, "residual_channels": 16,
        "dilation_cycle_length": 2,
    })
    from modules.diffsinger_midi.fs2 import FastSpeech2MIDI
    from modules.diff.net import DiffNet as RefDiffNet

    from audiogpt_tpu.import_ckpt import convert
    from audiogpt_tpu.models.svs.diffsinger import (
        DiffNetConfig, DiffSinger, DiffSingerConfig,
    )
    from audiogpt_tpu.models.tts.fastspeech2 import FastSpeech2Config

    class FakeDict:
        def __len__(self):
            return 50

        def pad(self):
            return 0

    torch.manual_seed(0)
    fs2_ref = FastSpeech2MIDI(FakeDict(), out_dims=16).eval()
    net_ref = RefDiffNet(in_dims=16).eval()
    sd = {}
    for k, v in fs2_ref.state_dict().items():
        sd[f"model.fs2.{k}"] = v.numpy()
    for k, v in net_ref.state_dict().items():
        sd[f"model.denoise_fn.{k}"] = v.numpy()

    cfg = DiffSingerConfig(
        fs2=FastSpeech2Config(vocab_size=50, hidden_size=24, enc_layers=2,
                              dec_layers=2, num_heads=2, n_mels=16,
                              predictor_hidden=24, predictor_layers=2,
                              dropout=0.0, use_pitch_embed=False,
                              use_midi=True, rel_pos=True, max_frames=64,
                              predictor_mask_pad=False),
        net=DiffNetConfig(mel_bins=16, encoder_hidden=24, residual_layers=4,
                          residual_channels=16, dilation_cycle_length=2),
        spec_min=(-6.0,) * 16, spec_max=(1.5,) * 16)
    variables = convert("diffsinger", sd, cfg)
    model = DiffSinger(cfg)
    got = jax.tree.map(jnp.asarray, variables)

    rng = np.random.RandomState(0)
    tokens = np.array([[3, 7, 12, 20, 5, 0, 0, 0]], np.int64)
    midi = np.array([[60, 62, 64, 0, 65, 0, 0, 0]], np.int64)
    midi_dur = rng.rand(1, 8).astype(np.float32)
    slur = np.array([[0, 0, 1, 0, 1, 0, 0, 0]], np.int64)
    mel2ph = np.array([[1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 0, 0]], np.int64)

    with torch.no_grad():
        ret = fs2_ref(torch.from_numpy(tokens),
                      mel2ph=torch.from_numpy(mel2ph), infer=False,
                      pitch_midi=torch.from_numpy(midi),
                      midi_dur=torch.from_numpy(midi_dur),
                      is_slur=torch.from_numpy(slur))
        cond_ref = ret["decoder_inp"].numpy()

    ours = model.apply(got, jnp.asarray(tokens.astype(np.int32)),
                       mel2ph=jnp.asarray(mel2ph.astype(np.int32)),
                       pitch_midi=jnp.asarray(midi.astype(np.int32)),
                       midi_dur=jnp.asarray(midi_dur),
                       is_slur=jnp.asarray(slur.astype(np.int32)),
                       method=DiffSinger.conditioner)
    n = cond_ref.shape[1]
    np.testing.assert_allclose(np.asarray(ours["decoder_inp"])[:, :n],
                               cond_ref, atol=2e-4)

    # denoiser parity through the combined tree
    spec = rng.randn(1, 16, n).astype(np.float32)
    tt = np.array([7], np.int64)
    with torch.no_grad():
        eps_ref = net_ref(torch.from_numpy(spec)[:, None],
                          torch.from_numpy(tt),
                          torch.from_numpy(cond_ref.transpose(0, 2, 1))
                          ).numpy()[:, 0]
    eps = model.apply(got, jnp.asarray(spec.transpose(0, 2, 1)),
                      jnp.asarray(tt.astype(np.int32)),
                      jnp.asarray(cond_ref), method=DiffSinger.denoise)
    np.testing.assert_allclose(np.asarray(eps).transpose(0, 2, 1), eps_ref,
                               atol=2e-4)


def test_pvt_cli_roundtrip(tmp_path, monkeypatch):
    """import_ckpt CLI with --family pvt: torch ckpt file → orbax → restore →
    forward parity with the in-memory conversion (covers the CLI + orbax
    path for the detection families)."""
    import jax
    import jax.numpy as jnp

    import audiogpt_tpu.import_ckpt as ic
    from audiogpt_tpu.import_ckpt import convert, restore_params
    from audiogpt_tpu.models.sed.pvt import PVTConfig, PVTSED

    cfg = PVTConfig(classes_num=3, embed_dims=(8,), depths=(1,),
                    num_heads=(1,), mlp_ratios=(2,), sr_ratios=(2,))
    torch.manual_seed(0)
    sd = {"bn0.weight": np.ones(64, np.float32),
          "bn0.bias": np.zeros(64, np.float32),
          "bn0.running_mean": np.zeros(64, np.float32),
          "bn0.running_var": np.ones(64, np.float32)}
    rng = np.random.RandomState(0)
    pe = "pvt_transformer.patch_embed1"
    sd[f"{pe}.proj.weight"] = rng.randn(8, 1, 7, 7).astype(np.float32) * 0.05
    sd[f"{pe}.proj.bias"] = np.zeros(8, np.float32)
    sd[f"{pe}.norm.weight"] = np.ones(8, np.float32)
    sd[f"{pe}.norm.bias"] = np.zeros(8, np.float32)
    blk = "pvt_transformer.block1.0"
    for nm, shape in (("attn.q.weight", (8, 8)), ("attn.kv.weight", (16, 8)),
                      ("attn.proj.weight", (8, 8)),
                      ("attn.sr.weight", (8, 8, 2, 2)),
                      ("mlp.fc1.weight", (16, 8)),
                      ("mlp.dwconv.dwconv.weight", (16, 1, 3, 3)),
                      ("mlp.fc2.weight", (8, 16))):
        sd[f"{blk}.{nm}"] = rng.randn(*shape).astype(np.float32) * 0.05
        bias_dim = shape[0]
        sd[f"{blk}.{nm.rsplit('.', 1)[0]}.bias"] = np.zeros(bias_dim,
                                                            np.float32)
    for nm, d in (("attn.norm", 8), ("norm1", 8), ("norm2", 8)):
        sd[f"{blk}.{nm}.weight"] = np.ones(d, np.float32)
        sd[f"{blk}.{nm}.bias"] = np.zeros(d, np.float32)
    sd["pvt_transformer.norm1.weight"] = np.ones(8, np.float32)
    sd["pvt_transformer.norm1.bias"] = np.zeros(8, np.float32)
    sd["fc_audioset.weight"] = rng.randn(3, 8).astype(np.float32) * 0.1
    sd["fc_audioset.bias"] = np.zeros(3, np.float32)

    ckpt = str(tmp_path / "pvt.pt")
    torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()}}, ckpt)
    monkeypatch.setattr(ic, "default_config", lambda fam: cfg)
    out = str(tmp_path / "params")
    ic.main(["--family", "pvt", "--ckpt", ckpt, "--out", out])
    restored = restore_params(out)

    direct = convert("pvt", sd, cfg)
    wav = jnp.asarray(rng.randn(1, 32000).astype(np.float32) * 0.1)
    model = PVTSED(cfg)
    y1 = model.apply(jax.tree.map(jnp.asarray, direct), wav)
    y2 = model.apply(jax.tree.map(jnp.asarray, restored), wav)
    np.testing.assert_allclose(np.asarray(y1["clipwise_output"]),
                               np.asarray(y2["clipwise_output"]), atol=1e-6)


def test_clip_vision_full_ckpt_ignores_text_tower(tmp_path):
    """Regression: a 'model.'-prefixed FULL CLIP state dict (vision + text)
    must convert the vision tower only — text-tower keys like
    'model.transformer.resblocks...' / 'model.positional_embedding' used to
    survive filtering and collide with the stripped vision names."""
    import jax
    import jax.numpy as jnp

    from audiogpt_tpu.import_ckpt import convert
    from audiogpt_tpu.models.textenc.clip import (
        CLIPVisionConfig, CLIPVisionEncoder,
    )

    torch.manual_seed(0)
    cfg = CLIPVisionConfig(image_size=8, patch_size=4, width=16, layers=1,
                           heads=2, embed_dim=12)
    n = (cfg.image_size // cfg.patch_size) ** 2
    rng = np.random.RandomState(0)

    def dense(i, o):
        return {"weight": rng.randn(o, i).astype(np.float32) * 0.05,
                "bias": np.zeros(o, np.float32)}

    sd = {}
    sd["model.visual.conv1.weight"] = rng.randn(16, 3, 4, 4).astype(
        np.float32) * 0.05
    sd["model.visual.class_embedding"] = rng.randn(16).astype(np.float32)
    sd["model.visual.positional_embedding"] = rng.randn(n + 1, 16).astype(
        np.float32)
    sd["model.visual.proj"] = rng.randn(16, 12).astype(np.float32)
    for nm in ("ln_pre", "ln_post"):
        sd[f"model.visual.{nm}.weight"] = np.ones(16, np.float32)
        sd[f"model.visual.{nm}.bias"] = np.zeros(16, np.float32)
    blk = "model.visual.transformer.resblocks.0"
    sd[f"{blk}.attn.in_proj_weight"] = rng.randn(48, 16).astype(np.float32)
    sd[f"{blk}.attn.in_proj_bias"] = np.zeros(48, np.float32)
    for nm, (i, o) in (("attn.out_proj", (16, 16)),
                       ("mlp.c_fc", (16, 64)), ("mlp.c_proj", (64, 16))):
        d = dense(i, o)
        sd[f"{blk}.{nm}.weight"] = d["weight"]
        sd[f"{blk}.{nm}.bias"] = d["bias"]
    for nm in ("ln_1", "ln_2"):
        sd[f"{blk}.{nm}.weight"] = np.ones(16, np.float32)
        sd[f"{blk}.{nm}.bias"] = np.zeros(16, np.float32)
    # TEXT tower keys that previously collided after prefix stripping —
    # wrong shapes on purpose so a collision would fail loudly
    sd["model.positional_embedding"] = rng.randn(7, 10).astype(np.float32)
    sd["model.transformer.resblocks.0.ln_1.weight"] = np.ones(10, np.float32)
    sd["model.token_embedding.weight"] = rng.randn(9, 10).astype(np.float32)
    sd["model.ln_final.weight"] = np.ones(10, np.float32)
    sd["model.text_projection"] = rng.randn(10, 5).astype(np.float32)
    sd["model.logit_scale"] = np.float32(1.0)

    variables = convert("clip_vision", sd, cfg)
    assert variables["params"]["positional_embedding"].shape == (n + 1, 16)
    img = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    z = CLIPVisionEncoder(cfg).apply(jax.tree.map(jnp.asarray, variables),
                                     img)
    assert z.shape == (1, 12) and bool(jnp.isfinite(z).all())


@pytest.mark.parametrize("ff,hf_act", [("gated-gelu", "gated-gelu"),
                                       ("relu", "relu")])
def test_t5_encoder_parity(ff, hf_act):
    """T5/FLAN conditioner tower (FrozenT5Embedder/FrozenFLANEmbedder,
    ldm/modules/encoders/modules.py:143,287): HF T5EncoderModel weights →
    convert('t5') → T5Encoder matches last_hidden_state on valid tokens."""
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    from audiogpt_tpu.import_ckpt import convert
    from audiogpt_tpu.models.textenc.t5 import T5Config, T5Encoder

    hf_cfg = HFT5Config(vocab_size=100, d_model=32, d_kv=16, d_ff=48,
                        num_layers=2, num_heads=2,
                        relative_attention_num_buckets=8,
                        relative_attention_max_distance=20,
                        feed_forward_proj=hf_act, dropout_rate=0.0,
                        is_encoder_decoder=False, use_cache=False)
    torch.manual_seed(0)
    ref = T5EncoderModel(hf_cfg).eval()
    cfg = T5Config(vocab_size=100, d_model=32, d_kv=16, d_ff=48,
                   num_layers=2, num_heads=2, rel_buckets=8,
                   rel_max_distance=20, feed_forward=ff)
    params = convert("t5", {k: v.numpy() for k, v in
                            ref.state_dict().items()}, cfg)
    ids = np.array([[5, 17, 42, 3, 1, 0, 0, 0],
                    [9, 9, 2, 1, 0, 0, 0, 0]], np.int64)
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        want = ref(input_ids=torch.tensor(ids),
                   attention_mask=torch.tensor(mask)
                   ).last_hidden_state.numpy()
    got = np.asarray(T5Encoder(cfg).apply(params, ids, mask))
    assert np.abs(got - want)[mask.astype(bool)].max() < 2e-4


def test_t5_conditioner_encode():
    """T5Conditioner pads/EOS-terminates via a pluggable tokenizer and
    returns [B, max_length, d_model] context."""
    from audiogpt_tpu.models.textenc.t5 import T5Conditioner, T5Config

    cond = T5Conditioner(
        T5Config(vocab_size=64, d_model=16, d_kv=8, d_ff=32, num_layers=1,
                 num_heads=2, rel_buckets=8, rel_max_distance=20),
        tokenizer=lambda t: [ord(c) % 60 + 2 for c in t][:10], max_length=12)
    z = cond.encode(["a dog", "rain on a tin roof"])
    assert z.shape == (2, 12, 16)
    assert np.isfinite(np.asarray(z)).all()


def test_clip_text_hf_parity():
    """SD's text conditioner (cond_stage_model.transformer = HF
    CLIPTextModel): convert('clip_text_hf') matches last_hidden_state."""
    from transformers import CLIPTextConfig as HFCLIPTextConfig
    from transformers import CLIPTextModel

    from audiogpt_tpu.import_ckpt import convert
    from audiogpt_tpu.models.textenc.clip import CLIPTextConfig, CLIPTextTower

    hf_cfg = HFCLIPTextConfig(vocab_size=100, hidden_size=32,
                              intermediate_size=128, num_hidden_layers=2,
                              num_attention_heads=2,
                              max_position_embeddings=16,
                              hidden_act="quick_gelu")
    torch.manual_seed(0)
    ref = CLIPTextModel(hf_cfg).eval()
    cfg = CLIPTextConfig(vocab_size=100, context_length=16, width=32,
                         layers=2, heads=2, embed_dim=32)
    params = convert("clip_text_hf",
                     {k: v.numpy() for k, v in ref.state_dict().items()}, cfg)
    ids = np.array([[49 % 100, 5, 7, 99], [3, 99, 0, 0]], np.int64)
    with torch.no_grad():
        want = ref(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    got = np.asarray(CLIPTextTower(cfg).apply(params, ids,
                                              return_sequence=True))
    assert np.abs(got - want).max() < 2e-4


def test_blip_captioner_parity():
    """ImageCaptioning tool's backing model (HF BlipForConditionalGeneration,
    audio-chatgpt.py:126-137): convert('blip') matches teacher-forced logits
    AND the greedy generate trajectory from [bos]."""
    from transformers import BlipConfig as HFBlipConfig
    from transformers import (BlipForConditionalGeneration, BlipTextConfig,
                              BlipVisionConfig)

    from audiogpt_tpu.import_ckpt import convert
    from audiogpt_tpu.models.caption.blip import (
        BlipCaptioner, BlipConfig, greedy_caption,
    )
    from audiogpt_tpu.models.caption.blip import (
        BlipTextConfig as TextCfg,
        BlipVisionConfig as VisCfg,
    )

    hf_cfg = HFBlipConfig(
        vision_config=BlipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=48, patch_size=16).to_dict(),
        text_config=BlipTextConfig(
            hidden_size=32, encoder_hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, vocab_size=100,
            bos_token_id=90, eos_token_id=99, pad_token_id=0).to_dict(),
    )
    torch.manual_seed(0)
    ref = BlipForConditionalGeneration(hf_cfg).eval()

    cfg = BlipConfig(
        vision=VisCfg(image_size=48, patch_size=16, width=32, layers=2,
                      heads=4, mlp_dim=64),
        text=TextCfg(vocab_size=100, width=32, layers=2, heads=4, mlp_dim=64,
                     encoder_width=32, bos_id=90, eos_id=99),
    )
    params = convert("blip", {k: v.numpy() for k, v in
                              ref.state_dict().items()}, cfg)
    model = BlipCaptioner(cfg)

    rng = np.random.RandomState(0)
    px = rng.randn(2, 3, 48, 48).astype(np.float32)
    ids = np.array([[90, 5, 7, 12], [90, 3, 2, 8]], np.int64)
    with torch.no_grad():
        want = ref(pixel_values=torch.tensor(px),
                   input_ids=torch.tensor(ids)).logits.numpy()
    got = np.asarray(model.apply(params, px.transpose(0, 2, 3, 1),
                                 np.asarray(ids, np.int32)))
    assert np.abs(got - want).max() < 2e-4

    # greedy trajectories match HF generate (tiny random net — any logits
    # mismatch diverges the argmax chain within a few tokens)
    with torch.no_grad():
        hf_toks = ref.generate(pixel_values=torch.tensor(px),
                               max_new_tokens=6, num_beams=1,
                               do_sample=False).numpy()
    ours = np.asarray(greedy_caption(model, params,
                                     px.transpose(0, 2, 3, 1), max_tokens=6))
    # HF stops the whole batch at min length when all rows hit eos; compare
    # the generated prefix per row up to the first eos
    for r in range(2):
        h = hf_toks[r]
        o = ours[r][: len(h)]
        stop = np.where(h == 99)[0]
        n = stop[0] + 1 if len(stop) else len(h)
        assert (o[:n] == h[:n]).all(), (o, h)
