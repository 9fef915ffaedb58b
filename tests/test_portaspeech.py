"""PortaSpeech / SyntaSpeech tests: syntax graphs, word-alignment helpers,
FVAE model forward/infer, flow invertibility, trainer recipe, binarizer
word fields, and the train-CLI wiring.

The reference cannot run these models at all (``modules/portaspeech`` is
missing from its tree — SURVEY.md §2.2/§2.3); these tests define the rebuilt
behavior.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiogpt_tpu.models.tts.portaspeech import (
    PortaSpeech, PortaSpeechConfig, clip_mel2word_to_multiple,
    group_hidden_by_words, in_word_position, mel2word_to_dur,
)
from audiogpt_tpu.text.syntax import (
    N_EDGE_TYPES, batch_word_graphs, build_word_graph,
)


def _tiny_cfg(**kw):
    base = dict(ph_vocab_size=40, word_vocab_size=30, hidden_size=32,
                enc_layers=1, word_enc_layers=1, num_heads=2,
                fvae_hidden=32, fvae_enc_layers=2, fvae_dec_layers=2,
                prior_flow_hidden=16, prior_flow_blocks=2,
                max_frames=32, latent_size=8)
    base.update(kw)
    return PortaSpeechConfig(**base)


def _inputs(cfg, B=2, Tph=10, W=5, rng_seed=0):
    F = cfg.max_frames
    rng = np.random.default_rng(rng_seed)
    txt = jnp.asarray(rng.integers(3, cfg.ph_vocab_size, (B, Tph)), jnp.int32)
    ph2word = jnp.asarray(np.clip(np.arange(Tph) // 2 + 1, 1, W))[None].repeat(B, 0)
    words = jnp.asarray(rng.integers(3, cfg.word_vocab_size, (B, W)), jnp.int32)
    mel2word = jnp.asarray(np.clip(np.arange(F) // (F // W) + 1, 1, W))[None].repeat(B, 0)
    mels = jnp.asarray(rng.normal(size=(B, F, cfg.n_mels)), jnp.float32)
    adj = jnp.asarray(batch_word_graphs(
        [["the", "cat", ",", "sat", "down"]] * B, W))
    return txt, words, ph2word, mel2word, mels, adj


# -- syntax graphs -----------------------------------------------------------

def test_build_word_graph_shapes_and_types():
    words = ["the", "big", "cat", ",", "sat", "down", "."]
    adj = build_word_graph(words, max_words=10)
    assert adj.shape == (N_EDGE_TYPES, 10, 10)
    n = len(words)
    # sequential forward edges j->j+1 live at adj[0, j+1, j]
    assert adj[0, 1, 0] == 1 and adj[1, 0, 1] == 1
    # self loops on all real words only
    assert adj[2, :n, :n].diagonal().sum() == n
    assert adj[2].sum() == n
    # every non-root word has exactly one head edge
    heads_out = adj[3].sum()
    assert heads_out > 0
    # nothing outside the real-word block
    assert adj[:, n:, :].sum() == 0 and adj[:, :, n:].sum() == 0


def test_build_word_graph_external_heads():
    # a supplied dependency parse (1-based heads, 0 = root) is honored
    adj = build_word_graph(["a", "b", "c"], 4, dep_heads=[2, 0, 2])
    assert adj[3, 1, 0] == 1      # a -> head b
    assert adj[3, 1, 2] == 1      # c -> head b
    assert adj[4, 0, 1] == 1 and adj[4, 2, 1] == 1
    assert adj[5].sum() == 0      # single root, no inter-clause edges


def test_leading_punctuation_not_a_root():
    """ADVICE r1: punctuation before any clause used to get head 0 and join
    the type-5 inter-clause root graph; it must attach to the next clause."""
    from audiogpt_tpu.text.syntax import _heuristic_heads

    words = [",", "hello", "world", ".", "more", "words"]
    heads = _heuristic_heads(words)
    assert heads[0] != 0                       # not a root
    roots = [i for i, h in enumerate(heads) if h == 0]
    assert 0 not in roots and len(roots) == 2  # the two real clause roots
    assert heads[0] - 1 in roots and heads[0] - 1 > 0  # points at a real root
    adj = build_word_graph(words)
    # inter-clause (type 5) edges only connect the two real roots
    nz = np.argwhere(adj[5] > 0)
    assert nz.size and all(i in roots and j in roots for i, j in nz)


def test_batch_word_graphs_pads():
    out = batch_word_graphs([["a", "b"], ["x", "y", "z"]], max_words=5)
    assert out.shape == (2, N_EDGE_TYPES, 5, 5)
    assert out[0, :, 2:, :].sum() == 0


# -- word-alignment helpers ---------------------------------------------------

def test_group_hidden_by_words_matches_loop():
    rng = np.random.default_rng(1)
    h = rng.normal(size=(2, 7, 4)).astype(np.float32)
    x2w = np.array([[1, 1, 2, 2, 2, 3, 0], [1, 2, 2, 3, 3, 3, 0]], np.int32)
    got = np.asarray(group_hidden_by_words(jnp.asarray(h), jnp.asarray(x2w), 4))
    for b in range(2):
        for w in range(1, 5):
            sel = h[b][x2w[b] == w]
            want = sel.mean(0) if len(sel) else np.zeros(4)
            np.testing.assert_allclose(got[b, w - 1], want, atol=1e-5)


def test_in_word_position_fractions():
    x2w = jnp.asarray([[1, 1, 1, 2, 2, 0]])
    pos = np.asarray(in_word_position(x2w, 3))[0]
    np.testing.assert_allclose(pos, [1 / 3, 2 / 3, 1.0, 0.5, 1.0, 0.0],
                               atol=1e-6)


def test_clip_mel2word_to_multiple():
    m = jnp.asarray([[1, 1, 2, 2, 3, 3, 0, 0]])
    out = np.asarray(clip_mel2word_to_multiple(m, 4))
    assert (out > 0).sum() == 4 and list(out[0, :4]) == [1, 1, 2, 2]


def test_mel2word_to_dur():
    m = jnp.asarray([[1, 1, 2, 3, 3, 3, 0, 0]])
    np.testing.assert_allclose(np.asarray(mel2word_to_dur(m, 4))[0],
                               [2, 1, 3, 0])


# -- model ---------------------------------------------------------------------

@pytest.mark.parametrize("use_graph", [False, True])
def test_portaspeech_train_and_infer(use_graph):
    cfg = _tiny_cfg(use_graph=use_graph)
    model = PortaSpeech(cfg)
    txt, words, ph2word, mel2word, mels, adj = _inputs(cfg)
    rng = jax.random.PRNGKey(0)
    kw = dict(graph_adj=adj) if use_graph else {}
    params = model.init(rng, txt, words, ph2word, mel2word=mel2word,
                        tgt_mels=mels, rng=rng, **kw)
    out = model.apply(params, txt, words, ph2word, mel2word=mel2word,
                      tgt_mels=mels, rng=rng, **kw)
    B, F = mels.shape[:2]
    assert out["mel_out"].shape == (B, F, cfg.n_mels)
    assert out["dur"].shape == (B, words.shape[1])
    assert out["attn"].shape == (B, F, txt.shape[1])
    assert np.isfinite(float(out["kl"]))
    # zero-init posterior ⇒ KL starts near 0 (z≈ε, N(0,I) prior + zero-init
    # flow posts)
    assert abs(float(out["kl"])) < 0.5

    # attention rows are word-constrained: frame of word w only attends to
    # phones of word w
    attn = np.asarray(out["attn"])
    m2w = np.asarray(mel2word)
    p2w = np.asarray(ph2word)
    allowed = (m2w[:, :, None] == p2w[:, None, :])
    assert attn[~allowed].max() < 1e-6

    # inference is jittable on the static canvas
    fwd = jax.jit(lambda p, t, w, pw, r: model.apply(
        p, t, w, pw, infer=True, rng=r,
        **({"graph_adj": adj} if use_graph else {})))
    oi = fwd(params, txt, words, ph2word, jax.random.PRNGKey(1))
    assert oi["mel_out"].shape == (B, cfg.max_frames, cfg.n_mels)
    assert bool(jnp.isfinite(oi["mel_out"]).all())
    # predicted mel2word is clipped to frames_multiple
    n_frames = np.asarray((oi["mel2word"] > 0).sum(1))
    assert (n_frames % cfg.frames_multiple == 0).all()


def test_prior_flow_invertible():
    cfg = _tiny_cfg()
    from audiogpt_tpu.models.tts.portaspeech import PriorFlow
    flow = PriorFlow(cfg)
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (2, 8, cfg.latent_size))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 8, cfg.hidden_size))
    mask = jnp.ones((2, 8, 1))
    params = flow.init(rng, z, cond, mask)
    # perturb the zero-init posts so the flow is non-trivial
    params = jax.tree.map(lambda p: p + 0.1, params)
    zp = flow.apply(params, z, cond, mask)
    zb = flow.apply(params, zp, cond, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(zb), np.asarray(z), atol=1e-4)
    assert float(jnp.abs(zp - z).max()) > 1e-3   # actually did something


# -- trainer recipe -------------------------------------------------------------

def _ps_batch(cfg, use_graph):
    # batch divisible by the 8-device virtual data mesh
    txt, words, ph2word, mel2word, mels, adj = _inputs(cfg, B=8)
    batch = {
        "txt_tokens": np.asarray(txt), "word_tokens": np.asarray(words),
        "ph2word": np.asarray(ph2word), "mel2word": np.asarray(mel2word),
        "mels": np.asarray(mels),
        "mel_lengths": np.full(8, cfg.max_frames, np.int32),
        "word_lengths": np.full(8, words.shape[1], np.int32),
        "weight": np.ones(8, np.float32),
    }
    if use_graph:
        batch["graph_adj"] = np.asarray(adj)
    return batch


@pytest.mark.parametrize("use_graph", [False, True])
def test_portaspeech_trainer_steps(tmp_path, use_graph):
    from audiogpt_tpu.train import Trainer, TrainerConfig
    from audiogpt_tpu.train.optim import OptimConfig
    from audiogpt_tpu.train.tasks import PortaSpeechTask, PortaSpeechTaskConfig

    cfg = _tiny_cfg(use_graph=use_graph)
    task = PortaSpeechTask(PortaSpeechTaskConfig(
        model=cfg, kl_start_steps=4,
        optim=OptimConfig(schedule="constant", lr=1e-3)))
    tcfg = TrainerConfig(work_dir=str(tmp_path), max_updates=8,
                         val_check_interval=100, log_interval=2,
                         num_sanity_val_steps=0, use_tensorboard=False)
    trainer = Trainer(task, tcfg)
    batch = _ps_batch(cfg, use_graph)

    def gen():
        while True:
            yield batch

    state = trainer.fit(gen())
    assert int(jax.device_get(state["step"])) == 8

    import json, os
    lines = [json.loads(l) for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
    tr = [l for l in lines if l["prefix"] == "tr"]
    assert all(l["nonfinite"] == 0 for l in tr)
    assert tr[-1]["total_loss"] < tr[0]["total_loss"]
    # KL ramp: early steps weight the KL by step/kl_start_steps
    assert "kl" in tr[0] and "kl_v" in tr[0]


# -- binarizer + loader + CLI ----------------------------------------------------

def test_binarizer_word_fields_and_collate(tmp_path):
    from audiogpt_tpu.data import TTSBinarizer, load_split
    from audiogpt_tpu.data.binarizer import BinarizeConfig, Item, load_word_encoder
    from audiogpt_tpu.data.loader import collate_tts

    sr = 22050
    rng = np.random.default_rng(0)
    items = [
        Item(name=f"u{i}", wav=rng.normal(size=sr // 4).astype(np.float32) * 0.1,
             text=t)
        for i, t in enumerate(
            ["the cat sat", "a big dog ran fast", "hello world",
             "one two three four"] * 2)
    ]
    cfg = BinarizeConfig(with_f0=False, with_words=True, with_graph=True)
    counts = TTSBinarizer(cfg).binarize(items, str(tmp_path))
    assert counts["train"] >= 1
    ds = load_split(str(tmp_path), "train")
    rec = ds[0]
    assert "word_tokens" in rec and "ph2word" in rec and "graph_adj" in rec
    assert rec["graph_adj"].shape[0] == N_EDGE_TYPES
    assert rec["graph_adj"].shape[1] == rec["graph_adj"].shape[2]
    assert len(rec["ph2word"]) == len(rec["tokens"])
    assert int(np.max(rec["ph2word"])) <= len(rec["word_tokens"])
    wenc = load_word_encoder(str(tmp_path))
    assert len(wenc) > 4

    batch = collate_tts([ds[i] for i in range(min(3, len(ds)))], None, 80)
    W = batch["word_tokens"].shape[1]
    assert batch["graph_adj"].shape[-2:] == (W, W)
    assert batch["ph2word"].shape == batch["txt_tokens"].shape


def test_portaspeech_adv_trainer_steps(tmp_path):
    """ps_adv recipe: disc + generator groups both step, losses finite."""
    from audiogpt_tpu.train import Trainer, TrainerConfig
    from audiogpt_tpu.train.optim import OptimConfig
    from audiogpt_tpu.train.tasks import (
        PortaSpeechAdvTask, PortaSpeechAdvTaskConfig, PortaSpeechTaskConfig,
    )

    cfg = _tiny_cfg()
    task = PortaSpeechAdvTask(PortaSpeechAdvTaskConfig(
        ps=PortaSpeechTaskConfig(model=cfg, kl_start_steps=4,
                                 optim=OptimConfig(schedule="constant",
                                                   lr=1e-3)),
        disc_windows=(8, 16), disc_hidden=16))
    tcfg = TrainerConfig(work_dir=str(tmp_path), max_updates=3,
                         val_check_interval=100, log_interval=1,
                         num_sanity_val_steps=0, use_tensorboard=False)
    trainer = Trainer(task, tcfg)
    batch = _ps_batch(cfg, use_graph=False)

    def gen():
        while True:
            yield batch

    state = trainer.fit(gen())
    assert int(jax.device_get(state["step"])) == 3

    import json, os
    lines = [json.loads(l) for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
    tr = [l for l in lines if l["prefix"] == "tr"]
    assert tr and all(l["nonfinite"] == 0 for l in tr)
    assert "adv" in tr[0] and "d_loss" in tr[0]


def test_portaspeech_engine_text_to_wav():
    from audiogpt_tpu.engines.tts import PortaSpeechTTSEngine
    from audiogpt_tpu.registry import ENGINES

    assert ENGINES.get("tts_portaspeech") is PortaSpeechTTSEngine
    eng = PortaSpeechTTSEngine(cfg=None, word_vocab=["<BOS>", "<EOS>", "hello",
                                                     "there", "friend"])
    eng.cfg = dataclasses.replace(eng.cfg)  # frozen dataclass sanity
    wav = eng("hello there friend")
    assert wav.ndim == 1 and len(wav) > 0 and np.isfinite(wav).all()
    # same engine, graph variant
    from audiogpt_tpu.models.tts import PortaSpeechConfig
    cfg = PortaSpeechConfig(ph_vocab_size=100, word_vocab_size=10,
                            hidden_size=32, enc_layers=1, word_enc_layers=1,
                            fvae_hidden=32, fvae_enc_layers=2,
                            fvae_dec_layers=2, prior_flow_hidden=16,
                            prior_flow_blocks=2, max_frames=64, latent_size=8,
                            use_graph=True)
    eng2 = PortaSpeechTTSEngine(cfg=cfg, word_vocab=["<BOS>", "<EOS>"])
    mel = eng2.text_to_mel("the cat sat, down it went.")
    assert mel.shape[1] == 80 and np.isfinite(mel).all()


def test_train_cli_builds_portaspeech_tasks(tmp_path):
    from audiogpt_tpu.config import load_config
    from audiogpt_tpu.train_cli import build_task

    for name in ("configs/tts/portaspeech.yaml", "configs/tts/syntaspeech.yaml",
                 "configs/tts/ps_adv.yaml"):
        cfg = load_config(name)
        task = build_task(cfg)
        assert task.model.cfg.latent_size == 16
        if "synta" in name:
            assert task.model.cfg.use_graph
        if "adv" in name:
            assert "disc" in task.loss_fns
            assert task.cfg.lambda_adv == 0.05


def test_rel_transformer_encoder():
    """Relative-window encoder (rel_transformer.py parity surface): masked
    outputs, padding invariance, and the relative term actually biases by
    distance."""
    from audiogpt_tpu.ops.rel_attention import RelTransformerEncoder

    enc = RelTransformerEncoder(vocab_size=30, dim=16, filter_dim=32,
                                heads=2, layers=2, kernel=3, window=2)
    rng = jax.random.PRNGKey(0)
    tok = jnp.asarray([[3, 4, 5, 6, 0, 0], [7, 8, 0, 0, 0, 0]])
    params = enc.init(rng, tok)
    out = enc.apply(params, tok)
    assert out.shape == (2, 6, 16)
    # padded positions are zero
    assert float(jnp.abs(out[0, 4:]).max()) == 0.0
    assert float(jnp.abs(out[1, 2:]).max()) == 0.0
    # padding length doesn't change valid outputs (mask correctness)
    out2 = enc.apply(params, jnp.pad(tok, ((0, 0), (0, 4))))
    np.testing.assert_allclose(np.asarray(out2[:, :6]), np.asarray(out),
                               atol=1e-5)


def test_portaspeech_rel_fft_matches_interface():
    cfg = _tiny_cfg(encoder_type="rel_fft", rel_window=2)
    model = PortaSpeech(cfg)
    txt, words, ph2word, mel2word, mels, adj = _inputs(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, txt, words, ph2word, mel2word=mel2word,
                        tgt_mels=mels, rng=rng)
    out = model.apply(params, txt, words, ph2word, mel2word=mel2word,
                      tgt_mels=mels, rng=rng)
    assert out["mel_out"].shape == mels.shape
    assert np.isfinite(np.asarray(out["mel_out"])).all()
    # the fft variant builds a different (smaller) encoder tree
    cfg2 = _tiny_cfg(encoder_type="fft")
    p2 = PortaSpeech(cfg2).init(rng, txt, words, ph2word, mel2word=mel2word,
                                tgt_mels=mels, rng=rng)
    names = set(p2["params"]["encoder"].keys())
    assert any("layer" in n for n in names)


def test_long_text_chunked_synthesis():
    """Inputs beyond the largest token bucket are chunked at clause
    boundaries and joined with short gaps — both TTS engines."""
    from audiogpt_tpu.engines.tts import (
        PortaSpeechTTSEngine, TTSEngine, split_for_buckets,
    )
    from audiogpt_tpu.engines.vocoder import VocoderEngine
    from audiogpt_tpu.models.tts.fastspeech2 import FastSpeech2Config
    from audiogpt_tpu.models.vocoder.hifigan import HifiGANConfig

    voc = VocoderEngine("hifigan", cfg=HifiGANConfig(
        in_channels=20, upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), sample_rate=22050),
        buckets=(64, 128))
    eng = TTSEngine(cfg=FastSpeech2Config(
        vocab_size=90, hidden_size=16, enc_layers=1, dec_layers=1,
        num_heads=2, enc_ffn_kernel_size=3, dec_ffn_kernel_size=3, n_mels=20,
        dur_predictor_layers=1, predictor_layers=1, predictor_hidden=8,
        max_frames=128), vocoder=voc, token_buckets=(16, 32))
    # splitter respects the bucket ceiling
    long_text = ("the cat sat on the mat, the dog ran in the park, "
                 "a bird sang in the tree, and then everyone slept.")
    chunks = split_for_buckets(
        eng.frontend, long_text,
        lambda pt: len(pt.phones) <= 32)
    assert len(chunks) > 1
    assert all(len(eng.frontend(c).phones) <= 32 for c in chunks)
    # end-to-end long synthesis produces one joined waveform
    wav = eng(long_text)
    assert wav.ndim == 1 and len(wav) > 0 and np.isfinite(wav).all()

    cfg = _tiny_cfg(max_frames=64, n_mels=20)
    ps = PortaSpeechTTSEngine(cfg=cfg, word_vocab=["<BOS>", "<EOS>"],
                              token_buckets=(16, 32), word_buckets=(8, 16),
                              vocoder=voc)
    wav2 = ps(long_text)
    assert wav2.ndim == 1 and len(wav2) > 0 and np.isfinite(wav2).all()
