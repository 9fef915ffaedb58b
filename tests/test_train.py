"""Training runtime tests: optimizers, SSIM, trainer loop (loss decreases,
checkpoints, resume), GAN vocoder recipe, DiffSinger recipe — all on the
8-device virtual CPU mesh (SURVEY.md §4(d))."""

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiogpt_tpu.models.tts.fastspeech2 import FastSpeech2Config
from audiogpt_tpu.train import (OptimConfig, Trainer, TrainerConfig,
                                make_optimizer, warmup_rsqrt_schedule)
from audiogpt_tpu.train.ssim import ssim, ssim_loss
from audiogpt_tpu.train.tasks import (FS2Task, FS2TaskConfig,
                                      VocoderGANTask, VocoderGANTaskConfig)


# -- optim -----------------------------------------------------------------

def test_rsqrt_schedule():
    s = warmup_rsqrt_schedule(lr=2.0, warmup_steps=100, hidden_size=64)
    vals = [float(s(jnp.asarray(t))) for t in [0, 50, 99, 100, 400]]
    assert vals[0] < vals[1] < vals[2]          # warmup rises
    assert vals[4] < vals[3]                    # decay after warmup
    # peak ≈ lr * d^-.5 * warmup^-.5
    assert abs(vals[3] - 2.0 * 64 ** -0.5 * 101 ** -0.5) / vals[3] < 0.05


def test_accumulation_matches_big_batch():
    # MultiSteps(k=2) on half-batches == single step on full batch (for SGD-
    # like first step of adam the update direction matches; check params equal)
    def loss(p, x):
        return jnp.mean((x @ p) ** 2)

    p0 = jnp.ones((4, 2))
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4))

    tx_full = make_optimizer(OptimConfig(schedule="constant", lr=0.1,
                                         clip_grad_norm=0.0))
    s_full = tx_full.init(p0)
    g_full = jax.grad(loss)(p0, x)
    u, _ = tx_full.update(g_full, s_full, p0)
    p_full = jax.tree.map(lambda a, b: a + b, p0, u)

    tx_acc = make_optimizer(OptimConfig(schedule="constant", lr=0.1,
                                        clip_grad_norm=0.0, accumulate_steps=2))
    s = tx_acc.init(p0)
    p = p0
    for half in (x[:4], x[4:]):
        g = jax.grad(loss)(p, half)
        u, s = tx_acc.update(g, s, p)
        p = jax.tree.map(lambda a, b: a + b, p, u)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_full), atol=1e-5)


# -- ssim ------------------------------------------------------------------

def test_ssim_identity_and_loss():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 40))
    s = ssim(x, x)
    assert float(s.mean()) > 0.999
    mask = jnp.ones((2, 32))
    assert float(ssim_loss(x, x, mask)) < 1e-4
    y = x + 0.5 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
    assert float(ssim_loss(x, y, mask)) > 0.05


# -- fs2 task + trainer ----------------------------------------------------

def _tiny_fs2_task():
    mcfg = FastSpeech2Config(
        vocab_size=30, hidden_size=16, enc_layers=1, dec_layers=1,
        num_heads=2, enc_ffn_kernel_size=3, dec_ffn_kernel_size=3, n_mels=20,
        dur_predictor_layers=1, predictor_layers=1, predictor_hidden=8,
        max_frames=32)
    return FS2Task(FS2TaskConfig(
        model=mcfg, lambda_ssim=0.5,
        optim=OptimConfig(schedule="constant", lr=2e-3)))


def _fs2_batch(rng, b=8, t=12, f=24, n_mels=20):
    tok = rng.integers(3, 30, (b, t)).astype(np.int32)
    mel2ph = np.repeat(np.arange(1, t + 1), f // t)[None].repeat(b, 0).astype(np.int32)
    f0 = rng.uniform(100, 300, (b, f)).astype(np.float32)
    uv = (rng.random((b, f)) < 0.2).astype(np.float32)
    f0 = f0 * (1 - uv)
    return {
        "txt_tokens": tok, "mel2ph": mel2ph,
        "mels": rng.normal(size=(b, f, n_mels)).astype(np.float32) * 0.5,
        "f0": f0, "uv": uv,
        "weight": np.ones(b, np.float32),
    }


def test_fs2_trainer_loss_decreases(tmp_path):
    task = _tiny_fs2_task()
    tcfg = TrainerConfig(work_dir=str(tmp_path), max_updates=30,
                         val_check_interval=15, log_interval=5,
                         num_sanity_val_steps=1, use_tensorboard=False)
    trainer = Trainer(task, tcfg)
    rng = np.random.default_rng(0)
    batch = _fs2_batch(rng)

    def train_gen():
        while True:
            yield batch

    def val_gen():
        yield batch

    state = trainer.fit(train_gen(), val_gen)
    assert int(jax.device_get(state["step"])) == 30

    lines = [json.loads(l) for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
    tr = [l for l in lines if l["prefix"] == "tr"]
    assert tr, "no training metrics logged"
    assert tr[-1]["total_loss"] < tr[0]["total_loss"], \
        f"loss did not decrease: {tr[0]['total_loss']} -> {tr[-1]['total_loss']}"
    assert all(l["nonfinite"] == 0 for l in tr)

    # checkpoints: kept, resumable, step preserved
    trainer2 = Trainer(task, tcfg)
    state2 = trainer2.restore_or_init()
    assert int(jax.device_get(state2["step"])) == 30
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state2["params"])[0]),
        np.asarray(jax.tree.leaves(state["params"])[0]), atol=1e-6)


def test_fs2_resume_continues(tmp_path):
    task = _tiny_fs2_task()
    tcfg = TrainerConfig(work_dir=str(tmp_path), max_updates=6,
                         val_check_interval=3, log_interval=100,
                         num_sanity_val_steps=0, use_tensorboard=False)
    rng = np.random.default_rng(1)
    batch = _fs2_batch(rng)

    def gen():
        while True:
            yield batch

    Trainer(task, tcfg).fit(gen())
    # resume with a higher budget: should continue from 6, not restart
    tcfg2 = TrainerConfig(work_dir=str(tmp_path), max_updates=9,
                          val_check_interval=3, log_interval=100,
                          num_sanity_val_steps=0, use_tensorboard=False)
    t2 = Trainer(task, tcfg2)
    state = t2.fit(gen())
    assert int(jax.device_get(state["step"])) == 9
    assert t2.store.latest_step() == 9


def test_weight_ema_tracks_and_resumes(tmp_path):
    # LitEma parity (reference ldm/modules/ema.py via ddpm.py use_ema):
    # shadow -= (1-d) * (shadow - p) after each update; shadows checkpoint
    # and restore with the state; ema_params() swaps them in for eval.
    mcfg = FastSpeech2Config(
        vocab_size=30, hidden_size=16, enc_layers=1, dec_layers=1,
        num_heads=2, enc_ffn_kernel_size=3, dec_ffn_kernel_size=3, n_mels=20,
        dur_predictor_layers=1, predictor_layers=1, predictor_hidden=8,
        max_frames=32)
    task = FS2Task(FS2TaskConfig(
        model=mcfg, lambda_ssim=0.0,
        optim=OptimConfig(schedule="constant", lr=2e-3,
                          ema_decay=0.5, ema_warmup=False)))
    tcfg = TrainerConfig(work_dir=str(tmp_path), max_updates=1,
                         val_check_interval=1, log_interval=100,
                         num_sanity_val_steps=0, use_tensorboard=False)
    trainer = Trainer(task, tcfg)
    state0 = trainer.init_state(jax.random.PRNGKey(0))
    p0 = jax.device_get(state0["params"]["model"])
    batch = _fs2_batch(np.random.default_rng(0))
    state1, _ = trainer._run_step(
        "model", state0, {k: jnp.asarray(v) for k, v in batch.items()},
        jax.random.PRNGKey(1))
    p1 = jax.device_get(state1["params"]["model"])
    ema1 = jax.device_get(state1["ema"]["model"])
    expect = jax.tree.map(lambda a, b: 0.5 * a + 0.5 * b, p0, p1)
    for e, x in zip(jax.tree.leaves(ema1), jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(x),
                                   rtol=1e-5, atol=1e-6)
    # shadows differ from live params once training moved them
    moved = any(not np.allclose(np.asarray(e), np.asarray(p))
                for e, p in zip(jax.tree.leaves(ema1), jax.tree.leaves(p1)))
    assert moved
    # ema_params view swaps the tracked group only
    view = trainer.ema_params(state1)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(view["model"])[0]),
        np.asarray(jax.tree.leaves(ema1)[0]))
    # checkpoint roundtrip keeps the shadows
    trainer.store.save(1, state1, metrics={"total_loss": 1.0})
    restored = trainer.store.restore(state1, 1)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored["ema"]["model"])[0]),
        np.asarray(jax.tree.leaves(ema1)[0]), atol=1e-6)


def test_ema_resume_from_legacy_checkpoint(tmp_path):
    # Checkpoints saved before the trainer grew state['ema'] (legacy
    # {params, opt, step} layout) must still resume; missing shadows are
    # seeded from the restored params (LitEma-on-construction semantics).
    mcfg = FastSpeech2Config(
        vocab_size=30, hidden_size=16, enc_layers=1, dec_layers=1,
        num_heads=2, enc_ffn_kernel_size=3, dec_ffn_kernel_size=3, n_mels=20,
        dur_predictor_layers=1, predictor_layers=1, predictor_hidden=8,
        max_frames=32)
    task = FS2Task(FS2TaskConfig(
        model=mcfg, lambda_ssim=0.0,
        optim=OptimConfig(schedule="constant", lr=2e-3,
                          ema_decay=0.999, ema_warmup=True)))
    tcfg = TrainerConfig(work_dir=str(tmp_path), use_tensorboard=False)
    trainer = Trainer(task, tcfg)
    full = trainer.init_state(jax.random.PRNGKey(0))
    legacy = {k: full[k] for k in ("params", "opt", "step")}
    legacy["step"] = jnp.asarray(7, jnp.int32)
    trainer.store.save(7, legacy, metrics={"total_loss": 1.0})

    t2 = Trainer(task, tcfg)
    state = t2.restore_or_init()
    assert int(jax.device_get(state["step"])) == 7
    assert set(state["ema"]) == {"model"}
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state["ema"]["model"])[0]),
        np.asarray(jax.tree.leaves(state["params"]["model"])[0]), atol=1e-6)


def test_ema_warmup_ramp_matches_litema(tmp_path):
    # LitEma increments num_updates BEFORE computing (1+n)/(10+n): the very
    # first update must use decay 2/11 (ldm/modules/ema.py), not 1/10.
    mcfg = FastSpeech2Config(
        vocab_size=30, hidden_size=16, enc_layers=1, dec_layers=1,
        num_heads=2, enc_ffn_kernel_size=3, dec_ffn_kernel_size=3, n_mels=20,
        dur_predictor_layers=1, predictor_layers=1, predictor_hidden=8,
        max_frames=32)
    task = FS2Task(FS2TaskConfig(
        model=mcfg, lambda_ssim=0.0,
        optim=OptimConfig(schedule="constant", lr=2e-3,
                          ema_decay=0.9999, ema_warmup=True)))
    trainer = Trainer(task, TrainerConfig(work_dir=str(tmp_path),
                                          use_tensorboard=False))
    state0 = trainer.init_state(jax.random.PRNGKey(0))
    p0 = jax.device_get(state0["params"]["model"])
    batch = _fs2_batch(np.random.default_rng(0))
    state1, _ = trainer._run_step(
        "model", state0, {k: jnp.asarray(v) for k, v in batch.items()},
        jax.random.PRNGKey(1))
    p1 = jax.device_get(state1["params"]["model"])
    d = 2.0 / 11.0
    expect = jax.tree.map(lambda a, b: d * a + (1 - d) * b, p0, p1)
    for e, x in zip(jax.tree.leaves(jax.device_get(state1["ema"]["model"])),
                    jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(x),
                                   rtol=1e-5, atol=1e-6)


def test_validate_runs_on_ema_params(tmp_path):
    # The reference validates under ema_scope when use_ema is on — the val
    # metric (and hence best-by-monitor selection) must reflect the shadow
    # weights, not the live ones.
    class _ScalarTask:
        def init_params(self, rng):
            return {"m": {"w": jnp.zeros(())}}

        @property
        def loss_fns(self):
            return {"m": lambda p, b, r: ((p["m"]["w"] - 3.0) ** 2, {})}

        @property
        def optim_cfgs(self):
            return {"m": OptimConfig(schedule="constant", lr=1e-3,
                                     ema_decay=0.5)}

    trainer = Trainer(_ScalarTask(), TrainerConfig(work_dir=str(tmp_path),
                                                   use_tensorboard=False))
    state = trainer.init_state(jax.random.PRNGKey(0))
    state["ema"] = {"m": {"w": jnp.asarray(3.0)}}  # shadow at the optimum
    batch = {"x": np.zeros((8, 1), np.float32), "weight": np.ones(8, np.float32)}
    avgs = trainer.validate(state, [batch])
    assert avgs["total_loss"] < 1e-6, \
        f"validate used live params, not EMA: {avgs}"


# -- vocoder GAN -----------------------------------------------------------

def test_vocoder_gan_steps(tmp_path):
    cfg = VocoderGANTaskConfig(
        gen=__import__("audiogpt_tpu.models.vocoder.hifigan",
                       fromlist=["HifiGANConfig"]).HifiGANConfig(
            in_channels=20, upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
            upsample_initial_channel=16, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),)),
        disc=__import__("audiogpt_tpu.models.vocoder.discriminators",
                        fromlist=["DiscriminatorConfig"]).DiscriminatorConfig(
            periods=(2, 3), scales=2, period_channels=(16, 64),
            scale_channels=(16, 32, 64), scale_groups=(1, 1, 1)),
        segment_frames=16)
    task = VocoderGANTask(cfg)
    tcfg = TrainerConfig(work_dir=str(tmp_path), max_updates=3,
                         val_check_interval=100, log_interval=1,
                         num_sanity_val_steps=0, use_tensorboard=False)
    trainer = Trainer(task, tcfg)
    rng = np.random.default_rng(0)
    hop = cfg.gen.hop_size
    batch = {
        "mels": rng.normal(size=(8, 16, 20)).astype(np.float32),
        "wav": rng.normal(size=(8, 16 * hop)).astype(np.float32) * 0.1,
        "weight": np.ones(8, np.float32),
    }

    def gen():
        while True:
            yield batch

    p0 = jax.device_get(trainer.restore_or_init()["params"])
    state = trainer.fit(gen())
    lines = [json.loads(l) for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
    tr = [l for l in lines if l["prefix"] == "tr"]
    assert tr and np.isfinite(tr[-1]["d_loss"]) and np.isfinite(tr[-1]["g_adv"])
    # both groups actually moved
    p1 = jax.device_get(state["params"])
    g0 = jax.tree.leaves(p0["gen"])[0]
    g1 = jax.tree.leaves(p1["gen"])[0]
    d0 = jax.tree.leaves(p0["disc"])[0]
    d1 = jax.tree.leaves(p1["disc"])[0]
    assert np.abs(g1 - g0).max() > 0
    assert np.abs(d1 - d0).max() > 0


# -- diffsinger ------------------------------------------------------------

def test_diffsinger_task_step(tmp_path):
    from audiogpt_tpu.models.svs.diffsinger import DiffNetConfig, DiffSingerConfig
    from audiogpt_tpu.train.tasks import DiffSingerTask, DiffSingerTaskConfig

    mcfg = DiffSingerConfig(
        fs2=FastSpeech2Config(vocab_size=30, hidden_size=16, enc_layers=1,
                              dec_layers=1, num_heads=2, enc_ffn_kernel_size=3,
                              dec_ffn_kernel_size=3, n_mels=20,
                              dur_predictor_layers=1, predictor_layers=1,
                              predictor_hidden=8, max_frames=32,
                              use_midi=True, rel_pos=True,
                              use_pitch_embed=False),
        net=DiffNetConfig(mel_bins=20, residual_layers=2, residual_channels=8,
                          encoder_hidden=16),
        timesteps=50, K_step=50,
        spec_min=(-6.0,) * 20, spec_max=(1.5,) * 20)
    task = DiffSingerTask(DiffSingerTaskConfig(
        model=mcfg, optim=OptimConfig(schedule="constant", lr=1e-3)))
    tcfg = TrainerConfig(work_dir=str(tmp_path), max_updates=3,
                         val_check_interval=100, log_interval=1,
                         num_sanity_val_steps=0, use_tensorboard=False)
    trainer = Trainer(task, tcfg)
    rng = np.random.default_rng(0)
    b, t, f = 8, 10, 20
    batch = {
        "txt_tokens": rng.integers(3, 30, (b, t)).astype(np.int32),
        "mel2ph": np.repeat(np.arange(1, t + 1), f // t)[None].repeat(b, 0).astype(np.int32),
        "mels": rng.normal(size=(b, f, 20)).astype(np.float32),
        "pitch_midi": rng.integers(50, 70, (b, t)).astype(np.int32),
        "midi_dur": rng.uniform(0.1, 0.5, (b, t)).astype(np.float32),
        "is_slur": np.zeros((b, t), np.int32),
        "weight": np.ones(b, np.float32),
    }

    def gen():
        while True:
            yield batch

    state = trainer.fit(gen())
    lines = [json.loads(l) for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
    tr = [l for l in lines if l["prefix"] == "tr"]
    assert tr and np.isfinite(tr[-1]["diff"]) and tr[-1]["nonfinite"] == 0


# -- adversarial TTS (ps_adv) ----------------------------------------------

def test_adv_tts_steps(tmp_path):
    from audiogpt_tpu.train.tasks import AdvTTSTask, AdvTTSTaskConfig, FS2TaskConfig

    cfg = AdvTTSTaskConfig(
        fs2=FS2TaskConfig(model=_tiny_fs2_task().cfg.model, lambda_ssim=0.0,
                          optim=OptimConfig(schedule="constant", lr=1e-3)),
        disc_windows=(8, 16), disc_hidden=8)
    task = AdvTTSTask(cfg)
    tcfg = TrainerConfig(work_dir=str(tmp_path), max_updates=2,
                         val_check_interval=100, log_interval=1,
                         num_sanity_val_steps=0, use_tensorboard=False)
    trainer = Trainer(task, tcfg)
    rng = np.random.default_rng(0)
    batch = _fs2_batch(rng, f=24)
    batch["mel_lengths"] = np.full(8, 24, np.int32)

    def gen():
        while True:
            yield batch

    state = trainer.fit(gen())
    lines = [json.loads(l) for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
    tr = [l for l in lines if l["prefix"] == "tr"]
    assert tr and np.isfinite(tr[-1]["adv"]) and np.isfinite(tr[-1]["d_loss"])


# -- VAE-GAN first stage ---------------------------------------------------

def test_vae_gan_steps(tmp_path):
    from audiogpt_tpu.models.diffusion import VAEConfig
    from audiogpt_tpu.train.tasks import VAETask, VAETaskConfig

    cfg = VAETaskConfig(vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                                      attn_resolutions=(), in_channels=1,
                                      z_channels=4, resolution=16))
    task = VAETask(cfg)
    tcfg = TrainerConfig(work_dir=str(tmp_path), max_updates=2,
                         val_check_interval=100, log_interval=1,
                         num_sanity_val_steps=0, use_tensorboard=False)
    trainer = Trainer(task, tcfg)
    rng = np.random.default_rng(0)
    batch = {"mels": rng.normal(size=(8, 16, 16, 1)).astype(np.float32),
             "weight": np.ones(8, np.float32)}

    def gen():
        while True:
            yield batch

    trainer.fit(gen())
    lines = [json.loads(l) for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
    tr = [l for l in lines if l["prefix"] == "tr"]
    assert tr and np.isfinite(tr[-1]["rec"]) and np.isfinite(tr[-1]["kl"]) \
        and np.isfinite(tr[-1]["d_loss"])


def test_preemption_graceful_stop(tmp_path):
    """SIGTERM mid-training → checkpoint written, resume continues (SURVEY
    §5: the reference has no preemption handling)."""
    import os
    import signal
    import threading

    task = _tiny_fs2_task()
    tcfg = TrainerConfig(work_dir=str(tmp_path), max_updates=1000,
                         val_check_interval=500, log_interval=1000,
                         num_sanity_val_steps=0, use_tensorboard=False)
    trainer = Trainer(task, tcfg)
    rng = np.random.default_rng(0)
    batch = _fs2_batch(rng)

    def gen():
        sent = False
        while True:
            yield batch
            if not sent:
                # after the first step: request stop like a preemption notice
                os.kill(os.getpid(), signal.SIGTERM)
                sent = True

    state = trainer.fit(gen())
    stopped_at = int(jax.device_get(state["step"]))
    assert 1 <= stopped_at < 1000
    assert trainer.store.latest_step() == stopped_at
    # resume picks up exactly there
    t2 = Trainer(task, tcfg)
    s2 = t2.restore_or_init()
    assert int(jax.device_get(s2["step"])) == stopped_at


def test_uniform_mel2ph_fallback():
    from audiogpt_tpu.train.losses import uniform_mel2ph

    m = uniform_mel2ph(jnp.asarray([4, 2]), jnp.asarray([8, 4]), 10)
    assert m.shape == (2, 10)
    got = np.asarray(m)
    # item 0: 8 frames over 4 tokens → 2 frames each, pads zero after
    np.testing.assert_array_equal(got[0], [1, 1, 2, 2, 3, 3, 4, 4, 0, 0])
    np.testing.assert_array_equal(got[1], [1, 1, 2, 2, 0, 0, 0, 0, 0, 0])


def test_train_cli_build_task():
    """Config → task construction for every registered task name."""
    from audiogpt_tpu.config import Config
    from audiogpt_tpu.train_cli import build_task

    fs2 = build_task(Config({"task": "fs2",
                             "model": {"hidden_size": 16, "enc_layers": 1,
                                       "dec_layers": 1,
                                       "enc_ffn_kernel_size": 3,
                                       "dec_ffn_kernel_size": 3,
                                       "predictor_hidden": 8},
                             "loss": {"lambda_ssim": 0.0},
                             "optim": {"schedule": "constant", "lr": 1e-3}}))
    assert fs2.cfg.model.hidden_size == 16
    assert fs2.cfg.lambda_ssim == 0.0
    assert fs2.cfg.optim.schedule == "constant"

    voc = build_task(Config({"task": "vocoder_gan",
                             "model": {"upsample_rates": [4, 4],
                                       "upsample_kernel_sizes": [8, 8]},
                             "segment_frames": 16}))
    assert voc.cfg.gen.upsample_rates == (4, 4)
    assert voc.cfg.segment_frames == 16


def test_ldm_task_steps(tmp_path):
    """LDM (T2A) training: eps loss finite, UNet moves, frozen stages don't."""
    from audiogpt_tpu.models.diffusion import UNetConfig, VAEConfig
    from audiogpt_tpu.models.textenc import CLAPTextConfig
    from audiogpt_tpu.models.textenc.bert import BertConfig
    from audiogpt_tpu.train.tasks import LDMTask, LDMTaskConfig

    cfg = LDMTaskConfig(
        unet=UNetConfig(model_channels=32, num_res_blocks=1,
                        channel_mult=(1, 2), num_heads=4, context_dim=24,
                        in_channels=4, use_checkpoint=False),
        vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(), in_channels=1, z_channels=4,
                      resolution=16),
        clap=CLAPTextConfig(bert=BertConfig(vocab_size=100, hidden_size=16,
                                            num_layers=1, num_heads=2,
                                            intermediate_size=32), d_proj=24),
        timesteps=50,
        optim=OptimConfig(optimizer="adamw", lr=1e-3, schedule="constant"))
    task = LDMTask(cfg)
    tcfg = TrainerConfig(work_dir=str(tmp_path), max_updates=2,
                         val_check_interval=100, log_interval=1,
                         num_sanity_val_steps=0, use_tensorboard=False)
    trainer = Trainer(task, tcfg)
    rng = np.random.default_rng(0)
    batch = {
        "mels": rng.normal(size=(8, 16, 16, 1)).astype(np.float32),
        "text_ids": rng.integers(1, 100, (8, 6)).astype(np.int32),
        "text_mask": np.ones((8, 6), np.int32),
        "weight": np.ones(8, np.float32),
    }

    def gen():
        while True:
            yield batch

    p0 = jax.device_get(trainer.restore_or_init()["params"])
    state = trainer.fit(gen())
    lines = [json.loads(l) for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
    tr = [l for l in lines if l["prefix"] == "tr"]
    assert tr and np.isfinite(tr[-1]["diff"])
    p1 = jax.device_get(state["params"])
    u0, u1 = jax.tree.leaves(p0["unet"]), jax.tree.leaves(p1["unet"])
    assert any(np.abs(a - b).max() > 0 for a, b in zip(u0, u1))
    f0_, f1_ = jax.tree.leaves(p0["frozen"]), jax.tree.leaves(p1["frozen"])
    assert all(np.abs(a - b).max() == 0 for a, b in zip(f0_, f1_))


def test_sed_task_step():
    """AudioSet tagging recipe: mixup + clipwise BCE finite, grads flow."""
    from audiogpt_tpu.models.caption.cnn14 import Cnn14Config
    from audiogpt_tpu.models.sed.panns_sed import SEDConfig
    from audiogpt_tpu.train.tasks import SEDTask, SEDTaskConfig

    task = SEDTask(SEDTaskConfig(
        model=SEDConfig(cnn14=Cnn14Config(channels=(8, 8, 16, 16, 32, 32)),
                        classes_num=10),
        optim=OptimConfig(schedule="constant", lr=1e-3)))
    params = task.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, sr = 2, 32000
    batch = {
        "wav": rng.normal(size=(b, sr)).astype(np.float32) * 0.1,
        "wav_len": np.full(b, sr, np.int32),
        "target": (rng.random((b, 10)) < 0.2).astype(np.float32),
        "weight": np.ones(b, np.float32),
    }
    loss, metrics = task.loss_fns["model"](params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)) and "clip_bce" in metrics
    g = jax.grad(lambda p: task.loss_fns["model"](p, batch,
                                                  jax.random.PRNGKey(1))[0]
                 )(params)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in jax.tree.leaves(g))


def test_caption_task_step():
    from audiogpt_tpu.models.caption.captioner import CaptionConfig
    from audiogpt_tpu.models.caption.cnn14 import Cnn14Config
    from audiogpt_tpu.train.tasks import CaptionTask, CaptionTaskConfig

    task = CaptionTask(CaptionTaskConfig(
        model=CaptionConfig(cnn14=Cnn14Config(channels=(8, 8, 16, 16, 32, 32)),
                            rnn_hidden=16, vocab_size=30, emb_dim=16, nhead=2,
                            nlayers=1, dim_feedforward=32, max_caption_len=8),
        optim=OptimConfig(schedule="constant", lr=1e-3)))
    params = task.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, sr, L = 2, 32000, 8
    batch = {
        "wav": rng.normal(size=(b, sr)).astype(np.float32) * 0.1,
        "wav_len": np.full(b, sr, np.int32),
        "tokens": rng.integers(1, 30, (b, L)).astype(np.int32),
        "token_len": np.asarray([8, 5], np.int32),
        "weight": np.ones(b, np.float32),
    }
    loss, metrics = task.loss_fns["model"](params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)) and 0 <= float(metrics["token_acc"]) <= 1


def test_separation_task_pit():
    from audiogpt_tpu.models.separation.convtasnet import ConvTasNetConfig
    from audiogpt_tpu.train.tasks import SeparationTask, SeparationTaskConfig
    from audiogpt_tpu.train.tasks.separation import pit_si_snr, si_snr

    # si_snr sanity: perfect reconstruction → large positive dB
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 800)),
                    jnp.float32)
    assert float(si_snr(x, x).min()) > 50
    # PIT picks the right permutation
    ref = jnp.stack([x, 2 * x + 1], axis=1)          # [2, 2, 800]
    est_swapped = ref[:, ::-1]
    assert float(pit_si_snr(est_swapped, ref).min()) > 50

    task = SeparationTask(SeparationTaskConfig(
        model=ConvTasNetConfig(n_src=2, enc_dim=32, bottleneck=8, hidden=16,
                               skip=8, n_blocks=2, n_repeats=1)))
    params = task.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "mix": rng.normal(size=(2, 8000)).astype(np.float32),
        "sources": rng.normal(size=(2, 2, 8000)).astype(np.float32),
        "weight": np.ones(2, np.float32),
    }
    loss, _ = task.loss_fns["model"](params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_validation_mel_figures(tmp_path):
    """save_valid_result parity: validation writes gt/pred mel figures."""
    task = _tiny_fs2_task()
    tcfg = TrainerConfig(work_dir=str(tmp_path), max_updates=4,
                         val_check_interval=4, log_interval=2,
                         num_sanity_val_steps=0, use_tensorboard=False)
    trainer = Trainer(task, tcfg)
    rng = np.random.default_rng(0)
    batch = _fs2_batch(rng)

    def gen():
        while True:
            yield batch

    def val_gen():
        yield batch

    trainer.fit(gen(), val_gen)
    figs = glob.glob(os.path.join(tmp_path, "figures", "mel_0_*.png"))
    assert figs, "no validation mel figures written"
    assert os.path.getsize(figs[0]) > 1000
