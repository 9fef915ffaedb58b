"""Overfit-to-artifact demos (VERDICT r2 weak#7 / next#6): tiny synthetic
sets that overfit in minutes, then the TRAINED weights must produce the
right artifact — turning "loss decreases" into "trained weights work":

  * vocoder_gan: sine fixture → trained spectrum lands ≥4× closer to the
    target than random init (phase-invariant losses ⇒ spectral metric),
  * fs2: token-determined mel target → inference-mode mel L1 beats random
    init AND the trained duration predictor emits a real-length clip,
  * ldm: single mel image → DDIM sample lands near the (VAE-roundtripped)
    target, far from where a random UNet's sample lands.

These are the slowest tests in the suite (hundreds of tiny train steps on
CPU); each is self-contained so `-k overfit` runs them standalone.
"""

import dataclasses

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from audiogpt_tpu.train import OptimConfig, Trainer, TrainerConfig


@pytest.mark.slow
def test_overfit_vocoder_gan_sine(tmp_path):
    from audiogpt_tpu.models.vocoder import HifiGANConfig
    from audiogpt_tpu.models.vocoder.discriminators import DiscriminatorConfig
    from audiogpt_tpu.train.tasks import VocoderGANTask, VocoderGANTaskConfig

    gen_cfg = HifiGANConfig(
        in_channels=20, upsample_rates=(8, 8),
        upsample_kernel_sizes=(16, 16), upsample_initial_channel=32,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),))
    frames, hop = 32, 64
    # narrow discriminator stacks: the DEFAULT widths are the production
    # (reference) ones — ~50 s/step on this 1-core host, which made this
    # demo unrunnable inside the suite (full-width MSD is ~100 GFLOP/step
    # even with a toy generator)
    task = VocoderGANTask(VocoderGANTaskConfig(
        gen=gen_cfg, disc=DiscriminatorConfig(periods=(2, 3), scales=2,
                                              period_channels=(16, 64),
                                              scale_channels=(16, 32, 64),
                                              scale_groups=(1, 1, 1)),
        segment_frames=frames,
        optim_gen=OptimConfig(optimizer="adamw", lr=1e-3,
                              schedule="constant", clip_grad_norm=0.0),
        optim_disc=OptimConfig(optimizer="adamw", lr=1e-3,
                               schedule="constant", clip_grad_norm=0.0)))

    n = frames * hop
    t = np.arange(n) / 16000.0
    sine = (0.4 * np.sin(2 * np.pi * 250.0 * t)).astype(np.float32)
    cond = np.random.default_rng(0).normal(
        size=(1, frames, 20)).astype(np.float32)  # fixed conditioning
    # batch of 8 copies: the trainer shards over the 8-device test mesh
    batch = {"mels": np.repeat(cond, 8, 0), "wav": np.repeat(sine[None], 8, 0)}

    trainer = Trainer(task, TrainerConfig(
        work_dir=str(tmp_path), max_updates=400, val_check_interval=10_000,
        log_interval=200, num_sanity_val_steps=0, use_tensorboard=False))
    state0 = trainer.init_state(jax.random.PRNGKey(0))

    from audiogpt_tpu.train.stft_loss import stft_loss

    def spec_l1(params) -> float:
        """Log-STFT-magnitude L1 to the target — the quantity the recipe's
        dominant loss term (lambda_mel=45) actually controls. Waveform SNR
        is NOT asserted: every reconstruction term (mel L1, multi-res STFT)
        is phase-invariant, so a perfectly trained generator may emit the
        right spectrum at an arbitrary phase and score ~0 dB SNR."""
        wav = task.gen.apply(params["gen"], jnp.asarray(cond))
        if wav.ndim == 3:
            wav = wav[..., 0]
        _, mag = stft_loss(wav, jnp.asarray(sine[None]),
                           resolutions=((512, 128, 512),))
        return float(mag)

    l1_random = spec_l1(state0["params"])
    state = trainer.fit(iter([batch] * 400))
    l1_trained = spec_l1(state["params"])

    # measured 0.062 on this recipe (2026-08-20); 0.25 leaves 4× headroom
    assert l1_trained < 0.25 * l1_random, \
        f"trained spectrum not close: random {l1_random:.3f}, " \
        f"trained {l1_trained:.3f}"


@pytest.mark.slow
def test_overfit_fs2_artifact(tmp_path):
    from audiogpt_tpu.models.tts.fastspeech2 import (FastSpeech2,
                                                     FastSpeech2Config)
    from audiogpt_tpu.train.tasks import FS2Task, FS2TaskConfig

    n_mels, toks, fpp = 20, 8, 6          # frames per phone
    frames = toks * fpp
    mcfg = FastSpeech2Config(
        vocab_size=30, hidden_size=32, enc_layers=2, dec_layers=2,
        num_heads=2, enc_ffn_kernel_size=3, dec_ffn_kernel_size=3,
        n_mels=n_mels, dur_predictor_layers=2, predictor_layers=2,
        predictor_hidden=16, max_frames=128)
    task = FS2Task(FS2TaskConfig(
        model=mcfg, lambda_ssim=0.0,
        optim=OptimConfig(schedule="constant", lr=2e-3)))

    # mel target is a pure function of the phone identity → learnable
    tokens = np.asarray([[3, 7, 12, 18, 22, 9, 15, 27]], np.int32)
    mel2ph = np.repeat(np.arange(1, toks + 1), fpp)[None].astype(np.int32)
    ph_mel = np.stack([np.sin(np.arange(n_mels) * (0.3 + 0.11 * p))
                       for p in tokens[0]]).astype(np.float32)  # [toks, M]
    mels = ph_mel[mel2ph[0] - 1][None]                          # [1, F, M]
    r8 = lambda x: np.repeat(x, 8, 0)   # shardable over the 8-device mesh
    batch = {"txt_tokens": r8(tokens), "mel2ph": r8(mel2ph), "mels": r8(mels),
             "f0": np.zeros((8, frames), np.float32),
             "uv": np.zeros((8, frames), np.float32),
             "weight": np.ones(8, np.float32)}

    trainer = Trainer(task, TrainerConfig(
        work_dir=str(tmp_path), max_updates=400, val_check_interval=10_000,
        log_interval=200, num_sanity_val_steps=0, use_tensorboard=False))
    state0 = trainer.init_state(jax.random.PRNGKey(0))
    model = FastSpeech2(mcfg)

    def infer_mel(params):
        out = model.apply(params, jnp.asarray(tokens), infer=True)
        m2p = np.asarray(out["mel2ph"])[0]
        return np.asarray(out["mel_out"])[0], int((m2p > 0).sum())

    mel_r, len_r = infer_mel(state0["params"]["model"])
    state = trainer.fit(iter([batch] * 400))
    mel_t, len_t = infer_mel(state["params"]["model"])

    # trained duration predictor emits a real-length clip (the BASELINE.md
    # trained-duration claim): within 40% of the target frame count
    assert 0.6 * frames <= len_t <= 1.4 * frames, \
        f"trained durations predict {len_t} frames vs target {frames}"

    def l1_to_target(mel, length):
        k = min(length, frames)
        return float(np.abs(mel[:k] - mels[0][:k]).mean()) if k else 1e9

    l1_r = l1_to_target(mel_r, max(len_r, 1))
    l1_t = l1_to_target(mel_t, len_t)
    assert l1_t < 0.5 * l1_r, \
        f"trained mel not closer to target: random {l1_r:.3f}, trained {l1_t:.3f}"


@pytest.mark.slow
def test_overfit_ldm_artifact(tmp_path):
    from audiogpt_tpu.models.diffusion import (UNetConfig, VAEConfig,
                                               ddim_sample)
    from audiogpt_tpu.models.diffusion.vae import AutoencoderKL
    from audiogpt_tpu.models.textenc import CLAPTextConfig
    from audiogpt_tpu.models.textenc.bert import BertConfig
    from audiogpt_tpu.train.tasks.ldm import LDMTask, LDMTaskConfig

    unet = UNetConfig(in_channels=4, out_channels=4, model_channels=32,
                      num_res_blocks=1, attention_resolutions=(1,),
                      channel_mult=(1, 2), num_heads=2, context_dim=16,
                      use_checkpoint=False)
    vae = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                    attn_resolutions=(), in_channels=1, out_ch=1,
                    z_channels=4, embed_dim=4, resolution=16)
    clap = CLAPTextConfig(
        bert=BertConfig(vocab_size=50, hidden_size=16, num_layers=1,
                        num_heads=2, intermediate_size=32, max_position=16),
        d_proj=16, max_length=8)
    task = LDMTask(LDMTaskConfig(
        unet=unet, vae=vae, clap=clap, timesteps=50, cond_drop_prob=1.0,
        optim=OptimConfig(optimizer="adamw", lr=2e-3, schedule="constant",
                          clip_grad_norm=1.0, ema_decay=0.0)))

    # one fixed 16x16 mel image; cond_drop 1.0 → fully unconditional model
    xx, yy = np.meshgrid(np.linspace(-1, 1, 16), np.linspace(-1, 1, 16))
    target = (0.8 * np.sin(3 * xx) * np.cos(2 * yy)).astype(np.float32)
    batch = {"mels": np.repeat(target[None, :, :, None], 8, 0),
             "text_ids": np.zeros((8, 8), np.int32),
             "text_mask": np.ones((8, 8), np.int32),
             "weight": np.ones(8, np.float32)}

    trainer = Trainer(task, TrainerConfig(
        work_dir=str(tmp_path), max_updates=500, val_check_interval=10_000,
        log_interval=250, num_sanity_val_steps=0, use_tensorboard=False))
    state0 = trainer.init_state(jax.random.PRNGKey(0))
    frozen = state0["params"]["frozen"]

    # reference point: the VAE-roundtripped target (what p_losses drives to)
    post = task.vae.apply(frozen["vae"], jnp.asarray(batch["mels"]),
                          method=AutoencoderKL.encode)
    z0 = post.mode()
    rt = np.asarray(task.vae.apply(frozen["vae"], z0,
                                   method=AutoencoderKL.decode))[0, :, :, 0]

    def sample(unet_params, seed):
        ctx = jnp.zeros((1, 2, 16))

        def eps(x, t, c):
            return task.unet.apply(unet_params, x, t, c)

        z = ddim_sample(eps, task.schedule, (1, 8, 8, 4), ctx, ctx,
                        jax.random.PRNGKey(seed), n_steps=25,
                        guidance_scale=1.0)
        return np.asarray(task.vae.apply(
            frozen["vae"], z, method=AutoencoderKL.decode))[0, :, :, 0]

    l1_random = np.abs(sample(state0["params"]["unet"], 1) - rt).mean()
    state = trainer.fit(iter([batch] * 500))
    l1_trained = np.abs(sample(state["params"]["unet"], 1) - rt).mean()
    assert l1_trained < 0.5 * l1_random, \
        f"trained sample not closer to target: random {l1_random:.3f}, " \
        f"trained {l1_trained:.3f}"
