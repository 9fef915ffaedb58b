"""VISinger (VITS-class SVS): flow invertibility, inference shapes,
training losses through the Trainer."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from audiogpt_tpu.models.svs.visinger import (
    ResidualCouplingFlow, VISinger, VISingerConfig,
)
from audiogpt_tpu.models.vocoder.hifigan import HifiGANConfig


def _tiny_cfg():
    return VISingerConfig(
        vocab_size=40, hidden=16, enc_layers=1, enc_heads=2, latent_dim=8,
        spec_bins=33, posterior_layers=2, flow_layers=2, flow_wn_layers=2,
        max_frames=32,
        decoder=HifiGANConfig(in_channels=8, upsample_rates=(4, 2),
                              upsample_kernel_sizes=(8, 4),
                              upsample_initial_channel=16,
                              resblock_kernel_sizes=(3,),
                              resblock_dilation_sizes=((1, 3),)))


def test_flow_invertible():
    flow = ResidualCouplingFlow(channels=8, hidden=16, n_layers=2,
                                wn_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 8))
    mask = jnp.ones((2, 12))
    params = flow.init(jax.random.PRNGKey(1), x, mask)
    z = flow.apply(params, x, mask)
    x_rec = flow.apply(params, z, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x),
                               atol=1e-5, rtol=1e-5)


def test_inference_from_score():
    cfg = _tiny_cfg()
    model = VISinger(cfg)
    t = 6
    toks = jnp.asarray([[3, 5, 7, 9, 11, 0]], jnp.int32)
    midi = jnp.asarray([[60, 62, 64, 60, 58, 0]], jnp.int32)
    slur = jnp.zeros((1, t), jnp.int32)
    durs = jnp.asarray([[0.05, 0.05, 0.1, 0.05, 0.05, 0.0]])
    params = model.init({"params": jax.random.PRNGKey(0)}, toks, midi, slur,
                        rng=jax.random.PRNGKey(1))
    out = model.apply(params, toks, midi, slur, note_durs=durs,
                      frames_per_sec=100.0, rng=jax.random.PRNGKey(2))
    hop = cfg.decoder.hop_size
    assert out["wav"].shape == (1, cfg.max_frames * hop)
    assert np.isfinite(np.asarray(out["wav"])).all()
    # note durations drove the alignment: 0.3 s * 100 fps = 30 frames
    assert int((np.asarray(out["mel2ph"]) > 0).sum()) == 30


def test_training_task(tmp_path):
    from audiogpt_tpu.models.vocoder.discriminators import DiscriminatorConfig
    from audiogpt_tpu.train import Trainer, TrainerConfig
    from audiogpt_tpu.train.tasks.visinger import (
        VISingerTask, VISingerTaskConfig,
    )

    cfg = VISingerTaskConfig(
        model=_tiny_cfg(),
        disc=DiscriminatorConfig(periods=(2,), scales=1,
                                 period_channels=(16, 64),
                                 scale_channels=(16, 32, 64),
                                 scale_groups=(1, 1, 1)))
    task = VISingerTask(cfg)
    tcfg = TrainerConfig(work_dir=str(tmp_path), max_updates=2,
                         val_check_interval=100, log_interval=1,
                         num_sanity_val_steps=0, use_tensorboard=False)
    trainer = Trainer(task, tcfg)

    rng = np.random.default_rng(0)
    b, t, f = 8, 6, 24
    hop = cfg.model.decoder.hop_size
    batch = {
        "txt_tokens": rng.integers(3, 40, (b, t)).astype(np.int32),
        "pitch_midi": rng.integers(50, 70, (b, t)).astype(np.int32),
        "is_slur": np.zeros((b, t), np.int32),
        "mel2ph": np.repeat(np.arange(1, t + 1), f // t)[None].repeat(
            b, 0).astype(np.int32),
        "spec": np.abs(rng.normal(size=(b, f, 33))).astype(np.float32),
        "wav": (rng.normal(size=(b, f * hop)) * 0.1).astype(np.float32),
        "weight": np.ones(b, np.float32),
    }

    def gen():
        while True:
            yield batch

    trainer.fit(gen())
    lines = [json.loads(l) for l in open(os.path.join(tmp_path,
                                                      "metrics.jsonl"))]
    tr = [l for l in lines if l["prefix"] == "tr"]
    assert tr
    for k in ("kl", "mel", "adv", "fm", "d_loss", "pdur"):
        assert np.isfinite(tr[-1][k]), k
