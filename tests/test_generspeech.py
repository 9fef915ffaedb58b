"""GenerSpeech (style-transfer TTS): model outputs, Glow invertibility,
VQ-EMA updates, training losses, engine end-to-end."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiogpt_tpu.models.tts.fastspeech2 import FastSpeech2Config
from audiogpt_tpu.models.tts.generspeech import (
    GenerSpeech, GenerSpeechConfig, Glow, VQEmbeddingEMA,
)


def _tiny_cfg(**kw):
    fs2 = FastSpeech2Config(
        vocab_size=90, hidden_size=16, enc_layers=1, dec_layers=1,
        num_heads=2, enc_ffn_kernel_size=3, dec_ffn_kernel_size=3, n_mels=20,
        dur_predictor_layers=1, predictor_layers=1, predictor_hidden=8,
        max_frames=32)
    return GenerSpeechConfig(fs2=fs2, n_vq=8, emb_dim=16, glow_hidden=16,
                             glow_steps=2, glow_wn_layers=2, **kw)


class TestGlow:
    def test_invertible(self):
        glow = Glow(in_channels=20, hidden=16, n_steps=2, wn_layers=2)
        rng = jax.random.PRNGKey(0)
        mel = jax.random.normal(rng, (2, 16, 20))
        cond = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 30))
        mask = jnp.ones((2, 16))
        params = glow.init(rng, mel, cond, mask, method=Glow.forward)
        z, nll = glow.apply(params, mel, cond, mask, method=Glow.forward)
        assert np.isfinite(float(nll))

        # reverse(forward) == identity: run reverse steps manually on z
        def roundtrip(params, mel):
            x, m = Glow.squeeze(mel, mask)
            g, _ = Glow.squeeze(cond, mask)

            def fwd_then_bwd(mdl):
                h = x
                for step in mdl.steps:
                    h, _ = step.forward(h, g, m)
                for step in reversed(mdl.steps):
                    h = step.reverse(h, g, m)
                return h

            return glow.apply(params, method=fwd_then_bwd), x

        rec, orig = roundtrip(params, mel)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(orig),
                                   atol=1e-4, rtol=1e-4)

    def test_reverse_shape(self):
        glow = Glow(in_channels=20, hidden=16, n_steps=2, wn_layers=2)
        cond = jax.random.normal(jax.random.PRNGKey(1), (2, 17, 30))
        mask = jnp.ones((2, 17))
        mel = jnp.zeros((2, 17, 20))
        params = glow.init(jax.random.PRNGKey(0), mel, cond, mask,
                           method=Glow.forward)
        out = glow.apply(params, cond, mask, jax.random.PRNGKey(2),
                         method=Glow.reverse)
        assert out.shape == (2, 17, 20)


class TestVQ:
    def test_straight_through_and_ema(self):
        vq = VQEmbeddingEMA(n_codes=4, dim=8)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 8))
        vars_ = vq.init(jax.random.PRNGKey(1), x)
        (q, idx, _), new_vars = vq.apply(vars_, x, train=True,
                                         mutable=["vq_stats"])
        assert q.shape == x.shape and idx.shape == (2, 6)
        # EMA moved the codebook
        d = np.abs(np.asarray(new_vars["vq_stats"]["embedding"])
                   - np.asarray(vars_["vq_stats"]["embedding"])).max()
        assert d > 0
        # gradient flows straight through to x
        g = jax.grad(lambda x_: vq.apply(vars_, x_)[0].sum())(x)
        np.testing.assert_allclose(np.asarray(g), np.ones_like(g))


class TestModel:
    def test_infer_shapes(self):
        cfg = _tiny_cfg()
        model = GenerSpeech(cfg)
        tokens = jnp.asarray([[3, 5, 7, 9, 0, 0]], jnp.int32)
        ref = jax.random.normal(jax.random.PRNGKey(0), (1, 24, 20))
        params = model.init({"params": jax.random.PRNGKey(1)}, tokens, ref)
        out = model.apply(params, tokens, ref, rng=jax.random.PRNGKey(2))
        assert out["mel_out"].shape == (1, cfg.fs2.max_frames, 20)
        assert np.isfinite(np.asarray(out["mel_out"])).all()
        assert out["mel2ph"].shape == (1, cfg.fs2.max_frames)

    def test_train_losses(self):
        cfg = _tiny_cfg()
        model = GenerSpeech(cfg)
        b, t, f = 2, 8, 16
        tokens = jnp.asarray(np.random.default_rng(0).integers(3, 80, (b, t)),
                             jnp.int32)
        mel2ph = jnp.asarray(
            np.repeat(np.arange(1, t + 1), f // t)[None].repeat(b, 0), jnp.int32)
        ref = jax.random.normal(jax.random.PRNGKey(0), (b, f, 20))
        f0 = jnp.zeros((b, f))
        uv = jnp.zeros((b, f))
        params = model.init({"params": jax.random.PRNGKey(1)}, tokens, ref)
        out, _ = model.apply(params, tokens, ref, mel2ph=mel2ph, f0=f0, uv=uv,
                             train=True, rng=jax.random.PRNGKey(2),
                             mutable=["vq_stats"])
        for k in ("vq_commit", "guided_attn", "postflow_nll"):
            assert np.isfinite(float(out[k])), k
        assert out["mel_out"].shape == (b, f, 20)

    def test_style_affects_output(self):
        cfg = _tiny_cfg(use_post_flow=False)
        model = GenerSpeech(cfg)
        tokens = jnp.asarray([[3, 5, 7, 9]], jnp.int32)
        ref1 = jax.random.normal(jax.random.PRNGKey(0), (1, 24, 20))
        ref2 = jax.random.normal(jax.random.PRNGKey(9), (1, 24, 20)) * 2.0
        params = model.init({"params": jax.random.PRNGKey(1)}, tokens, ref1)
        o1 = model.apply(params, tokens, ref1, rng=jax.random.PRNGKey(2))
        o2 = model.apply(params, tokens, ref2, rng=jax.random.PRNGKey(2))
        assert np.abs(np.asarray(o1["mel_out"]) -
                      np.asarray(o2["mel_out"])).max() > 1e-4


class TestEngine:
    def test_synthesize(self):
        from audiogpt_tpu.engines.tts_ood import StyleTransferEngine

        eng = StyleTransferEngine(_tiny_cfg(use_post_flow=False),
                                  token_buckets=(16, 32),
                                  ref_frame_buckets=(128,))
        sr = eng.sample_rate
        t = np.arange(sr) / sr
        ref_wav = (0.2 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
        mel = eng.synthesize("hello world", ref_wav)
        assert mel.ndim == 2 and mel.shape[1] == 20
        assert np.isfinite(mel).all()


class TestTrainingTask:
    def test_generspeech_trainer_steps(self, tmp_path):
        import json
        import os

        import numpy as np
        from audiogpt_tpu.train import OptimConfig, Trainer, TrainerConfig
        from audiogpt_tpu.train.tasks import (
            GenerSpeechTask, GenerSpeechTaskConfig,
        )

        task = GenerSpeechTask(GenerSpeechTaskConfig(
            model=_tiny_cfg(), lambda_ssim=0.0,
            optim=OptimConfig(schedule="constant", lr=1e-3)))
        assert task.cfg.model.vq_ema is False  # jit-friendly mode forced
        tcfg = TrainerConfig(work_dir=str(tmp_path), max_updates=2,
                             val_check_interval=100, log_interval=1,
                             num_sanity_val_steps=0, use_tensorboard=False)
        trainer = Trainer(task, tcfg)
        rng = np.random.default_rng(0)
        b, t, f = 8, 8, 16
        batch = {
            "txt_tokens": rng.integers(3, 80, (b, t)).astype(np.int32),
            "mel2ph": np.repeat(np.arange(1, t + 1), f // t)[None].repeat(
                b, 0).astype(np.int32),
            "mels": rng.normal(size=(b, f, 20)).astype(np.float32),
            "f0": rng.uniform(100, 300, (b, f)).astype(np.float32),
            "uv": np.zeros((b, f), np.float32),
            "weight": np.ones(b, np.float32),
        }

        def gen():
            while True:
                yield batch

        trainer.fit(gen())
        lines = [json.loads(l)
                 for l in open(os.path.join(tmp_path, "metrics.jsonl"))]
        tr = [l for l in lines if l["prefix"] == "tr"]
        assert tr
        for k in ("mel", "commit", "guided", "postflow", "f0", "pdur"):
            assert np.isfinite(tr[-1][k]), k
        assert tr[-1]["nonfinite"] == 0
