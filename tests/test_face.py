"""GeneFace-class subsystem: audio→motion VAE, landmark warp renderer,
MJPEG-AVI writer, and the geneface engine/tool surface.

Reference: ``audio-chatgpt.py:589-611`` registers the GeneFace tool but its
``audio_to_face`` backing package is missing from the reference tree (the
tool crashes on import — SURVEY §2.2). This native rebuild must actually
run: audio file in → playable video file out, audio muxed.
"""

import os

import jax
import numpy as np
import pytest

from audiogpt_tpu.models.face import (
    Audio2MotionConfig,
    Audio2MotionVAE,
    LandmarkWarper,
    default_portrait,
    kl_gauss,
    template_landmarks,
)

TINY = Audio2MotionConfig(mel_bins=16, hidden=16, latent=4, conv_layers=1)


class TestRenderer:
    def test_template_in_unit_square(self):
        tpl = template_landmarks()
        assert tpl.shape == (68, 2)
        assert tpl.min() >= 0.0 and tpl.max() <= 1.0
        # mouth center below nose below eyes (y down)
        assert tpl[48:68, 1].mean() > tpl[27:36, 1].mean() \
            > tpl[36:48, 1].mean()

    def test_identity_warp(self):
        w = LandmarkWarper(48, 48)
        port = default_portrait(48, 48)
        frames = w.render(port, np.repeat(template_landmarks()[None], 2, 0))
        assert frames.shape == (2, 48, 48, 3) and frames.dtype == np.uint8
        err = np.abs(frames[0].astype(np.float32) / 255 - port).mean()
        assert err < 0.02, err

    def test_motion_moves_pixels(self):
        w = LandmarkWarper(48, 48)
        port = default_portrait(48, 48)
        lm = template_landmarks()[None].copy()
        lm[0, 48:68, 1] += 0.05  # open mouth region
        moved = w.render(port, lm)
        still = w.render(port, template_landmarks()[None])
        assert np.abs(moved.astype(int) - still.astype(int)).mean() > 0.5


class TestVideoIO:
    def test_avi_roundtrip_header(self, tmp_path):
        from audiogpt_tpu.utils.video_io import read_avi_info, write_mjpeg_avi

        frames = (np.random.RandomState(0).rand(7, 32, 40, 3)
                  * 255).astype(np.uint8)
        p = str(tmp_path / "x.avi")
        write_mjpeg_avi(p, frames, fps=25)
        info = read_avi_info(p)
        assert info == {"n_frames": 7, "fps": 25, "width": 40, "height": 32,
                        "n_streams": 1, "n_video_chunks": 7}

    def test_avi_with_audio_stream(self, tmp_path):
        from audiogpt_tpu.utils.video_io import read_avi_info, write_mjpeg_avi

        frames = np.zeros((5, 16, 16, 3), np.uint8)
        wav = np.sin(np.linspace(0, 100, 3200)).astype(np.float32)
        p = str(tmp_path / "a.avi")
        write_mjpeg_avi(p, frames, fps=25, audio=wav, sample_rate=16000)
        info = read_avi_info(p)
        assert info["n_streams"] == 2 and info["n_frames"] == 5
        with open(p, "rb") as f:
            data = f.read()
        assert data.count(b"01wb") >= 5  # PCM chunks interleaved (movi+idx)


class TestAudio2MotionVAE:
    def test_shapes_and_generate(self):
        model = Audio2MotionVAE(TINY)
        mel = np.zeros((2, 80, TINY.mel_bins), np.float32)
        tv = TINY.video_len(80)
        motion = np.zeros((2, tv, TINY.out_dim), np.float32)
        params = model.init(jax.random.PRNGKey(0), mel, motion,
                            jax.random.PRNGKey(1))
        recon, (mu_q, lv_q), (mu_p, lv_p) = model.apply(
            params, mel, motion, jax.random.PRNGKey(2))
        assert recon.shape == (2, tv, TINY.out_dim)
        assert mu_q.shape == (2, tv, TINY.latent) == mu_p.shape
        out = model.apply(params, mel, jax.random.PRNGKey(3),
                          method=Audio2MotionVAE.generate)
        assert out.shape == (2, tv, TINY.out_dim)
        assert np.abs(np.asarray(out)).max() <= TINY.motion_scale + 1e-6

    def test_kl_zero_when_equal(self):
        mu = np.random.RandomState(0).randn(3, 4).astype(np.float32)
        lv = np.random.RandomState(1).randn(3, 4).astype(np.float32)
        assert np.abs(np.asarray(kl_gauss(mu, lv, mu, lv))).max() < 1e-6
        assert np.asarray(kl_gauss(mu + 1.0, lv, mu, lv)).mean() > 0.1

    def test_pseudo_targets(self):
        from audiogpt_tpu.models.face.audio2motion import \
            pseudo_motion_targets

        mel = np.random.RandomState(0).rand(80, 16).astype(np.float32)
        m = pseudo_motion_targets(mel, 40)
        assert m.shape == (40, 136)
        # articulation only touches y coords of mouth/jaw rows
        m3 = m.reshape(40, 68, 2)
        assert np.abs(m3[:, :, 0]).max() == 0.0
        assert np.abs(m3[:, 51, 1]).max() > 0.0


class TestAudio2MotionTask:
    def test_loss_decreases(self):
        import optax

        from audiogpt_tpu.train.tasks import (
            Audio2MotionTask, Audio2MotionTaskConfig,
        )

        task = Audio2MotionTask(Audio2MotionTaskConfig(model=TINY))
        params = task.init_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        tm = 64
        tv = TINY.video_len(tm)
        batch = {
            "mels": rng.random((4, tm, TINY.mel_bins)).astype(np.float32),
            "motion": (rng.random((4, tv, TINY.out_dim)).astype(np.float32)
                       - 0.5) * 0.05,
            "weight": np.ones(4, np.float32),
        }
        loss_fn = task.loss_fns["model"]
        opt = optax.adam(3e-3)
        state = opt.init(params)

        @jax.jit
        def step(params, state, key):
            (l, m), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, key)
            up, state = opt.update(g, state)
            return optax.apply_updates(params, up), state, l

        losses = []
        for i in range(30):
            params, state, l = step(params, state, jax.random.PRNGKey(i))
            losses.append(float(l))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < np.mean(losses[:5])


class TestGeneFaceEngine:
    @staticmethod
    def _engine(root):
        from audiogpt_tpu.engines.face import GeneFaceEngine

        return GeneFaceEngine(cfg=Audio2MotionConfig(
            hidden=16, latent=4, conv_layers=1),
            video_size=48, buckets=(64, 128), media_root=root)

    def test_audio_to_video_e2e(self, tmp_path):
        from audiogpt_tpu.utils.audio_io import save_wav
        from audiogpt_tpu.utils.video_io import read_avi_info

        root = str(tmp_path)
        os.makedirs(os.path.join(root, "audio"))
        t = np.arange(16000) / 16000
        wav = (0.3 * np.sin(2 * np.pi * 220 * t)
               * (np.sin(2 * np.pi * 3 * t) > 0)).astype(np.float32)
        save_wav(wav, os.path.join(root, "audio", "in.wav"), 16000)
        eng = self._engine(root)
        rel = eng("audio/in.wav")
        assert rel.startswith("video/") and rel.endswith(".avi")
        info = read_avi_info(os.path.join(root, rel))
        assert info["n_streams"] == 2
        assert abs(info["n_frames"] - 25) <= 2  # 1 s at 25 fps
        assert "geneface" in eng.timings

    def test_jit_cached_across_calls(self, tmp_path):
        eng = self._engine(str(tmp_path))
        mel = np.zeros((60, eng.cfg.mel_bins), np.float32)
        eng.landmarks(mel)
        info0 = eng._motion_fn.cache_info()
        eng.landmarks(mel + 0.5)
        assert eng._motion_fn.cache_info().misses == info0.misses
        assert eng._motion_fn.cache_info().hits > info0.hits

    def test_registers_as_tool(self, tmp_path):
        from audiogpt_tpu.agent.toolset import build_toolset

        eng = self._engine(str(tmp_path))
        tools = build_toolset({"geneface": eng}, root=str(tmp_path),
                              mode="text")
        assert ("Generate a talking human portrait video given a input Audio"
                in tools.names())

    def test_in_engine_registry(self):
        from audiogpt_tpu.app import ALL_ENGINES

        assert "geneface" in ALL_ENGINES
