"""GeneFace-class engine: driving audio → talking-head video file.

Reference tool: ``audio-chatgpt.py:589-611`` (``GeneFace.inference``:
``audio_path`` → rendered video path; the backing ``audio_to_face`` package
is missing from the reference tree, so the reference tool cannot actually
run). This native rebuild keeps the same string-path tool surface and the
GeneFace pipeline shape — audio features → variational landmark motion →
per-frame renderer — with the substitutions documented in
``models/face/audio2motion.py``.

TPU notes: mel lengths bucket onto a dyadic ladder, the motion+landmark
program jit-compiles once per bucket (cached per engine —
``tests/test_jit_caching.py`` contract), and the renderer is one vmapped
warp program. Output is MJPEG-AVI with the driving audio muxed in
(``utils/video_io.py`` — no ffmpeg in this image).
"""

from __future__ import annotations

import functools
import os
import uuid

import jax
import jax.numpy as jnp
import numpy as np

from audiogpt_tpu.engines.base import Bucketer, Engine
from audiogpt_tpu.models.face.audio2motion import (Audio2MotionConfig,
                                                   Audio2MotionVAE,
                                                   energy_articulation)
from audiogpt_tpu.models.face.renderer import (LandmarkWarper,
                                               default_portrait,
                                               template_landmarks)
from audiogpt_tpu.registry import ENGINES


@ENGINES.register("geneface")
class GeneFaceEngine(Engine):
    name = "geneface"

    def __init__(self, cfg: Audio2MotionConfig | None = None,
                 params: dict | None = None,
                 portrait: np.ndarray | None = None,
                 media_root: str = ".", video_size: int = 256,
                 buckets: tuple[int, ...] = (256, 512, 1024, 2048),
                 rng_seed: int = 0, use_energy_prior: bool = True):
        super().__init__()
        self.cfg = cfg or Audio2MotionConfig()
        self.model = Audio2MotionVAE(self.cfg)
        self.media_root = media_root
        self.use_energy_prior = use_energy_prior
        self.bucketer = Bucketer(buckets)
        self.warper = LandmarkWarper(video_size, video_size)
        self.portrait = (default_portrait(video_size, video_size)
                         if portrait is None else portrait)
        self._template = template_landmarks()
        self._rng = jax.random.PRNGKey(rng_seed)
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros((1, buckets[0], self.cfg.mel_bins)),
                rng=jax.random.PRNGKey(0), method=Audio2MotionVAE.generate)
        self.params = params

    # -- compiled cores -----------------------------------------------------
    @functools.lru_cache(maxsize=8)
    def _motion_fn(self, mel_len: int):
        """One jit program per mel bucket: mel → [T_video, 68, 2] landmark
        positions (template + learned offsets (+ energy articulation))."""
        cfg = self.cfg
        tpl = jnp.asarray(self._template, jnp.float32)

        @jax.jit
        def run(params, mel, rng):                 # mel [T_mel, M]
            off = self.model.apply(
                params, mel[None], rng, method=Audio2MotionVAE.generate
            )[0]                                    # [T_v, 68*2]
            lm = tpl[None] + off.reshape(-1, 68, 2)
            if self.use_energy_prior:
                lm = lm + energy_articulation(mel, cfg)
            return lm

        return run

    def landmarks(self, mel: np.ndarray) -> np.ndarray:
        """mel [T_mel, 80] (LDM-normalized) → [T_video, 68, 2]."""
        t = mel.shape[0]
        b = self.bucketer.bucket(t)
        mel_p = np.pad(mel[:b], ((0, max(0, b - t)), (0, 0)))
        self._rng, rng = jax.random.split(self._rng)
        lm = np.asarray(self._motion_fn(b)(self.params,
                                           jnp.asarray(mel_p), rng))
        tv = self.cfg.video_len(min(t, b))
        return lm[:tv]

    # -- public tool surface ------------------------------------------------
    def audio_to_video(self, audio_path: str) -> str:
        from audiogpt_tpu.dsp.mel import LDM_MEL_16K, ldm_normalize, log_mel
        from audiogpt_tpu.utils.audio_io import load_wav
        from audiogpt_tpu.utils.video_io import write_mjpeg_avi

        wav, _sr = load_wav(self._resolve(audio_path),
                            sr=self.cfg.sample_rate)
        mel = np.asarray(ldm_normalize(log_mel(jnp.asarray(wav),
                                               LDM_MEL_16K)))  # [T, 80]
        lm = self.landmarks(mel)
        frames = self.warper.render(self.portrait, lm)
        rel = os.path.join("video", f"{uuid.uuid4().hex[:8]}.avi")
        out = os.path.join(self.media_root, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        write_mjpeg_avi(out, frames, fps=self.cfg.fps, audio=wav,
                        sample_rate=self.cfg.sample_rate)
        return rel

    def _resolve(self, path: str) -> str:
        if os.path.isfile(path):
            return path
        cand = os.path.join(self.media_root, path)
        return cand if os.path.isfile(cand) else path

    def __call__(self, audio_path: str) -> str:
        return self._timed("geneface", lambda: self.audio_to_video(audio_path))

    def warmup(self) -> None:
        self.landmarks(np.zeros((self.bucketer.buckets[0], self.cfg.mel_bins),
                                np.float32))
