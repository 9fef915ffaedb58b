"""TTS engine: text → mel (FastSpeech2) → wav (vocoder), two jit programs.

Replaces the reference's TTS tool chain (``audio-chatgpt.py:275-297`` →
``BaseTTSInfer.infer_once``, ``inference/tts/base_tts_infer.py:66``) — there
the acoustic model is PortaSpeech whose module is missing from the reference
tree (SURVEY.md §2.2); per BASELINE.json the parity target is the
FastSpeech2-class text→mel→wav pipeline.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from audiogpt_tpu.registry import ENGINES
from audiogpt_tpu.engines.base import Bucketer, Engine
from audiogpt_tpu.engines.vocoder import VocoderEngine
from audiogpt_tpu.models.tts import FastSpeech2, FastSpeech2Config
from audiogpt_tpu.text import EnglishFrontend, TokenTextEncoder

TOKEN_BUCKETS = (32, 64, 128, 256)


@ENGINES.register("tts")
class TTSEngine(Engine):
    name = "tts"

    def __init__(
        self,
        cfg: FastSpeech2Config | None = None,
        params=None,
        vocoder: VocoderEngine | None = None,
        frontend: EnglishFrontend | None = None,
        phone_vocab: list[str] | None = None,
        token_buckets=TOKEN_BUCKETS,
        rng_seed: int = 0,
    ):
        super().__init__()
        if frontend is None:
            if phone_vocab is None:
                from audiogpt_tpu.text import default_arpabet_vocab

                phone_vocab = default_arpabet_vocab()
            encoder = TokenTextEncoder(phone_vocab)
            frontend = EnglishFrontend(phone_encoder=encoder)
        self.frontend = frontend
        vocab_size = len(frontend.phone_encoder)
        self.cfg = cfg or FastSpeech2Config(vocab_size=vocab_size, max_frames=1024)
        if self.cfg.vocab_size < vocab_size:
            self.cfg = dataclasses.replace(self.cfg, vocab_size=vocab_size)
        self.model = FastSpeech2(self.cfg)
        if params is None:
            import jax.numpy as jnp

            params = self.model.init(
                jax.random.PRNGKey(rng_seed), jnp.zeros((1, 8), jnp.int32), infer=True
            )
        self.params = params
        self.vocoder = vocoder or VocoderEngine("hifigan")
        self.bucketer = Bucketer(token_buckets)
        self._fn = jax.jit(
            lambda p, toks: self.model.apply(p, toks, infer=True)["mel_out"]
        )

    def text_to_mel(self, text: str) -> np.ndarray:
        ids = np.asarray(self.frontend.encode(text), np.int32)
        padded, _ = self.bucketer.pad_to_bucket(ids[None], axis=1)
        mel = np.asarray(self._fn(self.params, padded))[0]
        # trim trailing all-zero (padding) frames
        nz = np.nonzero(np.abs(mel).sum(-1) > 0)[0]
        end = int(nz[-1]) + 1 if len(nz) else 1
        return mel[:end]

    def __call__(self, text: str) -> np.ndarray:
        """text → waveform (vocoder sample rate)."""
        mel = self.text_to_mel(text)
        return self.vocoder(mel)

    @property
    def sample_rate(self) -> int:
        return self.vocoder.cfg.sample_rate
