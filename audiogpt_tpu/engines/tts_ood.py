"""Style-transfer TTS engine (the reference's TTS_OOD / "Style Transfer"
tool, ``audio-chatgpt.py:383``, GenerSpeech).

Reference inference (``inference/tts/GenerSpeech.py``) shells out to MFA for
forced alignment of the reference audio and loads two external embedding
ckpts; here the reference mel conditions the model directly (built-in global
style encoder + cross-attention prosody aligners — no aligner binary, no
external encoders), which keeps the whole path jittable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audiogpt_tpu.registry import ENGINES
from audiogpt_tpu.engines.base import Bucketer, Engine
from audiogpt_tpu.engines.vocoder import VocoderEngine
from audiogpt_tpu.models.tts.generspeech import GenerSpeech, GenerSpeechConfig
from audiogpt_tpu.dsp.mel import NEURALSEQ_MEL_22K, MelSpec, log_mel
from audiogpt_tpu.text.encoder import TokenTextEncoder
from audiogpt_tpu.text.frontend import EnglishFrontend


@ENGINES.register("tts_ood")
class StyleTransferEngine(Engine):
    name = "tts_ood"

    def __init__(self, cfg: GenerSpeechConfig | None = None, params=None,
                 vocoder: VocoderEngine | None = None,
                 frontend: EnglishFrontend | None = None,
                 phone_encoder: TokenTextEncoder | None = None,
                 mel: MelSpec | None = None,
                 token_buckets=(32, 64, 128), ref_frame_buckets=(128, 256, 512),
                 rng_seed: int = 0):
        super().__init__()
        import dataclasses as _dc

        self.cfg = cfg or GenerSpeechConfig()
        self.model = GenerSpeech(self.cfg)
        mel = mel or NEURALSEQ_MEL_22K
        if mel.n_mels != self.cfg.fs2.n_mels:
            mel = _dc.replace(mel, n_mels=self.cfg.fs2.n_mels)
        self.mel = mel
        self.vocoder = vocoder
        self.frontend = frontend or EnglishFrontend(phone_encoder=phone_encoder)
        if self.frontend.phone_encoder is None and phone_encoder is None:
            from audiogpt_tpu.text import default_arpabet_vocab

            self.frontend.phone_encoder = TokenTextEncoder(
                default_arpabet_vocab())
        self.token_bucketer = Bucketer(token_buckets)
        self.ref_bucketer = Bucketer(ref_frame_buckets)
        self._rng = jax.random.PRNGKey(rng_seed)
        if params is None:
            params = self.model.init(
                {"params": jax.random.PRNGKey(rng_seed)},
                jnp.ones((1, 8), jnp.int32), jnp.zeros((1, 16, self.cfg.fs2.n_mels)))
        self.params = params

    #: When True (default), inference refines the mel through the Glow
    #: post-flow (``run_post_glow``, generspeech.py:233). NOTE: the flow's
    #: coupling nets are zero-initialized (standard Glow), so with UNTRAINED
    #: weights the flow output ignores its conditioning — set False for
    #: random-weight smoke runs to see the style-sensitive FS2 decoder path.
    infer_postflow: bool = True

    @functools.cached_property
    def _fn(self):
        @functools.partial(jax.jit, static_argnames=("postflow",))
        def run(params, tokens, ref_mel, rng, postflow):
            return self.model.apply(params, tokens, ref_mel, rng=rng,
                                    infer_postflow=postflow)

        return run

    @property
    def sample_rate(self) -> int:
        return self.mel.sr

    def synthesize(self, text: str, ref_wav: np.ndarray) -> np.ndarray:
        """(text, reference voice wav @ mel.sr) → wav in the reference style."""
        tokens = np.asarray(self.frontend.encode(text), np.int32)
        t, _ = self.token_bucketer.pad_to_bucket(tokens[None], axis=1)
        ref = np.asarray(log_mel(jnp.asarray(np.asarray(ref_wav, np.float32)),
                                 self.mel))
        ref_p, _ = self.ref_bucketer.pad_to_bucket(ref[None], axis=1)
        self._rng, rng = jax.random.split(self._rng)
        out = self._fn(self.params, jnp.asarray(t), jnp.asarray(ref_p), rng,
                       self.infer_postflow and self.cfg.use_post_flow)
        mel = np.asarray(out["mel_out"])[0]
        m2p = np.asarray(out["mel2ph"])[0]
        nz = np.nonzero(m2p > 0)[0]
        mel = mel[: (int(nz[-1]) + 1) if len(nz) else 1]
        if self.vocoder is None:
            return mel
        return self.vocoder(mel)
