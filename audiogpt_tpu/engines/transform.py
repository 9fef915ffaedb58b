"""Audio-transform engines: language-queried extraction, speech
enhancement/separation, and mono→binaural rendering.

Reference tool adapters: ``SoundExtraction`` (``audio-chatgpt.py:675``,
LASSNet magnitude mask + mixture-phase iSTFT at
``sound_extraction/utils/stft.py:53``), ``Speech_Enh_SS_SC``/``Speech_SS``
(957/1009, ESPnet ConvTasNet streamed 2.4 s / 0.8 s), ``Binaural`` (713,
BinauralNetwork chunked 1 s + receptive-field halo).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audiogpt_tpu.registry import ENGINES
from audiogpt_tpu.engines.base import Bucketer, Engine
from audiogpt_tpu.models.binaural.binaural import (
    BinauralConfig, BinauralNetwork, binauralize_chunked,
)
from audiogpt_tpu.models.extraction.lassnet import LASSNet, LASSNetConfig
from audiogpt_tpu.models.separation.convtasnet import (
    ConvTasNet, ConvTasNetConfig, separate_streaming,
)
from audiogpt_tpu.dsp.stft import istft, stft


@ENGINES.register("extraction")
class ExtractionEngine(Engine):
    """(mixture wav, text query) → extracted source wav.

    Magnitude mask on the STFT, resynthesized with the mixture phase
    (``audio-chatgpt.py:697-705``).
    """

    name = "extraction"

    def __init__(self, cfg: LASSNetConfig | None = None, params=None,
                 tokenizer=None, rng_seed: int = 0, sample_rate: int = 32000,
                 n_fft: int = 1024, hop: int = 256, max_sec: float = 20.0):
        super().__init__()
        self.cfg = cfg or LASSNetConfig()
        self.model = LASSNet(self.cfg)
        self.sr, self.n_fft, self.hop = sample_rate, n_fft, hop
        from audiogpt_tpu.models.textenc.clap import WordPieceTokenizer

        self.tokenizer = tokenizer or WordPieceTokenizer(
            vocab_size=self.cfg.bert.vocab_size)
        frames_cap = int(max_sec * sample_rate / hop)
        self.bucketer = Bucketer(Bucketer.ladder(256, frames_cap))
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros((1, 256, n_fft // 2 + 1)),
                jnp.zeros((1, 8), jnp.int32))
        self.params = params

    @functools.cached_property
    def _fn(self):
        return jax.jit(lambda p, sp, ids, m: self.model.apply(p, sp, ids, m))

    def extract(self, wav: np.ndarray, text: str) -> np.ndarray:
        wav = np.asarray(wav, np.float32)
        spec = stft(jnp.asarray(wav), self.n_fft, self.hop)   # [T, F]
        mag = jnp.abs(spec)
        padded, frames = self.bucketer.pad_to_bucket(np.asarray(mag)[None], axis=1)
        ids, mask = self.tokenizer.encode(text, 64)
        m = self._fn(self.params, jnp.asarray(padded),
                     jnp.asarray(ids)[None], jnp.asarray(mask)[None])
        m = np.asarray(m)[0, :frames]                          # [T, F]
        est = jnp.asarray(m) * spec                            # mixture phase
        out = istft(est, self.n_fft, self.hop, length=len(wav))
        return np.asarray(out)


@ENGINES.register("separation")
class SeparationEngine(Engine):
    """Conv-TasNet enhancement (n_src=1) or separation (n_src=2), streamed
    with overlap-add (2.4 s / 0.8 s — the reference's ESPnet contract)."""

    name = "separation"

    def __init__(self, cfg: ConvTasNetConfig | None = None, params=None,
                 model=None, rng_seed: int = 0):
        """``model`` overrides the separator net (e.g. ``SkiM`` — the
        reference Speech_SS backbone); default Conv-TasNet. Both share the
        mix [B, T] → [B, n_src, T] contract."""
        super().__init__()
        if model is not None:
            self.model = model
            self.cfg = model.cfg
        else:
            self.cfg = cfg or ConvTasNetConfig()
            self.model = ConvTasNet(self.cfg)
        if params is None:
            params = self.model.init(jax.random.PRNGKey(rng_seed),
                                     jnp.zeros((1, self.cfg.sample_rate)))
        self.params = params

    def separate(self, wav: np.ndarray, segment_sec: float = 2.4,
                 hop_sec: float = 0.8) -> np.ndarray:
        """→ [n_src, T]."""
        return separate_streaming(self.model, self.params,
                                  np.asarray(wav, np.float32),
                                  segment_sec, hop_sec)

    def enhance(self, wav: np.ndarray) -> np.ndarray:
        """→ [T] (first/only source)."""
        return self.separate(wav)[0]


@ENGINES.register("binaural")
class BinauralEngine(Engine):
    """mono (48 kHz) + listener trajectory → stereo binaural.

    The reference samples a random stored tx-position file
    (``audio-chatgpt.py:727-736``); default here is a deterministic slow
    circular orbit when no trajectory is given.
    """

    name = "binaural"

    def __init__(self, cfg: BinauralConfig | None = None, params=None,
                 rng_seed: int = 0):
        super().__init__()
        self.cfg = cfg or BinauralConfig()
        self.model = BinauralNetwork(self.cfg)
        if params is None:
            div = self.cfg.view_rate_div
            params = self.model.init(jax.random.PRNGKey(rng_seed),
                                     jnp.zeros((1, 4800)),
                                     jnp.zeros((1, 7, 4800 // div)))
        self.params = params

    def default_trajectory(self, n_view: int) -> np.ndarray:
        """[7, n_view]: (x, y, z, qw, qx, qy, qz) — a 1 m-radius orbit."""
        t = np.linspace(0, 2 * np.pi, n_view, endpoint=False)
        traj = np.zeros((7, n_view), np.float32)
        traj[0] = np.cos(0.1 * t)
        traj[1] = np.sin(0.1 * t)
        traj[3] = 1.0  # identity quaternion
        return traj

    def binauralize(self, mono: np.ndarray,
                    view: np.ndarray | None = None) -> np.ndarray:
        """→ [2, T] stereo."""
        mono = np.asarray(mono, np.float32)
        div = self.cfg.view_rate_div
        if view is None:
            view = self.default_trajectory(len(mono) // div)
        return binauralize_chunked(self.model, self.params, mono,
                                   np.asarray(view, np.float32))
