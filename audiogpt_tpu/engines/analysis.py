"""Audio-analysis engines: captioning (A2T), sound-event detection, and
target-sound detection.

Reference tool adapters: ``A2T`` (``audio-chatgpt.py:578``, AudioCapModel at
``audio_to_text/inference_waveform.py:61``), ``SoundDetection`` (612, PVT at
``audio_detection/audio_infer/pytorch/models.py:141``),
``TargetSoundDetection`` (775, CDur at
``target_sound_detection/src/models.py:836``, CLIP-text query matching).

TPU shape discipline: audio is bucketed to a dyadic ladder of sample counts
so each bucket compiles once (cf. engines/base.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audiogpt_tpu.registry import ENGINES
from audiogpt_tpu.engines.base import Bucketer, Engine
from audiogpt_tpu.models.caption.captioner import (
    CaptionConfig, CaptionModel, caption_greedy_decode,
)
from audiogpt_tpu.models.sed.panns_sed import (
    SEDConfig, SEDModel, audioset_labels, detect_events,
)
from audiogpt_tpu.models.sed.tsd import (
    TSDConfig, TSDModel, decode_timestamps, median_filter,
)
from audiogpt_tpu.models.textenc import CLAPTextConfig, CLAPTextEncoder
from audiogpt_tpu.models.textenc.clap import WordPieceTokenizer
from audiogpt_tpu.dsp.mel import MelSpec, PANNS_MEL_32K, log_mel


@ENGINES.register("caption")
class CaptionEngine(Engine):
    """wav (32 kHz) → caption string. ``vocab``: id → word list."""

    name = "caption"

    def __init__(self, cfg: CaptionConfig | None = None, params=None,
                 vocab: list[str] | None = None, rng_seed: int = 0,
                 max_sec: float = 32.0):
        super().__init__()
        self.cfg = cfg or CaptionConfig()
        self.model = CaptionModel(self.cfg)
        self.vocab = vocab
        sr = self.cfg.cnn14.mel.sr if hasattr(self.cfg.cnn14, "mel") else 32000
        self.sr = sr
        self.bucketer = Bucketer(Bucketer.ladder(sr * 2, int(sr * max_sec)))
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(rng_seed), jnp.zeros((1, sr)),
                jnp.zeros((1, 4), jnp.int32), jnp.asarray([sr]))
        self.params = params

    def caption_tokens(self, wav: np.ndarray) -> np.ndarray:
        wav = np.asarray(wav, np.float32)
        padded, n = self.bucketer.pad_to_bucket(wav[None], axis=-1)
        return caption_greedy_decode(
            self.model, self.params, jnp.asarray(padded),
            jnp.asarray([n]))[0]

    def _decode_words(self, toks) -> str:
        words = []
        for t in toks[1:]:
            if t == self.cfg.eos_id:
                break
            words.append(self.vocab[t] if self.vocab and t < len(self.vocab)
                         else f"<{t}>")
        return " ".join(words)

    def caption(self, wav: np.ndarray) -> str:
        return self._decode_words(self.caption_tokens(wav))

    def caption_beam(self, wav: np.ndarray, beam_size: int = 3) -> str:
        """Beam-search caption (the reference A2T configs decode with beam,
        ``base_model.py``)."""
        from audiogpt_tpu.models.caption.captioner import caption_beam_decode

        wav = np.asarray(wav, np.float32)
        padded, n = self.bucketer.pad_to_bucket(wav[None], axis=-1)
        toks = caption_beam_decode(self.model, self.params,
                                   jnp.asarray(padded), jnp.asarray([n]),
                                   beam_size=beam_size)[0]
        return self._decode_words(toks)


@ENGINES.register("sed")
class SEDEngine(Engine):
    """wav (32 kHz) → AudioSet framewise events (+ top-k event summary)."""

    name = "sed"

    def __init__(self, cfg: SEDConfig | None = None, params=None,
                 model=None, rng_seed: int = 0, max_sec: float = 32.0):
        """``model`` overrides the backbone (e.g. ``PVTSED`` — the
        reference's actual SoundDetection net); default is PANN-SED. Both
        share the (wav, wav_len) → output-dict contract."""
        super().__init__()
        if model is not None:
            self.model = model
            self.cfg = model.cfg
        else:
            self.cfg = cfg or SEDConfig()
            self.model = SEDModel(self.cfg)
        sr = self.cfg.sample_rate
        self.bucketer = Bucketer(Bucketer.ladder(sr * 2, int(sr * max_sec)))
        if params is None:
            params = self.model.init(jax.random.PRNGKey(rng_seed),
                                     jnp.zeros((1, sr)), jnp.asarray([sr]))
        self.params = params

    @functools.cached_property
    def _fn(self):
        return jax.jit(lambda p, w, n: self.model.apply(p, w, n))

    def framewise(self, wav: np.ndarray) -> np.ndarray:
        wav = np.asarray(wav, np.float32)
        padded, n = self.bucketer.pad_to_bucket(wav[None], axis=-1)
        out = self._fn(self.params, jnp.asarray(padded), jnp.asarray([n]))
        frames = int(np.ceil(n / self.cfg.hop))
        return np.asarray(out["framewise_output"])[0, :frames]

    def detect(self, wav: np.ndarray, top_k: int = 10):
        fw = self.framewise(wav)
        fps = self.cfg.sample_rate / self.cfg.hop
        return detect_events(fw, audioset_labels(), top_k=top_k,
                             frames_per_second=fps)

    def plot(self, wav: np.ndarray, out_path: str, top_k: int = 10) -> str:
        """Two-panel figure: log spectrogram + top-k framewise event matrix —
        the reference tool's output artifact (audio-chatgpt.py:655-673)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from audiogpt_tpu.dsp.stft import stft

        wav = np.asarray(wav, np.float32)
        fw = self.framewise(wav)                      # [T, C]
        labels = audioset_labels()
        order = np.argsort(fw.max(axis=0))[::-1][:top_k]
        mat = fw[:, order]
        spec = np.abs(np.asarray(stft(wav, 1024, self.cfg.hop))).T  # [F, T]
        fps = self.cfg.sample_rate / self.cfg.hop

        fig, axs = plt.subplots(2, 1, sharex=True, figsize=(10, 4))
        axs[0].matshow(np.log(np.maximum(spec, 1e-8)), origin="lower",
                       aspect="auto", cmap="jet")
        axs[0].set_ylabel("Frequency bins")
        axs[0].set_title("Log spectrogram")
        axs[1].matshow(mat.T, origin="upper", aspect="auto", cmap="jet",
                       vmin=0, vmax=1)
        frames = spec.shape[-1]
        axs[1].xaxis.set_ticks(np.arange(0, frames, int(fps)))
        axs[1].xaxis.set_ticklabels(
            np.arange(0, int(np.ceil(frames / fps))))
        axs[1].yaxis.set_ticks(np.arange(top_k))
        axs[1].yaxis.set_ticklabels(
            [labels[i] if i < len(labels) else str(i) for i in order])
        axs[1].yaxis.grid(color="k", linestyle="solid", linewidth=0.3,
                          alpha=0.3)
        axs[1].set_xlabel("Seconds")
        axs[1].xaxis.set_ticks_position("bottom")
        plt.tight_layout()
        fig.savefig(out_path)
        plt.close(fig)
        return out_path


@ENGINES.register("tsd")
class TSDEngine(Engine):
    """(wav, text query) → on/offset timestamps of the described sound.

    The reference matches the query against precomputed CLIP text embeddings
    (``audio-chatgpt.py:833-875``); here the query embeds through the CLAP
    text tower directly — no embedding file needed.
    """

    name = "tsd"

    def __init__(self, cfg: TSDConfig | None = None,
                 clap_cfg: CLAPTextConfig | None = None,
                 params=None, clap_params=None, tokenizer=None,
                 rng_seed: int = 0, sample_rate: int = 22050,
                 mel: MelSpec | None = None, max_sec: float = 30.0):
        super().__init__()
        self.cfg = cfg or TSDConfig()
        self.clap_cfg = clap_cfg or CLAPTextConfig()
        self.model = TSDModel(self.cfg)
        self.clap = CLAPTextEncoder(self.clap_cfg)
        self.tokenizer = tokenizer or WordPieceTokenizer(
            vocab_size=self.clap_cfg.bert.vocab_size)
        self.mel = mel or MelSpec(sample_rate, 1024, 256, 1024,
                                  self.cfg.mel_bins, 50.0, sample_rate / 2,
                                  power=1.0, log="log10")
        frames_cap = int(max_sec * sample_rate / self.mel.hop)
        self.bucketer = Bucketer(Bucketer.ladder(256, frames_cap))
        k1, k2 = jax.random.split(jax.random.PRNGKey(rng_seed))
        if params is None:
            params = self.model.init(
                k1, jnp.zeros((1, 256, self.cfg.mel_bins)),
                jnp.zeros((1, self.cfg.embedding_dim)))
        if clap_params is None:
            clap_params = self.clap.init(k2, jnp.zeros((1, 4), jnp.int32))
        self.params = params
        self.clap_params = clap_params

    @functools.cached_property
    def _fn(self):
        return jax.jit(lambda p, mel, emb: self.model.apply(p, mel, emb))

    def embed_text(self, text: str) -> jnp.ndarray:
        ids, mask = self.tokenizer.encode(text, self.clap_cfg.max_length)
        emb = self.clap.apply(self.clap_params, jnp.asarray(ids)[None],
                              jnp.asarray(mask)[None],
                              method=CLAPTextEncoder.cls_embedding)
        # truncate to the TSD conditioning width
        if emb.shape[-1] != self.cfg.embedding_dim:
            emb = emb[..., : self.cfg.embedding_dim]
        return emb

    def detect(self, wav: np.ndarray, text: str,
               threshold: float = 0.5, window: int = 7):
        wav = np.asarray(wav, np.float32)
        m = np.asarray(log_mel(jnp.asarray(wav), self.mel))  # [T, M]
        padded, frames = self.bucketer.pad_to_bucket(m[None], axis=1)
        emb = self.embed_text(text)
        _, up = self._fn(self.params, jnp.asarray(padded), emb)
        probs = np.asarray(up)[0, :frames, 0]
        filtered = median_filter(probs[:, None], window, threshold)[:, 0]
        fps = self.mel.sr / self.mel.hop
        return decode_timestamps(filtered, fps)


@ENGINES.register("i2t")
class ImageCaptionEngine(Engine):
    """Image → caption string (the reference's ImageCaptioning tool,
    ``audio-chatgpt.py:126-137``: HF BLIP-base greedy generate). Native
    BLIP captioner; HF ckpts import via the ``blip`` converter family.

    ``vocab_path``: BERT ``vocab.txt`` for WordPiece decode (ships with the
    checkpoint); without it, token ids render as ``<id>`` placeholders
    (smoke/demo mode, same policy as :class:`CaptionEngine`).
    """

    name = "i2t"

    def __init__(self, cfg=None, params=None, vocab_path: str | None = None,
                 rng_seed: int = 0, max_tokens: int = 24):
        super().__init__()
        from audiogpt_tpu.models.caption.blip import BlipCaptioner, BlipConfig

        self.cfg = cfg or BlipConfig()
        self.model = BlipCaptioner(self.cfg)
        self.max_tokens = max_tokens
        self.tokenizer = WordPieceTokenizer(
            vocab_path, vocab_size=self.cfg.text.vocab_size)
        if params is None:
            s = self.cfg.vision.image_size
            params = self.model.init(
                jax.random.PRNGKey(rng_seed), jnp.zeros((1, s, s, 3)),
                jnp.zeros((1, 2), jnp.int32))
        self.params = params

    def caption_tokens(self, images: np.ndarray) -> np.ndarray:
        """BLIP-normalized images [B, S, S, 3] → tokens [B, 1+max_tokens]."""
        from audiogpt_tpu.models.caption.blip import greedy_caption

        return np.asarray(greedy_caption(
            self.model, self.params, jnp.asarray(images), self.max_tokens))

    def caption_image(self, image) -> str:
        """image path / array → caption text."""
        from audiogpt_tpu.models.caption.blip import preprocess_image

        px = preprocess_image(image, self.cfg.vision.image_size)
        toks = self.caption_tokens(px)[0]
        t = self.cfg.text
        body = [i for i in toks[1:] if i != t.eos_id]  # strip bos + eos pad
        stop = np.where(toks[1:] == t.eos_id)[0]
        if len(stop):
            body = toks[1:][: stop[0]]
        return self.tokenizer.decode(body)

    def __call__(self, image_path: str) -> str:
        return self._timed("i2t", lambda: self.caption_image(image_path))

    def warmup(self) -> None:
        s = self.cfg.vision.image_size
        self.caption_tokens(np.zeros((1, s, s, 3), np.float32))
