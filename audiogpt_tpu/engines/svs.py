"""Singing-voice synthesis engine (DiffSinger, opencpop-style scores).

Input contract mirrors the reference T2S tool (``audio-chatgpt.py:298-340`` →
``base_svs_infer.py:71-155``): either word-level
``{'text', 'notes', 'notes_duration'}`` with '|'-separated per-word windows,
or phoneme-level ``{'ph_seq', 'note_seq', 'note_dur_seq', 'is_slur_seq'}``.
Slur notes repeat the final (yunmu) phone with is_slur=1.

Word-level Chinese g2p: the reference uses pypinyin + the opencpop
pinyin→phone table; this image has neither, so the engine accepts
space-separated pinyin (or romanized) syllables directly and splits them
initial/final algorithmically — a user-supplied ``pinyin2phs`` table takes
precedence when available.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np

from audiogpt_tpu.registry import ENGINES
from audiogpt_tpu.engines.base import Bucketer, Engine
from audiogpt_tpu.engines.vocoder import VocoderEngine
from audiogpt_tpu.models.svs import DiffSinger, DiffSingerConfig
from audiogpt_tpu.text.encoder import TokenTextEncoder

from audiogpt_tpu.text.zh import INITIALS as _INITIALS, split_pinyin  # noqa: F401

_NOTE_OFFSET = {"C": 0, "D": 2, "E": 4, "F": 5, "G": 7, "A": 9, "B": 11}


def note_to_midi(name: str) -> int:
    """'C#4/Db4' → 61; 'rest' → 0 (librosa.note_to_midi semantics)."""
    name = name.split("/")[0].strip()
    m = re.match(r"^([A-Ga-g])([#b♯♭]*)(-?\d+)$", name)
    if not m:
        return 0
    letter, accidental, octave = m.groups()
    midi = _NOTE_OFFSET[letter.upper()] + 12 * (int(octave) + 1)
    for a in accidental:
        midi += 1 if a in "#♯" else -1
    return midi


def _default_svs_vocab():
    """opencpop-style pinyin initial/final phone set + specials."""
    finals = ["a", "o", "e", "i", "u", "v", "ai", "ei", "ao", "ou",
              "an", "en", "ang", "eng", "ong", "er", "ia", "iao",
              "ian", "iang", "ie", "in", "ing", "iong", "iu", "ua",
              "uai", "uan", "uang", "ui", "un", "uo", "ve", "vn"]
    return sorted(set(_INITIALS + finals + ["<AP>", "<SP>", "rest"]))


def parse_score(text: str, notes: str, notes_duration: str,
                pinyin2phs: dict[str, str] | None = None):
    """Word-level opencpop score → per-phone (phones, notes, durations,
    slur flags) (``base_svs_infer.py:72-140``): pinyin syllables split to
    initials/finals, '|'-windowed notes/durs aligned per word, extra notes
    in a window repeat the final phone with slur=1. Shared by the SVS
    engine and the SVS binarizer."""
    pinyin2phs = pinyin2phs or {}
    words = [w for w in re.split(r"[\s]+", text.strip()) if w]
    ph_per_word = []
    specials = {"SP": "<SP>", "AP": "<AP>", "rest": "rest"}
    for w in words:
        if w in pinyin2phs:
            ph_per_word.append(pinyin2phs[w])
        elif w in specials:
            # breath/silence marks in opencpop scores (base_svs_infer)
            ph_per_word.append(specials[w])
        else:
            ph_per_word.append(" ".join(split_pinyin(w)))
    note_windows = [x.strip() for x in notes.split("|") if x.strip()]
    dur_windows = [x.strip() for x in notes_duration.split("|") if x.strip()]
    if not (len(note_windows) == len(ph_per_word) == len(dur_windows)):
        raise ValueError(
            f"word/note/duration window counts differ: "
            f"{len(ph_per_word)}/{len(note_windows)}/{len(dur_windows)}")
    phs, note_lst, dur_lst, slur, ph2word = [], [], [], [], []
    for i, word_phs in enumerate(ph_per_word):
        wp = word_phs.split()
        wn = note_windows[i].split()
        wd = dur_windows[i].split()
        for p in wp:
            phs.append(p)
            note_lst.append(wn[0])
            dur_lst.append(wd[0])
            slur.append(0)
            ph2word.append(i + 1)
        for j in range(1, len(wn)):  # slur: repeat the final
            phs.append(wp[-1])
            note_lst.append(wn[j])
            dur_lst.append(wd[j])
            slur.append(1)
            ph2word.append(i + 1)
    return phs, note_lst, dur_lst, slur, ph2word


@ENGINES.register("svs")
class SVSEngine(Engine):
    name = "svs"

    def __init__(self, cfg: DiffSingerConfig | None = None, params=None,
                 vocoder: VocoderEngine | None = None,
                 phone_encoder: TokenTextEncoder | None = None,
                 pinyin2phs: dict[str, str] | None = None,
                 pitch_extractor=None, pe_params=None,
                 token_buckets=(32, 64, 128), rng_seed: int = 0,
                 pndm_speedup: int = 10):
        super().__init__()
        self.cfg = cfg or DiffSingerConfig()
        self.model = DiffSinger(self.cfg)
        # optional mel->f0 network for the NSF vocoder (reference pe_enable,
        # ds_e2e.py:42-44); DiffSinger-MIDI itself predicts no f0
        self.pitch_extractor = pitch_extractor
        self.pe_params = pe_params
        if pitch_extractor is not None and pe_params is None:
            self.pe_params = pitch_extractor.init(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros((1, 8, self.cfg.net.mel_bins)))
        self._pe_fn = None
        self.pinyin2phs = pinyin2phs or {}
        self.pndm_speedup = pndm_speedup
        if phone_encoder is None:
            phone_encoder = TokenTextEncoder(_default_svs_vocab())
        self.phone_encoder = phone_encoder
        self.vocoder = vocoder
        self.bucketer = Bucketer(token_buckets)
        self._rng = jax.random.PRNGKey(rng_seed)
        if params is None:
            toks = jnp.zeros((1, 4), jnp.int32)
            params = self.model.init(
                jax.random.PRNGKey(rng_seed), toks,
                pitch_midi=jnp.zeros((1, 4), jnp.int32),
                midi_dur=jnp.zeros((1, 4), jnp.float32),
                is_slur=jnp.zeros((1, 4), jnp.int32))
        self.params = params
        self._fn = jax.jit(
            lambda p, t, midi, dur, slur, rng: self.model.apply(
                p, t, pitch_midi=midi, midi_dur=dur, is_slur=slur, rng=rng,
                pndm_speedup=self.pndm_speedup))

    @property
    def sample_rate(self) -> int:
        """Output rate comes from the vocoder (opencpop ds1000: 24 kHz)."""
        if self.vocoder is not None:
            return self.vocoder.cfg.sample_rate
        return 24000

    # -- score parsing ------------------------------------------------------
    def parse_word_level(self, text: str, notes: str, notes_duration: str):
        return parse_score(text, notes, notes_duration, self.pinyin2phs)[:4]

    # -- synthesis ----------------------------------------------------------
    def synthesize(self, text: str, notes: str, notes_duration: str) -> np.ndarray:
        phs, note_lst, dur_lst, slur = self.parse_word_level(
            text, notes, notes_duration)
        tokens = np.asarray(self.phone_encoder.encode(phs), np.int32)
        midi = np.asarray([note_to_midi(n) for n in note_lst], np.int32)
        dur = np.asarray([float(d) for d in dur_lst], np.float32)
        slur_a = np.asarray(slur, np.int32)

        t, _ = self.bucketer.pad_to_bucket(tokens[None], axis=1)
        m, _ = self.bucketer.pad_to_bucket(midi[None], axis=1)
        d, _ = self.bucketer.pad_to_bucket(dur[None], axis=1)
        s, _ = self.bucketer.pad_to_bucket(slur_a[None], axis=1)

        self._rng, rng = jax.random.split(self._rng)
        out = self._fn(self.params, jnp.asarray(t), jnp.asarray(m),
                       jnp.asarray(d), jnp.asarray(s), rng)
        mel = np.asarray(out["mel_out"])[0]
        m2p = np.asarray(out["mel2ph"])[0]
        nz = np.nonzero(m2p > 0)[0]
        mel = mel[: (int(nz[-1]) + 1) if len(nz) else 1]
        if self.vocoder is None:
            return mel
        f0 = np.asarray(out["f0_denorm"])[0][: mel.shape[0]] \
            if out.get("f0_denorm") is not None else None
        if f0 is None and self.pitch_extractor is not None:
            if self._pe_fn is None:
                self._pe_fn = jax.jit(
                    lambda p, m: self.pitch_extractor.apply(p, m))
            # pad the trimmed mel onto the vocoder's bucket ladder so the PE
            # program compiles once per bucket, not once per unique length
            # (PE is conv-only with nonpad masking — padding-safe)
            vb = self.vocoder.bucketer
            mb = mel[None]
            if mel.shape[0] <= max(vb.buckets):
                mb, _ = vb.pad_to_bucket(mb, axis=1)
            pe_out = self._pe_fn(self.pe_params, jnp.asarray(mb))
            f0 = np.asarray(pe_out["f0_denorm_pred"])[0][: mel.shape[0]]
        return self.vocoder(mel, f0=f0)


@ENGINES.register("visinger")
class VISingerEngine(Engine):
    """VITS-class end-to-end SVS (the reference's ``t2s_VISinger`` tool,
    audio-chatgpt.py:341 — an external ESPnet model there, native here).
    Same score-string surface as :class:`SVSEngine`; emits waveform directly
    (no separate vocoder)."""

    name = "visinger"

    def __init__(self, cfg=None, params=None, phone_encoder=None,
                 pinyin2phs: dict[str, str] | None = None,
                 token_buckets=(32, 64, 128), rng_seed: int = 0,
                 sample_rate: int = 24000):
        from audiogpt_tpu.models.svs.visinger import VISinger, VISingerConfig

        super().__init__()
        self.cfg = cfg or VISingerConfig()
        self.pinyin2phs = pinyin2phs or {}
        self.model = VISinger(self.cfg)
        self._sr = sample_rate
        if phone_encoder is None:
            phone_encoder = TokenTextEncoder(_default_svs_vocab())
        self.phone_encoder = phone_encoder
        self.bucketer = Bucketer(token_buckets)
        self._rng = jax.random.PRNGKey(rng_seed)
        if params is None:
            t = jnp.ones((1, 4), jnp.int32)
            params = self.model.init(
                {"params": jax.random.PRNGKey(rng_seed)}, t,
                jnp.full((1, 4), 60, jnp.int32), jnp.zeros((1, 4), jnp.int32),
                rng=jax.random.PRNGKey(0))
        self.params = params
        self._fn = jax.jit(
            lambda p, t, midi, dur, slur, rng: self.model.apply(
                p, t, midi, slur, note_durs=dur,
                frames_per_sec=self.frames_per_sec, rng=rng))

    @property
    def sample_rate(self) -> int:
        return self._sr

    @property
    def frames_per_sec(self) -> float:
        return self._sr / self.cfg.decoder.hop_size

    def synthesize(self, text: str, notes: str, notes_duration: str) -> np.ndarray:
        # reuse the DiffSinger score parser via a temporary SVSEngine-less path
        parser = SVSEngine.parse_word_level
        phs, note_lst, dur_lst, slur = parser(self, text, notes, notes_duration)
        tokens = np.asarray(self.phone_encoder.encode(phs), np.int32)
        midi = np.asarray([note_to_midi(n) for n in note_lst], np.int32)
        dur = np.asarray([float(d) for d in dur_lst], np.float32)
        slur_a = np.asarray(slur, np.int32)
        t, _ = self.bucketer.pad_to_bucket(tokens[None], axis=1)
        m, _ = self.bucketer.pad_to_bucket(midi[None], axis=1)
        d, _ = self.bucketer.pad_to_bucket(dur[None], axis=1)
        s, _ = self.bucketer.pad_to_bucket(slur_a[None], axis=1)
        self._rng, rng = jax.random.split(self._rng)
        out = self._fn(self.params, jnp.asarray(t), jnp.asarray(m),
                       jnp.asarray(d), jnp.asarray(s), rng)
        wav = np.asarray(out["wav"])[0]
        n_frames = int((np.asarray(out["mel2ph"])[0] > 0).sum())
        return wav[: n_frames * self.cfg.decoder.hop_size]
