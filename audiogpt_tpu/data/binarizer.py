"""Dataset preprocessing + binarization for TTS/SVS training.

Reference pipeline (``NeuralSeq/data_gen/tts/base_binarizer.py:22-220``):
metadata CSV → per-item {phonemes, mel, f0, mel2ph alignment, spk} → pickled
``IndexedDataset`` shards + ``phone_set.json`` / ``spk_map.json`` / length and
f0-statistics sidecars.

TPU re-design: the per-item compute (mel, f0) runs **batched on device**
through the shared DSP frontend instead of librosa/parselmouth per-file on
host CPU; records land in the no-pickle :mod:`records` format. MFA forced
alignment is an external tool in the reference (``mfa align``, invoked at
inference in ``GenerSpeech.py:55``!); here alignments are an *optional* input
(``durations`` per item) — models that need mel2ph read it when present.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Iterable, Mapping, Sequence

import jax.numpy as jnp
import numpy as np

from audiogpt_tpu.data.records import RecordDataset, RecordWriter
from audiogpt_tpu.dsp.f0 import continuous_lf0, cwt_lf0, estimate_f0, f0_to_coarse, norm_scale
from audiogpt_tpu.dsp.mel import MelSpec, NEURALSEQ_MEL_22K, log_mel
from audiogpt_tpu.text.encoder import TokenTextEncoder
from audiogpt_tpu.text.frontend import EnglishFrontend


@dataclasses.dataclass(frozen=True)
class BinarizeConfig:
    mel: MelSpec = NEURALSEQ_MEL_22K
    with_f0: bool = True
    with_f0cwt: bool = False
    with_energy: bool = False
    with_wav: bool = False
    #: store 256-d speaker + emotion embeddings from the built-in global
    #: style encoder (the reference's emotion binarizer runs external
    #: resemblyzer / emotion-encoder ckpts — data_gen/tts/emotion/)
    with_style_embed: bool = False
    #: store word-level fields (word_tokens/ph2word/mel2word) for
    #: PortaSpeech-class word-duration models (reference: word_set.json +
    #: ph2word in base_binarizer, tasks/tts/ps.py:21)
    with_words: bool = False
    #: additionally store the dense syntactic word graph [E, W, W] for
    #: SyntaSpeech (reference: Sentence2GraphParser at binarize time)
    with_graph: bool = False
    #: ordered wav pre-processor names applied before mel/f0 extraction
    #: (the reference's data_gen/tts/wav_processors stage; see
    #: :mod:`audiogpt_tpu.data.wav_processors`). Input wavs are assumed to
    #: already be at ``mel.sr`` unless 'resample' is included.
    wav_processors: tuple = ()
    f0_fmin: float = 80.0
    f0_fmax: float = 750.0
    valid_fraction: float = 0.05
    test_items: int = 0
    min_sec: float = 0.0
    max_sec: float = 60.0


@dataclasses.dataclass
class Item:
    """One utterance of raw input. ``text`` OR pre-phonemized ``phones`` must
    be given; ``durations`` (frames per phone) is the optional alignment."""

    name: str
    wav: np.ndarray            # [T] float32 at cfg.mel.sr
    text: str | None = None
    phones: Sequence[str] | None = None
    spk: str = "SPK1"
    durations: Sequence[int] | None = None
    #: MFA TextGrid — a path or the raw file text (reference
    #: base_binarizer.py:188 get_align); used when ``durations`` is absent
    textgrid: str | None = None
    #: emotion tag (reference ``EmotionBinarizer.item2emo`` default,
    #: base_binarizer_emotion.py:57) — consumed by :class:`EmotionBinarizer`
    emotion: str = "Neutral"


def mel2ph_from_durations(durations: Sequence[int], n_frames: int) -> np.ndarray:
    """Per-frame phone index (1-based; 0 = padding), the reference's
    ``mel2ph`` encoding (``data_gen_utils.get_mel2ph``)."""
    out = np.zeros(n_frames, np.int32)
    t = 0
    for i, d in enumerate(durations, start=1):
        out[t:t + int(d)] = i
        t += int(d)
    return out


class TTSBinarizer:
    """Drive with ``binarize(items, out_dir)``; reload shards with
    :func:`load_split`."""

    def __init__(self, cfg: BinarizeConfig | None = None,
                 frontend: EnglishFrontend | None = None,
                 style_encoder=None, style_params=None):
        self.cfg = cfg or BinarizeConfig()
        self.frontend = frontend or EnglishFrontend()
        self._word_encoder: TokenTextEncoder | None = None
        self._style = None
        if self.cfg.with_style_embed:
            import jax
            from audiogpt_tpu.models.tts.generspeech import GlobalStyleEncoder

            enc = style_encoder or GlobalStyleEncoder()
            if style_params is None:
                style_params = enc.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, 16, self.cfg.mel.n_mels)))
            fn = jax.jit(lambda p, m: enc.apply(p, m))
            self._style = (fn, style_params)

    # -- vocab ---------------------------------------------------------------
    def build_vocabs(self, items: Iterable[Item]) -> tuple[TokenTextEncoder, dict]:
        phones: set[str] = set()
        spks: set[str] = set()
        for it in items:
            phones.update(self._phones_of(it))
            spks.add(it.spk)
        enc = EnglishFrontend.build_phone_vocab(sorted(phones))
        spk_map = {s: i for i, s in enumerate(sorted(spks))}
        return enc, spk_map

    def _phones_of(self, it: Item) -> list[str]:
        if it.phones is not None:
            return list(it.phones)
        if it.text is None:
            raise ValueError(f"item {it.name}: need text or phones")
        return self.frontend(it.text).phones

    # -- per-item ------------------------------------------------------------
    def process_item(self, it: Item, enc: TokenTextEncoder,
                     spk_map: Mapping[str, int]) -> dict[str, Any] | None:
        cfg = self.cfg
        sec = len(it.wav) / cfg.mel.sr
        if not (cfg.min_sec <= sec <= cfg.max_sec):
            return None
        phones = self._phones_of(it)
        tokens = np.asarray(enc.encode(phones), np.int32)

        wav = np.asarray(it.wav, np.float32)
        if cfg.wav_processors:
            from audiogpt_tpu.data.wav_processors import apply_processors

            wav, _sr = apply_processors(
                cfg.wav_processors, wav, cfg.mel.sr,
                options={"resample": {"target_sr": cfg.mel.sr}})
            wav = np.asarray(wav, np.float32)
        mel = np.asarray(log_mel(jnp.asarray(wav), cfg.mel))  # [T, n_mels]
        rec: dict[str, Any] = {
            "item_name": it.name,
            "txt": it.text or " ".join(phones),
            "ph": " ".join(phones),
            "tokens": tokens,
            "mel": mel.astype(np.float32),
            "spk_id": int(spk_map.get(it.spk, 0)),
            "len": int(mel.shape[0]),
            "sec": float(sec),
        }
        if cfg.with_f0:
            f0, uv = estimate_f0(
                jnp.asarray(wav), sr=cfg.mel.sr, hop=cfg.mel.hop,
                fmin=cfg.f0_fmin, fmax=cfg.f0_fmax)
            f0 = np.asarray(f0)[: mel.shape[0]]
            f0 = np.pad(f0, (0, mel.shape[0] - len(f0)))
            rec["f0"] = f0.astype(np.float32)
            rec["pitch"] = f0_to_coarse(f0)
            if cfg.with_f0cwt and (f0 > 0).any():
                uv_, lf0 = continuous_lf0(f0)
                lf0_norm = (lf0 - lf0[uv_ > 0].mean()) / max(lf0[uv_ > 0].std(), 1e-8)
                W, _scales = cwt_lf0(lf0_norm)
                Wn, _, _ = norm_scale(W)
                rec["cwt_spec"] = Wn.astype(np.float32)
                rec["f0_mean"] = float(lf0[uv_ > 0].mean())
                rec["f0_std"] = float(lf0[uv_ > 0].std())
        if cfg.with_energy:
            # frame energy = RMS of the linear-domain mel frame — the
            # quantity FastSpeech2's energy adaptor consumes (fs2.py energy).
            # our log-mel is log10-domain, so linear = 10**mel
            rec["energy"] = np.sqrt(
                ((10.0 ** mel.astype(np.float64)) ** 2).mean(-1)
            ).astype(np.float32)
        if it.durations is not None:
            rec["mel2ph"] = mel2ph_from_durations(it.durations, mel.shape[0])
        elif it.textgrid is not None:
            import os

            from audiogpt_tpu.data.textgrid import mel2ph_from_textgrid

            tg_text = it.textgrid
            if "\n" not in tg_text and os.path.exists(tg_text):
                with open(tg_text) as f:
                    tg_text = f.read()
            mel2ph, dur = mel2ph_from_textgrid(
                tg_text, phones, mel.shape[0], cfg.mel.sr, cfg.mel.hop)
            rec["mel2ph"] = mel2ph
            rec["dur"] = dur
        if cfg.with_wav:
            rec["wav"] = wav
        if self._style is not None:
            fn, sp = self._style
            spk_e, emo_e = fn(sp, jnp.asarray(mel[None]))
            rec["spk_embed"] = np.asarray(spk_e)[0]
            rec["emo_embed"] = np.asarray(emo_e)[0]
        if (cfg.with_words or cfg.with_graph) and it.text is not None \
                and self._word_encoder is not None:
            pt = self.frontend(it.text)
            words = list(pt.words)
            p2w = np.asarray(pt.ph2word, np.int32)
            if pt.phones and pt.phones[0] == "<BOS>":
                # the frontend maps <BOS>→word 0 and <EOS>→len(words)+1;
                # make them real words (the reference's word lists carry
                # <BOS>/<EOS> too, syntactic_graph_buider.py:33)
                words = ["<BOS>"] + words + ["<EOS>"]
                p2w = p2w + 1
            rec["word_tokens"] = np.asarray(
                self._word_encoder.encode(words), np.int32)
            rec["ph2word"] = p2w[: len(tokens)]
            if "mel2ph" in rec:
                ph2w = np.concatenate([[0], rec["ph2word"]])  # 0 = padding
                rec["mel2word"] = ph2w[rec["mel2ph"]].astype(np.int32)
            if cfg.with_graph:
                from audiogpt_tpu.text.syntax import build_word_graph

                rec["graph_adj"] = build_word_graph(words)
        return rec

    # -- driver --------------------------------------------------------------
    def binarize(self, items: Sequence[Item], out_dir: str) -> dict[str, int]:
        """Split train/valid/test, write shards + sidecars; returns counts."""
        cfg = self.cfg
        os.makedirs(out_dir, exist_ok=True)
        enc, spk_map = self.build_vocabs(items)
        enc.save(os.path.join(out_dir, "phone_set.json"))
        with open(os.path.join(out_dir, "spk_map.json"), "w") as f:
            json.dump(spk_map, f)
        if cfg.with_words or cfg.with_graph:
            words: set[str] = {"<BOS>", "<EOS>"}
            for it in items:
                if it.text is not None:
                    words.update(self.frontend(it.text).words)
            self._word_encoder = TokenTextEncoder(sorted(words))
            self._word_encoder.save(os.path.join(out_dir, "word_set.json"))

        n_test = cfg.test_items
        n_valid = max(1, int(len(items) * cfg.valid_fraction)) if len(items) > 1 else 0
        splits = {
            "test": items[:n_test],
            "valid": items[n_test:n_test + n_valid],
            "train": items[n_test + n_valid:],
        }
        counts = {}
        for split, split_items in splits.items():
            writer = RecordWriter(os.path.join(out_dir, split))
            lengths, f0s = [], []
            for it in split_items:
                rec = self.process_item(it, enc, spk_map)
                if rec is None:
                    continue
                writer.add(rec)
                lengths.append(rec["len"])
                if "f0" in rec:
                    f0s.append(rec["f0"])
            writer.finalize()
            counts[split] = len(lengths)
            np.save(os.path.join(out_dir, f"{split}_lengths.npy"),
                    np.asarray(lengths, np.int64))
            if f0s and split == "train":
                cat = np.concatenate(f0s)
                voiced = cat[cat > 0]
                stats = [float(voiced.mean()), float(voiced.std())] \
                    if voiced.size else [0.0, 1.0]
                np.save(os.path.join(out_dir, "train_f0s_mean_std.npy"),
                        np.asarray(stats))
        return counts


def load_split(out_dir: str, split: str) -> RecordDataset:
    return RecordDataset(os.path.join(out_dir, split))


def load_phone_encoder(out_dir: str) -> TokenTextEncoder:
    return TokenTextEncoder.from_file(os.path.join(out_dir, "phone_set.json"))


@dataclasses.dataclass
class SVSItem:
    """One scored singing utterance (opencpop transcription format:
    pinyin words, '|'-windowed note names and note durations in seconds)."""

    name: str
    wav: np.ndarray
    text: str                  # pinyin words, e.g. "xiao jiu wo SP"
    notes: str                 # "C#4/Db4 | F#4/Gb4 | rest"
    notes_duration: str        # "0.407 | 0.376 | 0.2"
    spk: str = "SPK1"


class SVSBinarizer(TTSBinarizer):
    """Score-annotated singing → records with the MIDI conditioning fields
    DiffSinger-MIDI trains on (``pitch_midi``/``midi_dur``/``is_slur``,
    consumed at ``tasks/svs/diffsinger_task.py:30`` and
    ``modules/diffsinger_midi/fs2.py:46``). The reference ships NO SVS
    binarizer at all — its tasks read pre-binarized opencpop shards whose
    producer is absent from the tree; this closes the loop natively using
    the same score grammar as inference (``base_svs_infer.py:72-140``)."""

    def _phones_of(self, it) -> list[str]:
        if not hasattr(it, "notes"):       # plain Item (internal re-entry)
            return super()._phones_of(it)
        from audiogpt_tpu.engines.svs import parse_score

        return parse_score(it.text, it.notes, it.notes_duration)[0]

    def process_item(self, it, enc: TokenTextEncoder,
                     spk_map: Mapping[str, int]) -> dict[str, Any] | None:
        from audiogpt_tpu.engines.svs import note_to_midi, parse_score

        base = Item(name=it.name, wav=it.wav, phones=self._phones_of(it),
                    spk=it.spk)
        rec = super().process_item(base, enc, spk_map)
        if rec is None:
            return None
        phs, notes, durs, slur, ph2word = parse_score(
            it.text, it.notes, it.notes_duration)
        rec["txt"] = it.text
        rec["pitch_midi"] = np.asarray([note_to_midi(n) for n in notes],
                                       np.int32)
        rec["midi_dur"] = np.asarray([float(d) for d in durs], np.float32)
        rec["is_slur"] = np.asarray(slur, np.int32)
        rec["ph2word"] = np.asarray(ph2word, np.int32)
        # frame alignment from the score: each word's base note duration is
        # split evenly over its non-slur phones; slur repeats keep their own
        # note duration (score time, not phone time — opencpop's separate
        # phone-duration annotations would override this when available)
        sec = np.asarray([float(d) for d in durs], np.float64)
        w = np.asarray(ph2word)
        base_cnt = np.zeros(w.max() + 1, np.int64)
        s = np.asarray(slur)
        np.add.at(base_cnt, w[s == 0], 1)
        share = np.where(s == 0, sec / np.maximum(base_cnt[w], 1), sec)
        frames = np.round(share * self.cfg.mel.sr /
                          self.cfg.mel.hop).astype(np.int64)
        rec["mel2ph"] = mel2ph_from_durations(frames, rec["mel"].shape[0])
        return rec


def load_word_encoder(out_dir: str) -> TokenTextEncoder:
    """Word vocab written by ``with_words``/``with_graph`` binarization
    (reference: ``word_set.json``, tasks/tts/ps.py:21)."""
    return TokenTextEncoder.from_file(os.path.join(out_dir, "word_set.json"))


class EmotionBinarizer(TTSBinarizer):
    """Emotion-tagged binarization — the GenerSpeech data path.

    Reference ``EmotionBinarizer`` (``data_gen/tts/base_binarizer_emotion.py:
    28``): items carry an emotion label (default "Neutral"), a sorted
    ``emo_map.json`` maps label → id, and each record stores the categorical
    ``emo_id`` next to the speaker id. The reference additionally runs two
    external embedding nets (resemblyzer speaker + emotion-encoder ckpts);
    here those are the built-in global style encoder — turn on
    ``with_style_embed`` to store ``spk_embed``/``emo_embed`` (the
    substitution documented at ``models/tts/generspeech.py:19-21``)."""

    def __init__(self, cfg: BinarizeConfig | None = None, **kw):
        cfg = cfg or BinarizeConfig(with_style_embed=True)
        super().__init__(cfg, **kw)
        self._emo_map: dict[str, int] = {}

    def build_emo_map(self, items: Iterable[Item]) -> dict[str, int]:
        emos = sorted({getattr(it, "emotion", "Neutral") for it in items})
        return {e: i for i, e in enumerate(emos)}

    def process_item(self, it, enc, spk_map):
        rec = super().process_item(it, enc, spk_map)
        if rec is not None:
            rec["emo_id"] = int(self._emo_map.get(
                getattr(it, "emotion", "Neutral"), 0))
        return rec

    def binarize(self, items: Sequence[Item], out_dir: str) -> dict[str, int]:
        os.makedirs(out_dir, exist_ok=True)
        self._emo_map = self.build_emo_map(items)
        with open(os.path.join(out_dir, "emo_map.json"), "w") as f:
            json.dump(self._emo_map, f)
        return super().binarize(items, out_dir)


def load_emo_map(out_dir: str) -> dict[str, int]:
    with open(os.path.join(out_dir, "emo_map.json")) as f:
        return json.load(f)


class ZhBinarizer(TTSBinarizer):
    """Chinese binarization with the reference's duration post-processing
    (``data_gen/tts/binarizer_zh.py:12 ZhBinarizer.get_align``):

      1. separator/punctuation phones donate their leading VOICED frames to
         the preceding final (韵母) — pauses start where voicing stops — and
         collapse into it entirely when what remains is below a threshold;
      2. an initial (声母) and its following final split their combined
         duration evenly.

    Phones come from :class:`audiogpt_tpu.text.zh.ZhTTSFrontend` (initials
    list = ``text/zh.py INITIALS``, the counterpart of the reference's
    ``ALL_SHENMU``)."""

    #: rule-1 collapse threshold in frames (reference uses a hard 100,
    #: binarizer_zh.py:33)
    min_sep_frames: int = 100

    def __init__(self, cfg: BinarizeConfig | None = None, frontend=None, **kw):
        if frontend is None:
            from audiogpt_tpu.text.zh import ZhTTSFrontend

            frontend = ZhTTSFrontend()
        super().__init__(cfg, frontend=frontend, **kw)

    def _fix_durations(self, dur: np.ndarray, phones: Sequence[str],
                       f0: np.ndarray) -> np.ndarray:
        from audiogpt_tpu.text.zh import INITIALS

        dur = np.asarray(dur, np.int64).copy()
        initials = set(INITIALS)
        # rule 1: separators give leading voiced frames back to the final
        ends = np.cumsum(dur)
        starts = ends - dur
        for i, p in enumerate(phones):
            if i == 0 or p[0] == "<" or p[0].isalnum():
                continue
            seg = f0[starts[i]:ends[i]]
            j = 0
            while j < len(seg) and seg[j] != 0:
                j += 1
            dur[i - 1] += j
            dur[i] -= j
            if dur[i] < self.min_sep_frames:
                dur[i - 1] += dur[i]
                dur[i] = 0
        # rule 2: initial + following final share their total evenly
        for i, p in enumerate(phones[:-1]):
            if p in initials and dur[i] > 0:
                nxt = phones[i + 1]
                if nxt[0].isalpha() and nxt not in initials:
                    total = dur[i] + dur[i + 1]
                    dur[i] = total // 2
                    dur[i + 1] = total - dur[i]
        return dur

    def process_item(self, it, enc, spk_map):
        rec = super().process_item(it, enc, spk_map)
        if rec is None or "mel2ph" not in rec or "f0" not in rec:
            return rec
        phones = rec["ph"].split(" ")
        dur = rec.get("dur")
        if dur is None:
            dur = np.bincount(rec["mel2ph"],
                              minlength=len(phones) + 1)[1:len(phones) + 1]
        dur = self._fix_durations(np.asarray(dur), phones, rec["f0"])
        rec["dur"] = dur.astype(np.int32)
        rec["mel2ph"] = mel2ph_from_durations(dur, rec["mel"].shape[0])
        return rec


def items_from_csv(csv_path: str, wav_loader=None, sr: int = 22050,
                   textgrid_dir: str | None = None) -> list[Item]:
    """Reference metadata layout → :class:`Item` list.

    ``metadata_phone.csv`` columns (base_binarizer_emotion.py:44-57):
    ``item_name, txt, ph, wav_fn[, spk_name][, others]`` where ``others``
    is the emotion tag; TextGrids live at ``{textgrid_dir}/{item}.TextGrid``.
    ``wav_loader(path) -> np.ndarray`` defaults to the in-repo wav reader.
    """
    import csv

    if wav_loader is None:
        from audiogpt_tpu.utils.audio_io import load_wav

        def wav_loader(p):
            wav, _ = load_wav(p, sr=sr)
            return wav

    items: list[Item] = []
    with open(csv_path, newline="", encoding="utf-8") as f:
        for row in csv.DictReader(f):
            name = row["item_name"]
            tg = None
            if textgrid_dir is not None:
                cand = os.path.join(textgrid_dir, f"{name}.TextGrid")
                tg = cand if os.path.exists(cand) else None
            items.append(Item(
                name=name,
                wav=np.asarray(wav_loader(row["wav_fn"]), np.float32),
                text=row.get("txt") or None,
                phones=(row["ph"].split(" ") if row.get("ph") else None),
                spk=row.get("spk_name") or "SPK1",
                emotion=(row.get("others") or "Neutral").strip('"'),
                textgrid=tg))
    return items
