"""ASR engine: waveform → text (robust whisper decoding).

Mirrors the reference's ASR tool behavior (``audio-chatgpt.py:560-577``:
``whisper.decode(model, mel, DecodingOptions())`` + the ``transcribe()``
seek loop): load → pad/trim to 30 s → log-mel → decode with the reference's
robustness machinery — non-speech/blank token suppression, no-speech
detection, and temperature fallback on low-logprob / high-compression
decodes (openai-whisper ``DecodingTask`` + ``transcribe.py`` semantics).
All compute after the numpy boundary is one jit program (encoder + prime +
scan-decode with static suppression masks) per batch-shape bucket;
temperature is traced, so the fallback ladder re-dispatches the SAME
compiled program.
"""

from __future__ import annotations

import zlib

import numpy as np
import jax
import jax.numpy as jnp

from audiogpt_tpu.registry import ENGINES
from audiogpt_tpu.engines.base import Engine
from audiogpt_tpu.models.asr import (
    WhisperConfig,
    WhisperModel,
    decode,
    whisper_log_mel,
)

# whisper-multilingual special tokens (vocab 51865)
SOT = 50258
EOT = 50257
TASK_TRANSCRIBE = 50359
TASK_TRANSLATE = 50358
NO_TIMESTAMPS = 50363
NO_SPEECH = 50362
SOT_PREV = 50361
LANG_BASE = 50259       # + language index (en=0, zh=1, ...)
N_LANGS = 99            # languages in the multilingual token block
TIMESTAMP_BEGIN = NO_TIMESTAMPS + 1   # <|0.00|>
TS_PRECISION = 0.02     # seconds per timestamp tick (whisper: 2 frames)


def compression_ratio(text: str) -> float:
    """whisper's degenerate-repetition statistic (``utils.py
    compression_ratio``): UTF-8 length over zlib-compressed length — looping
    output compresses absurdly well."""
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def dedup_join(texts: list[str], max_overlap_words: int = 8) -> str:
    """Join per-window transcripts, deduplicating the seam: consecutive
    windows overlap by a halo (see :meth:`ASREngine.transcribe`), so a word
    straddling a window boundary appears at the END of one window and the
    START of the next — drop the longest case-insensitive suffix/prefix
    word match (the reference's seek loop avoids the seam instead by
    re-seeking to the last complete segment; a sample halo + join-time dedup
    keeps the windows batchable as ONE program)."""
    out: list[str] = []
    for t in texts:
        words = t.split()
        if out and words:
            k = min(max_overlap_words, len(out), len(words))
            for j in range(k, 0, -1):
                if [w.lower() for w in out[-j:]] == \
                        [w.lower() for w in words[:j]]:
                    words = words[j:]
                    break
        out.extend(words)
    return " ".join(out)


def pad_or_trim(wav: np.ndarray, n_samples: int) -> np.ndarray:
    wav = np.asarray(wav, np.float32)
    if wav.shape[-1] >= n_samples:
        return wav[..., :n_samples]
    width = [(0, 0)] * (wav.ndim - 1) + [(0, n_samples - wav.shape[-1])]
    return np.pad(wav, width)


@ENGINES.register("asr")
class ASREngine(Engine):
    name = "asr"

    def __init__(self, cfg: WhisperConfig | None = None, params=None,
                 max_tokens: int = 224, rng_seed: int = 0, vocab=None,
                 temperatures=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
                 compression_ratio_threshold: float | None = 2.4,
                 logprob_threshold: float | None = -1.0,
                 no_speech_threshold: float | None = 0.6,
                 halo_sec: float = 1.0, bf16: bool = False):
        """``temperatures``/thresholds are the reference's ``transcribe()``
        defaults (openai-whisper): the t=0 decode is retried at rising
        temperatures while its compression ratio exceeds 2.4 (degenerate
        repetition) or its mean logprob is under −1; a window whose
        no-speech probability beats 0.6 AND fails the logprob bar returns
        "". NOTE: with random (untrained) weights every decode fails the
        logprob bar by construction (~−log V) — pass ``temperatures=(0.0,)``
        for deterministic single-pass decoding in benches/smoke tests.
        ``halo_sec``: overlap between the >30 s batched windows (seam words
        are recovered by :func:`dedup_join`).

        ``bf16``: opt-in throughput mode — the param tree is cast to
        bfloat16 ONCE at construction (``params`` stays f32 for parity /
        checkpointing, the setter keeps the dispatch copy in sync, same
        contract as ``VocoderEngine(bf16=True)``). The roofline says the
        decode scan is weight-streaming-bound (47 % of program bytes at
        10 % of flops, AI 8.7, BASELINE.md): bf16 halves exactly those
        per-token weight bytes. I/O and logits stay f32 via promotion."""
        super().__init__()
        self.cfg = cfg or WhisperConfig()
        self.model = WhisperModel(self.cfg)
        self.max_tokens = max_tokens
        self.temperatures = tuple(temperatures)
        self.compression_ratio_threshold = compression_ratio_threshold
        self.logprob_threshold = logprob_threshold
        self.no_speech_threshold = no_speech_threshold
        self.halo_sec = halo_sec
        self.bf16 = bf16
        self._warned_no_vocab = False
        self._filters_cache = None
        self._base_rng = jax.random.PRNGKey(rng_seed + 1)
        if params is None:
            mel = jnp.zeros((1, 2 * self.cfg.n_audio_ctx, self.cfg.n_mels))
            toks = jnp.zeros((1, 4), jnp.int32)
            params = self.model.init(jax.random.PRNGKey(rng_seed), mel, toks)
        self.params = params
        if vocab is not None:
            self.set_vocab(vocab)
        else:
            # out-of-box default: decode through the bundled derived codec
            # (CLIP BPE data — the one published tokenizer artifact in-tree)
            # so `transcribe` returns TEXT, not token-id strings. Ids do NOT
            # match OpenAI's whisper ranks: a model trained in this framework
            # with this codec is coherent; imported openai/HF whisper weights
            # need the matching ranks via set_vocab/--vocab (the torch
            # importer warns — utils/torch_import.py whisper family).
            try:
                from audiogpt_tpu.text.bpe import (WhisperDetokenizer,
                                                   load_clip_bpe)

                self.text_decoder = WhisperDetokenizer(load_clip_bpe(),
                                                       eot=EOT)
                self.text_decoder.derived = True
            except FileNotFoundError:
                pass  # no bundled data: raw token-id strings + warning

    @property
    def params(self):
        return self._params

    @params.setter
    def params(self, p):
        # masters stay f32; the bf16 dispatch copy is cast ONCE here (an
        # in-program cast would re-read the f32 tree every dispatch and
        # halve nothing — see VocoderEngine)
        self._params = p
        if self.bf16:
            self._run_params = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, p)
        else:
            self._run_params = p

    def set_vocab(self, vocab) -> None:
        """Wire a whisper BPE vocab so ``transcribe`` returns TEXT. ``vocab``
        is a path (ckpt/tokenizer dir, ``tokenizer.json``, ``vocab.json`` or
        ``*.tiktoken`` ranks file — `text/bpe.py load_bpe_dir`) or an
        already-built codec / ``tokens -> str`` callable."""
        from audiogpt_tpu.text.bpe import ByteBPE, WhisperDetokenizer, load_bpe_dir

        if isinstance(vocab, str):
            vocab = load_bpe_dir(vocab)
        if isinstance(vocab, ByteBPE):
            vocab = WhisperDetokenizer(vocab, eot=EOT)
        self.text_decoder = vocab
        self._filters_cache = None  # suppression ids are vocab-dependent

    def warmup(self, batch_sizes=(1,)) -> None:
        """AOT-compile the encoder+scan-decode program for each batch rung so
        serving requests never wait on a cold compile (see
        :meth:`engines.tts.TTSEngine.warmup`)."""
        for nb in batch_sizes:
            self.transcribe_tokens(np.zeros((int(nb), self.cfg.n_samples),
                                            np.float32))

    def sot_sequence(self, task: str = "translate", language: int = 0,
                     timestamps: bool = False) -> list[int]:
        """The reference uses whisper's translate task (audio-chatgpt.py:1296).
        In timestamp mode ``<|notimestamps|>`` is dropped — whisper
        ``DecodingOptions()`` defaults ``without_timestamps=False``."""
        task_tok = TASK_TRANSLATE if task == "translate" else TASK_TRANSCRIBE
        seq = [SOT, LANG_BASE + language, task_tok]
        if not timestamps:
            seq.append(NO_TIMESTAMPS)
        return seq

    def _prompts(self, batch: int, task: str, language,
                 timestamps: bool = False) -> np.ndarray:
        """SOT prompts [B, P]; ``language`` an int (shared) or a per-row
        array (mixed-language batches from auto-detection)."""
        langs = np.broadcast_to(np.asarray(language, np.int32), (batch,))
        rows = [self.sot_sequence(task, int(l), timestamps) for l in langs]
        return np.asarray(rows, np.int32)

    @property
    def supports_lang_detect(self) -> bool:
        """The language-token block exists in this vocab (tiny test configs
        shrink n_vocab below it — detection silently degrades to the fixed
        default language there)."""
        return self.cfg.n_vocab >= LANG_BASE + N_LANGS

    @property
    def supports_timestamps(self) -> bool:
        return self.cfg.n_vocab > TIMESTAMP_BEGIN

    @property
    def eot(self) -> int:
        return EOT if self.cfg.n_vocab > EOT else self.cfg.n_vocab - 1

    @property
    def _filters(self):
        """(suppress_ids, suppress_gte, blank_ids, no_speech_id) — the
        static logit-filter spec (openai-whisper ``SuppressTokens`` /
        ``SuppressBlank`` / no-speech detection), computed against the wired
        codec and cached until ``set_vocab`` changes it."""
        if self._filters_cache is None:
            eot = self.eot
            codec = getattr(getattr(self, "text_decoder", None), "codec",
                            None)
            sup: tuple = ()
            blanks = [eot]
            if codec is not None:
                from audiogpt_tpu.text.bpe import non_speech_ids

                sup = tuple(i for i in non_speech_ids(codec)
                            if i < self.cfg.n_vocab)
                space = codec.encode(" ")
                if len(space) == 1:
                    blanks.append(int(space[0]))
            gte = eot + 1 if self.cfg.n_vocab > eot + 1 else None
            nsid = NO_SPEECH if self.cfg.n_vocab > NO_SPEECH else None
            self._filters_cache = (sup, gte, tuple(blanks), nsid)
        return self._filters_cache

    def _decode_stats(self, wav: np.ndarray, task: str = "translate",
                      language=0, temperature: float = 0.0,
                      attempt: int = 0, timestamps: bool = False):
        """wav [B, T] @16 kHz → (tokens [B, P+max_tokens], avg_logprob [B],
        no_speech_prob [B], lang_probs [B, N_LANGS]) through ONE compiled
        program with the static suppression masks applied in-scan.
        ``language``: int or per-row array. When the vocab carries the
        language block, lang_probs (softmax at the SOT position — whisper
        ``detect_language``) rides along for free."""
        wav = pad_or_trim(wav, self.cfg.n_samples)
        mel = whisper_log_mel(jnp.asarray(wav), self.cfg.n_mels)
        prompt = jnp.asarray(self._prompts(wav.shape[0], task, language,
                                           timestamps))
        sup, gte, blanks, nsid = self._filters
        lang_range = ((LANG_BASE, N_LANGS) if self.supports_lang_detect
                      else None)
        if timestamps and not self.supports_timestamps:
            raise ValueError(
                f"timestamp decode needs n_vocab > {TIMESTAMP_BEGIN} "
                f"(got {self.cfg.n_vocab})")
        toks, avg_lp, ns, lp = decode(
            self.model, self._run_params, mel, prompt,
            max_tokens=self.max_tokens, eot_id=self.eot,
            suppress=sup, suppress_gte=gte, blank_ids=blanks,
            no_speech_id=nsid, temperature=temperature,
            rng=jax.random.fold_in(self._base_rng, attempt),
            lang_range=lang_range, timestamps=timestamps,
            timestamp_begin=TIMESTAMP_BEGIN if timestamps else None,
        )
        return (np.asarray(toks), np.asarray(avg_lp), np.asarray(ns),
                np.asarray(lp))

    def detect_language(self, wav: np.ndarray):
        """→ (language index [B], probs [B, N_LANGS]) — whisper's
        ``detect_language``: one forward at the SOT position, softmax over
        the 99 language tokens (the reference runs it before every decode,
        ``audio-chatgpt.py:570-571``). Rides the same compiled decode
        program as ``transcribe`` (the block softmax is computed in every
        dispatch), so this never adds a compile."""
        if not self.supports_lang_detect:
            raise ValueError(
                f"language detection needs n_vocab >= {LANG_BASE + N_LANGS} "
                f"(got {self.cfg.n_vocab})")
        if wav.ndim == 1:
            wav = wav[None]
        probs = self._decode_stats(wav)[3]
        return probs.argmax(-1), probs

    def transcribe_tokens(self, wav: np.ndarray, task: str = "translate",
                          language: int = 0) -> np.ndarray:
        """wav [T] or [B, T] @16 kHz → token ids [B, P+max_tokens]
        (deterministic t=0 decode with suppression)."""
        if wav.ndim == 1:
            wav = wav[None]
        return self._decode_stats(wav, task, language)[0]

    def _tokens_to_text(self, toks, task: str, language: int = 0,
                        timestamps: bool = False) -> str:
        dec = getattr(self, "text_decoder", None)
        prompt_len = len(self.sot_sequence(task, 0, timestamps))
        body = [int(t) for t in toks[prompt_len:] if int(t) < EOT]
        if dec is not None:
            return dec(body)
        if not self._warned_no_vocab:
            self._warned_no_vocab = True
            from audiogpt_tpu.text.bpe import warn_fallback

            warn_fallback("ASREngine",
                          "no whisper vocab wired (set_vocab/--vocab): "
                          "emitting raw token-id strings")
        return " ".join(str(t) for t in body)

    def _parse_segments(self, toks, task: str) -> list:
        """Timestamp-mode token row → [(start_s, end_s | None, text)].
        Sequence shape (whisper ``transcribe()``):
        ``<|t0|> text <|t1|><|t1'|> text <|t2|> … [<|tk|>] <eot>`` — a lone
        trailing timestamp before EOT leaves the last segment's end open
        (None → caller substitutes the window end)."""
        prompt_len = len(self.sot_sequence(task, 0, timestamps=True))
        segs: list = []
        start: float | None = None
        text_toks: list[int] = []
        for t in toks[prompt_len:]:
            t = int(t)
            if t == self.eot:
                break
            if t >= TIMESTAMP_BEGIN:
                tick = (t - TIMESTAMP_BEGIN) * TS_PRECISION
                if text_toks and start is not None:
                    segs.append((start, tick, self._detok(text_toks)))
                    text_toks, start = [], None
                else:
                    start = tick  # (re-)opening tick; latest wins
            elif t < EOT:
                text_toks.append(t)
        if text_toks and start is not None:
            segs.append((start, None, self._detok(text_toks)))
        return [s for s in segs if s[2].strip()]

    def _detok(self, ids: list[int]) -> str:
        dec = getattr(self, "text_decoder", None)
        if dec is not None:
            return dec(ids)
        return " ".join(str(t) for t in ids)

    def _needs_fallback(self, text: str, avg_lp: float) -> bool:
        """whisper ``transcribe.py decode_with_fallback``: retry at a higher
        temperature when the decode looks degenerate (compresses too well)
        or under-confident (mean logprob below the bar)."""
        if (self.compression_ratio_threshold is not None
                and compression_ratio(text) > self.compression_ratio_threshold):
            return True
        if (self.logprob_threshold is not None
                and avg_lp < self.logprob_threshold):
            return True
        return False

    def _finalize(self, text: str, avg_lp: float, ns_prob: float) -> str:
        """whisper's no-speech skip: a window that looks like silence AND
        failed the confidence bar contributes no text."""
        if self.no_speech_threshold is not None \
                and ns_prob > self.no_speech_threshold:
            if self.logprob_threshold is None \
                    or avg_lp < self.logprob_threshold:
                return ""
        return text

    def _robust_decode(self, stack: np.ndarray, task: str,
                       language, timestamps: bool = False):
        """Temperature-fallback decode of ``stack [n, T]``: every pending
        row rides one batched dispatch per ladder rung (dyadic-padded, so
        each retry reuses an already-compiled bucket program); rows that
        pass the quality checks drop out of the ladder.

        ``language=None`` → auto-detect (whisper default,
        ``audio-chatgpt.py:570-572``): the first rung's dispatch carries the
        language-block softmax for free; rows whose detected language
        differs from the assumed default are re-dispatched ONCE through the
        same compiled program with the detected token in their SOT row —
        all-default batches pay nothing extra.

        Returns ``(texts [n], toks [n] rows, gated [n] bool)`` — ``gated``
        marks windows the no-speech gate silenced."""
        n = stack.shape[0]
        auto = language is None and self.supports_lang_detect
        langs = np.zeros((n,), np.int32) if language is None \
            else np.broadcast_to(np.asarray(language, np.int32), (n,)).copy()
        texts = [""] * n
        rows = [None] * n
        stats = [(0.0, 0.0)] * n
        pending = list(range(n))
        for attempt, t in enumerate(self.temperatures):
            nb = 1
            while nb < len(pending):
                nb *= 2
            sub = np.zeros((nb, stack.shape[1]), np.float32)
            sublang = np.zeros((nb,), np.int32)
            for r, pi in enumerate(pending):
                sub[r] = stack[pi]
                sublang[r] = langs[pi]
            toks, avg_lp, ns, lp = self._decode_stats(
                sub, task, sublang, temperature=float(t), attempt=attempt,
                timestamps=timestamps)
            if auto and attempt == 0:
                det = lp[: len(pending)].argmax(-1).astype(np.int32)
                if np.any(det != sublang[: len(pending)]):
                    for r, pi in enumerate(pending):
                        langs[pi] = det[r]
                    sublang[: len(pending)] = det
                    toks, avg_lp, ns, lp = self._decode_stats(
                        sub, task, sublang, temperature=float(t),
                        attempt=attempt, timestamps=timestamps)
                auto = False  # position-0 logits are language-invariant
            retry = []
            for r, pi in enumerate(pending):
                texts[pi] = self._tokens_to_text(toks[r], task,
                                                 timestamps=timestamps)
                rows[pi] = toks[r]
                stats[pi] = (float(avg_lp[r]), float(ns[r]))
                if self._needs_fallback(texts[pi], float(avg_lp[r])):
                    retry.append(pi)
            pending = retry
            if not pending:
                break
        gated = [self._finalize("x", *stats[i]) == "" for i in range(n)]
        return ([("" if gated[i] else texts[i]) for i in range(n)],
                rows, gated)

    def _windows(self, wav: np.ndarray):
        """wav [T] → (stack [n, n_samples], offsets_s [n], halo_s). Audio
        longer than whisper's 30 s receptive field becomes overlapping
        windows (``halo_sec`` shared per seam) batched into ONE program."""
        n = self.cfg.n_samples
        sr = self.cfg.sample_rate
        if wav.shape[-1] <= n:
            return pad_or_trim(wav[None], n), [0.0], 0.0
        halo = min(int(self.halo_sec * sr), n // 4)
        stride = n - halo
        wins, offs, i = [], [], 0
        while True:
            wins.append(wav[i: i + n])
            offs.append(i / sr)
            if i + n >= wav.shape[-1]:
                break
            i += stride
        stack = np.zeros((len(wins), n), np.float32)
        for r, w in enumerate(wins):
            stack[r, : len(w)] = w
        return stack, offs, halo / sr

    def transcribe(self, wav: np.ndarray, task: str = "translate",
                   language: int | None = None,
                   return_segments: bool = False):
        """→ text (or ``[(start_s, end_s, text), …]`` with
        ``return_segments=True`` — whisper's timestamp-token decode mode,
        the reference ``transcribe()`` default at ``audio-chatgpt.py:575``).
        Uses ``self.text_decoder`` (a ``tokens -> str`` callable; by default
        the bundled derived codec, so text comes out of the box — wire
        OpenAI's ranks via ``set_vocab`` for imported whisper weights).
        ``language=None`` auto-detects (whisper default; fixed index pins
        it, tiny vocabs without the language block fall back to en).

        Audio longer than whisper's 30 s receptive field is transcribed in
        overlapping windows (``halo_sec`` of shared samples per seam)
        decoded as ONE batched program (the reference's ``transcribe()``
        seek loop — ``whisper/transcribe.py`` — runs windows sequentially
        and re-seeks to the last complete segment). Seam join strategies:
        plain-text mode recovers straddling words via :func:`dedup_join`;
        segment mode partitions by segment midpoint — window k owns
        midpoints in ``[off_k + halo, off_{k+1} + halo)``, so every instant
        has exactly one owner and times stay monotonic."""
        wav = np.asarray(wav, np.float32)
        if wav.ndim != 1:
            wav = wav.reshape(-1)
        stack, offs, halo = self._windows(wav)
        texts, rows, gated = self._robust_decode(
            stack, task, language, timestamps=return_segments)
        if not return_segments:
            return dedup_join([t.strip() for t in texts if t.strip()])
        dur = wav.shape[-1] / self.cfg.sample_rate
        out: list = []
        for k, (off, row) in enumerate(zip(offs, rows)):
            if gated[k]:
                continue
            lo = off + halo if k > 0 else 0.0
            hi = offs[k + 1] + halo if k + 1 < len(offs) else float("inf")
            win_end = min(off + self.cfg.chunk_length, dur)
            for s, e, txt in self._parse_segments(row, task):
                s = off + s
                # lone trailing open tick → window end; clamp so end ≥ start
                # even on untrained weights whose ticks overrun the window
                e = off + e if e is not None else win_end
                e = max(s, min(e, dur))
                mid = (s + e) / 2
                if lo <= mid < hi:
                    out.append((s, e, txt))
        return out

    def transcribe_batch(self, wavs, task: str = "translate",
                         language: int | None = None) -> list[str]:
        """Many wavs → texts through ONE whisper program per fallback rung.
        The batch pads to a dyadic size so the jitted encoder+decode
        compiles once per bucket (not once per concurrent-request count);
        dummy rows are dropped. ``language=None`` auto-detects per row —
        mixed-language batches still share the program (per-row SOT)."""
        n = self.cfg.n_samples
        stack = np.zeros((len(wavs), n), np.float32)
        for i, w in enumerate(wavs):
            w = np.asarray(w, np.float32)[:n]
            stack[i, : len(w)] = w
        return self._robust_decode(stack, task, language)[0]
