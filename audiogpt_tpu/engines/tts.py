"""TTS engine: text → mel (FastSpeech2) → wav (vocoder), two jit programs.

Replaces the reference's TTS tool chain (``audio-chatgpt.py:275-297`` →
``BaseTTSInfer.infer_once``, ``inference/tts/base_tts_infer.py:66``) — there
the acoustic model is PortaSpeech whose module is missing from the reference
tree (SURVEY.md §2.2); per BASELINE.json the parity target is the
FastSpeech2-class text→mel→wav pipeline.
"""

from __future__ import annotations

import dataclasses
import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from audiogpt_tpu.registry import ENGINES
from audiogpt_tpu.engines.base import Bucketer, Engine
from audiogpt_tpu.engines.vocoder import VocoderEngine
from audiogpt_tpu.models.tts import FastSpeech2, FastSpeech2Config
from audiogpt_tpu.text import EnglishFrontend, TokenTextEncoder

TOKEN_BUCKETS = (32, 64, 128, 256)


def split_for_buckets(frontend, text: str, fits) -> list[str]:
    """Split long input into clause chunks for which ``fits(ProcessedText)``
    holds (long-form synthesis: the reference fails beyond its fixed
    canvases — SURVEY.md §5 long-context; here we chunk at clause
    punctuation and fall back to word bisection)."""
    import re

    def ok(t: str) -> bool:
        return fits(frontend(t))

    if ok(text):
        return [text]
    parts = [p.strip() for p in
             re.split(r"(?<=[.!?;:,])\s+", text.strip()) if p.strip()]
    chunks: list[str] = []
    cur = ""
    for p in parts:
        cand = (cur + " " + p).strip()
        if cur and not ok(cand):
            chunks.append(cur)
            cur = p
        else:
            cur = cand
    if cur:
        chunks.append(cur)
    # a single clause can still overflow → bisect on words
    out: list[str] = []
    stack = chunks[::-1]
    while stack:
        c = stack.pop()
        if ok(c):
            out.append(c)
            continue
        words = c.split()
        if len(words) < 2:
            out.append(c)  # single unsplittable token; engine will error
            continue
        mid = len(words) // 2
        stack.append(" ".join(words[mid:]))
        stack.append(" ".join(words[:mid]))
    return out


def synthesize_stream(engine, text: str, gap_sec: float = 0.1,
                      max_phones: int | None = None):
    """Yield wav chunks (float32 [T] @ ``engine.sample_rate``) as soon as
    each clause chunk is synthesized — time-to-first-audio is one chunk's
    latency instead of the whole utterance's. ``synthesize_long`` is the
    concatenation of this stream; the HTTP ``/tts/stream`` endpoint sends
    it as a progressive WAV.

    ``max_phones`` caps the phones per chunk: without it, clauses greedily
    pack up to the LARGEST bucket (throughput mode — right for
    ``synthesize_long``), which makes short multi-clause texts a single
    chunk and TTFA the full utterance's wall. Streaming callers pass a
    small cap (the server's ``chunk_phones``, default 64) so the first
    chunk — and TTFA — is one clause, not the whole text."""
    bucket_cap = max(engine.ph_bucketer.buckets
                     if hasattr(engine, "ph_bucketer")
                     else engine.bucketer.buckets)
    phone_cap = min(bucket_cap, max_phones) if max_phones else bucket_cap
    max_words = max(engine.word_bucketer.buckets) \
        if hasattr(engine, "word_bucketer") else None

    def fits(pt) -> bool:
        if len(pt.phones) > phone_cap:
            return False
        # +2: engines may add <BOS>/<EOS> words around pt.words
        return max_words is None or len(pt.words) + 2 <= max_words

    chunks = split_for_buckets(engine.frontend, text, fits)
    gap = np.zeros(int(gap_sec * engine.sample_rate), np.float32)
    fused = getattr(engine, "_fused_ok", False)
    for i, c in enumerate(chunks):
        yield (engine.synthesize_chunk(c) if fused
               else engine.vocoder(engine.text_to_mel(c)))
        if i < len(chunks) - 1:
            yield gap


def synthesize_long(engine, text: str, gap_sec: float = 0.1) -> np.ndarray:
    """Chunked long-form text→wav over any engine exposing ``frontend``,
    ``text_to_mel``, ``vocoder``, ``sample_rate`` and bucket ladders."""
    pieces = list(synthesize_stream(engine, text, gap_sec))
    return pieces[0] if len(pieces) == 1 else np.concatenate(pieces)


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

    def warmup(self, batch_sizes=(1,), token_buckets=None) -> None:
        """AOT-compile the synthesis programs across (batch, token-bucket)
        rungs. The bucket contract ("every jitted program compiles once per
        bucket") only helps latency-sensitive callers if that "once" happens
        at startup — a cold fused-program compile under a waiting client
        strands the whole coalesced micro-batch behind it (VERDICT r3 #1).
        ``serve --warmup`` and :class:`serving.batcher.BatchedTTS.warmup`
        call this; the dummy run also executes (tiny), which primes device
        allocators."""
        tbs = tuple(token_buckets or self.bucketer.buckets)
        for nb in batch_sizes:
            for tb in tbs:
                toks = np.zeros((int(nb), int(tb)), np.int32)
                if self._fused_ok:
                    out = self._fused_fn(self.params, self.vocoder.params,
                                         toks)
                    # warm the bounded download-slice ladder for this canvas
                    # (download_rows): ≤DOWNLOAD_LEVELS tiny slice programs
                    wav16 = out[0]
                    for k in range(1, self.DOWNLOAD_LEVELS + 1):
                        w = wav16.shape[-1] >> k
                        if w > 0:
                            self.host_sync(wav16[:, :w])
                else:
                    out = self._fn(self.params, toks)
                # host-sync, NOT block_until_ready: on the axon tunnel the
                # latter returns with the compile still in flight, so the
                # first real request would stall behind it (Engine.host_sync)
                self.host_sync(out)

    def text_to_mel(self, text: str) -> np.ndarray:
        ids = np.asarray(self.frontend.encode(text), np.int32)
        padded, _ = self.bucketer.pad_to_bucket(ids[None], axis=1)
        mel = np.asarray(self._fn(self.params, padded))[0]
        # trim trailing all-zero (padding) frames
        nz = np.nonzero(np.abs(mel).sum(-1) > 0)[0]
        end = int(nz[-1]) + 1 if len(nz) else 1
        return mel[:end]

    @property
    def _fused_ok(self) -> bool:
        """Fused text→mel→wav applies to vocoders with a plain mel→wav
        forward (no NSF f0 input, no noise input)."""
        v = self.vocoder
        return (v.kind == "hifigan" and not getattr(v.cfg, "use_nsf", False)) \
            or v.kind == "bigvgan"

    @functools.cached_property
    def _fused_fn(self):
        """FS2 + full-canvas vocoder in ONE jit program emitting int16 wav +
        the valid frame count. On the TPU tunnel each extra dispatch and
        every downloaded byte dominates the compute they wrap (the same
        lesson as T2A's `_sample_vocode_fn`): one roundtrip, half-width
        samples, and the mel never leaves the device."""
        voc = self.vocoder

        @jax.jit
        def run(p, vp, toks):
            out = self.model.apply(p, toks, infer=True)
            n = jnp.maximum((out["mel2ph"] > 0).sum(axis=1), 1)     # [B]
            wav = voc.model.apply(vp, out["mel_out"])
            if wav.ndim == 3:
                wav = wav[..., 0]
            wav16 = jnp.clip(wav * 32767.0, -32768.0, 32767.0
                             ).astype(jnp.int16)
            return wav16, n.astype(jnp.int32)

        return run

    def synthesize_chunk(self, text: str) -> np.ndarray:
        """One bucketed chunk through the fused program; only the valid
        int16 samples cross the host boundary."""
        ids = np.asarray(self.frontend.encode(text), np.int32)
        padded, _ = self.bucketer.pad_to_bucket(ids[None], axis=1)
        wav16, n = self._fused_fn(self.params, self.vocoder.params, padded)
        end = int(n[0]) * self.vocoder.hop_size
        # bounded-ladder download (base.Engine.download_rows): a per-`end`
        # device slice would compile a fresh program per distinct length
        block = self.download_rows(wav16, [end])
        return block[0, :end].astype(np.float32) / 32767.0

    def __call__(self, text: str) -> np.ndarray:
        """text → waveform (vocoder sample rate); long inputs are chunked
        at clause boundaries and joined with short gaps."""
        return synthesize_long(self, text)

    def batch_synthesize(self, texts: list[str]) -> list[np.ndarray]:
        """Many texts → waveforms through ONE text→mel call and ONE vocoder
        call (cross-request micro-batching entry point; see
        :class:`audiogpt_tpu.serving.batcher.MicroBatcher`). Texts beyond
        the largest token bucket fall back to chunked single synthesis."""
        ids = [np.asarray(self.frontend.encode(t), np.int32) for t in texts]
        top = max(self.bucketer.buckets)
        out: list[np.ndarray | None] = [None] * len(texts)
        idx = [i for i, v in enumerate(ids) if len(v) <= top]
        for i, v in enumerate(ids):
            if len(v) > top:            # long-form fallback, one at a time
                out[i] = synthesize_long(self, texts[i])
        if idx:
            tb = self.bucketer.bucket(max(len(ids[i]) for i in idx))
            n = len(idx)
            nb = 1
            while nb < n:
                nb *= 2
            toks = np.zeros((nb, tb), np.int32)
            for r, i in enumerate(idx):
                toks[r, : len(ids[i])] = ids[i]
            hop = self.vocoder.hop_size
            if self._fused_ok:
                # same ONE-program int16 path as single calls (identical
                # output semantics, incl. the mel2ph trim rule); per-row
                # device slices download only the valid half-width samples
                # instead of round-tripping full-canvas f32 mels
                wav16, nfr = self._fused_fn(self.params,
                                            self.vocoder.params, toks)
                nfr = np.asarray(nfr)
                ends = [int(nfr[r]) * hop for r in range(n)]
                block = self.download_rows(wav16, ends)
                for r, i in enumerate(idx):
                    out[i] = block[r, :ends[r]].astype(np.float32) / 32767.0
            else:
                mels = np.asarray(self._fn(self.params, toks))[:n]
                lens = []
                for r in range(n):
                    nz = np.nonzero(np.abs(mels[r]).sum(-1) > 0)[0]
                    lens.append(int(nz[-1]) + 1 if len(nz) else 1)
                mel_max = max(lens)
                wavs = self.vocoder(mels[:, :mel_max])
                for r, i in enumerate(idx):
                    out[i] = np.asarray(wavs[r][: lens[r] * hop])
        return out  # type: ignore[return-value]

    @property
    def sample_rate(self) -> int:
        return self.vocoder.cfg.sample_rate


WORD_BUCKETS = (8, 16, 32, 64)


@ENGINES.register("tts_portaspeech")
class PortaSpeechTTSEngine(Engine):
    """PortaSpeech / SyntaSpeech text→mel→wav.

    The reference's TTS tool targets PortaSpeech (``audio-chatgpt.py:275``)
    but its model package is missing upstream; this engine serves the
    native rebuild (:mod:`audiogpt_tpu.models.tts.portaspeech`). With
    ``cfg.use_graph`` the engine also builds the dense syntactic word graph
    (SyntaSpeech). One jit program per (phone-bucket, word-bucket) pair.
    """

    name = "tts_portaspeech"

    def __init__(
        self,
        cfg=None,
        params=None,
        vocoder: VocoderEngine | None = None,
        frontend: EnglishFrontend | None = None,
        phone_vocab: list[str] | None = None,
        word_vocab: list[str] | None = None,
        token_buckets=TOKEN_BUCKETS,
        word_buckets=WORD_BUCKETS,
        noise_scale: float = 0.8,
        rng_seed: int = 0,
    ):
        super().__init__()
        import jax.numpy as jnp

        from audiogpt_tpu.models.tts import PortaSpeech, PortaSpeechConfig

        if frontend is None:
            if phone_vocab is None:
                from audiogpt_tpu.text import default_arpabet_vocab

                phone_vocab = default_arpabet_vocab()
            frontend = EnglishFrontend(phone_encoder=TokenTextEncoder(phone_vocab))
        self.frontend = frontend
        # open-vocabulary fallback: unseen words hit <UNK> (reference:
        # word_set.json built at binarize time, tasks/tts/ps.py:21)
        self.word_encoder = TokenTextEncoder(word_vocab or ["<BOS>", "<EOS>"])
        vocab_size = len(frontend.phone_encoder)
        self.cfg = cfg or PortaSpeechConfig(
            ph_vocab_size=vocab_size,
            word_vocab_size=len(self.word_encoder), max_frames=1024)
        if self.cfg.ph_vocab_size < vocab_size:
            self.cfg = dataclasses.replace(self.cfg, ph_vocab_size=vocab_size)
        self.model = PortaSpeech(self.cfg)
        self.noise_scale = noise_scale
        if params is None:
            rng = jax.random.PRNGKey(rng_seed)
            t, w = 16, 8
            kw = {}
            if self.cfg.use_graph:
                kw["graph_adj"] = jnp.zeros((1, self.cfg.n_edge_types, w, w))
            params = self.model.init(
                rng, jnp.ones((1, t), jnp.int32), jnp.ones((1, w), jnp.int32),
                jnp.ones((1, t), jnp.int32), infer=True, rng=rng, **kw)
        self.params = params
        self.vocoder = vocoder or VocoderEngine("hifigan")
        self.ph_bucketer = Bucketer(token_buckets)
        self.word_bucketer = Bucketer(word_buckets)
        self._fn = jax.jit(
            lambda p, toks, words, p2w, adj, rng: self.model.apply(
                p, toks, words, p2w, graph_adj=adj, infer=True, rng=rng,
                noise_scale=self.noise_scale)["mel_out"])
        # per-call keys derive via fold_in on an atomic counter so
        # concurrent serving requests can't reuse/tear a key (ADVICE r1)
        self._base_rng = jax.random.PRNGKey(rng_seed + 1)
        self._call_counter = itertools.count()

    def text_to_mel(self, text: str) -> np.ndarray:
        pt = self.frontend(text)
        words = list(pt.words)
        p2w = np.asarray(pt.ph2word, np.int32)
        if pt.phones and pt.phones[0] == "<BOS>":
            words = ["<BOS>"] + words + ["<EOS>"]
            p2w = p2w + 1
        ids = np.asarray(self.frontend.phone_encoder.encode(pt.phones), np.int32)
        wids = np.asarray(self.word_encoder.encode(words), np.int32)
        ids, _ = self.ph_bucketer.pad_to_bucket(ids[None], axis=1)
        p2w, _ = self.ph_bucketer.pad_to_bucket(p2w[None], axis=1)
        wids, wlen = self.word_bucketer.pad_to_bucket(wids[None], axis=1)
        if self.cfg.use_graph:
            from audiogpt_tpu.text.syntax import build_word_graph

            adj = build_word_graph(words, max_words=wids.shape[1])[None]
        else:
            adj = np.zeros(
                (1, self.cfg.n_edge_types, wids.shape[1], wids.shape[1]),
                np.float32)
        key = jax.random.fold_in(self._base_rng, next(self._call_counter))
        mel = np.asarray(self._fn(self.params, ids, wids, p2w, adj, key))[0]
        nz = np.nonzero(np.abs(mel).sum(-1) > 0)[0]
        end = int(nz[-1]) + 1 if len(nz) else 1
        return mel[:end]

    def __call__(self, text: str) -> np.ndarray:
        return synthesize_long(self, text)

    @property
    def sample_rate(self) -> int:
        return self.vocoder.cfg.sample_rate
