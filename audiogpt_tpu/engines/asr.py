"""ASR engine: waveform → token ids (→ text with a tokenizer).

Mirrors the reference's ASR tool behavior (``audio-chatgpt.py:560-577``):
load → pad/trim to 30 s → log-mel → decode, with task/language control via
the forced SOT prompt. All compute after the numpy boundary is two jit
programs (encoder+prime, scan-decode) per batch-shape bucket.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from audiogpt_tpu.registry import ENGINES
from audiogpt_tpu.engines.base import Engine
from audiogpt_tpu.models.asr import (
    WhisperConfig,
    WhisperModel,
    greedy_decode,
    whisper_log_mel,
)

# whisper-multilingual special tokens (vocab 51865)
SOT = 50258
EOT = 50257
TASK_TRANSCRIBE = 50359
TASK_TRANSLATE = 50358
NO_TIMESTAMPS = 50363
LANG_BASE = 50259  # + language index (en=0, zh=1, ...)


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
                 max_tokens: int = 224, rng_seed: int = 0, vocab=None):
        super().__init__()
        self.cfg = cfg or WhisperConfig()
        self.model = WhisperModel(self.cfg)
        self.max_tokens = max_tokens
        self._warned_no_vocab = False
        if params is None:
            import jax

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

    def warmup(self, batch_sizes=(1,)) -> None:
        """AOT-compile the encoder+scan-decode program for each batch rung so
        serving requests never wait on a cold compile (see
        :meth:`engines.tts.TTSEngine.warmup`)."""
        for nb in batch_sizes:
            self.transcribe_tokens(np.zeros((int(nb), self.cfg.n_samples),
                                            np.float32))

    def sot_sequence(self, task: str = "translate", language: int = 0) -> list[int]:
        """The reference uses whisper's translate task (audio-chatgpt.py:1296)."""
        task_tok = TASK_TRANSLATE if task == "translate" else TASK_TRANSCRIBE
        return [SOT, LANG_BASE + language, task_tok, NO_TIMESTAMPS]

    def transcribe_tokens(self, wav: np.ndarray, task: str = "translate",
                          language: int = 0) -> np.ndarray:
        """wav [T] or [B, T] @16 kHz → token ids [B, P+max_tokens]."""
        if wav.ndim == 1:
            wav = wav[None]
        wav = pad_or_trim(wav, self.cfg.n_samples)
        mel = whisper_log_mel(jnp.asarray(wav), self.cfg.n_mels)
        sot = self.sot_sequence(task, language)
        prompt = jnp.tile(jnp.asarray(sot, jnp.int32)[None], (wav.shape[0], 1))
        eot = EOT if self.cfg.n_vocab > EOT else self.cfg.n_vocab - 1
        toks = greedy_decode(
            self.model, self.params, mel, prompt,
            max_tokens=self.max_tokens, eot_id=eot,
        )
        return np.asarray(toks)

    def _tokens_to_text(self, toks, task: str, language: int) -> str:
        dec = getattr(self, "text_decoder", None)
        prompt_len = len(self.sot_sequence(task, language))
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

    def transcribe(self, wav: np.ndarray, task: str = "translate",
                   language: int = 0) -> str:
        """→ text. Uses ``self.text_decoder`` (a ``tokens -> str`` callable;
        by default the bundled derived codec, so text comes out of the box —
        wire OpenAI's ranks via ``set_vocab`` for imported whisper weights).

        Audio longer than whisper's 30 s receptive field is transcribed in
        fixed 30 s windows decoded as ONE batched program (the reference's
        ``transcribe()`` seek loop — ``whisper/transcribe.py`` — runs the
        windows sequentially; here they ride the dyadic batch ladder), and
        the window texts are joined."""
        wav = np.asarray(wav, np.float32)
        n = self.cfg.n_samples
        if wav.ndim == 1 and wav.shape[-1] > n:
            wins = [wav[i: i + n] for i in range(0, wav.shape[-1], n)]
            texts = self.transcribe_batch(wins, task, language)
            return " ".join(t.strip() for t in texts if t.strip())
        toks = self.transcribe_tokens(wav, task, language)[0]
        return self._tokens_to_text(toks, task, language)

    def transcribe_batch(self, wavs, task: str = "translate",
                         language: int = 0) -> list[str]:
        """Many wavs → texts through ONE whisper program. The batch pads to
        a dyadic size so the jitted encoder+decode compiles once per bucket
        (not once per concurrent-request count); dummy rows are dropped."""
        n = len(wavs)
        nb = 1
        while nb < n:
            nb *= 2
        top = max(len(w) for w in wavs)
        stack = np.zeros((nb, top), np.float32)
        for i, w in enumerate(wavs):
            stack[i, : len(w)] = np.asarray(w, np.float32)
        toks = self.transcribe_tokens(stack, task, language)[:n]
        return [self._tokens_to_text(row, task, language) for row in toks]
