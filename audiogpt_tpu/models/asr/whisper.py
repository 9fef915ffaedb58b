"""Whisper-class ASR encoder-decoder, TPU-native.

The reference uses the openai-whisper pip wheel eagerly
(``audio-chatgpt.py:560-577``: ``whisper.load_model('base')``, pad/trim to
30 s, translate task). Here the same architecture is a flax model with:

  * the exact Whisper log-mel frontend as a jnp function
    (n_fft 400, hop 160, 80 mels, drop last frame, dynamic-range clamp),
  * a static-shape KV cache and a ``lax.scan`` greedy decode loop — one
    compiled program for the entire transcription, no per-token dispatch,
  * weight layout compatible with HF ``WhisperModel`` checkpoints via
    :func:`audiogpt_tpu.utils.torch_import` (so openai weights can be loaded
    once converted).

Config default is whisper-base (the model the reference serves).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audiogpt_tpu.dsp.mel import mel_filterbank
from audiogpt_tpu.dsp.stft import spectrogram
from audiogpt_tpu.ops.attention import KVCache, attention


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 80
    n_audio_ctx: int = 1500          # encoder positions (30 s / 2 / 10ms)
    n_audio_state: int = 512         # base
    n_audio_head: int = 8
    n_audio_layer: int = 6
    n_vocab: int = 51865
    n_text_ctx: int = 448
    n_text_state: int = 512
    n_text_head: int = 8
    n_text_layer: int = 6
    sample_rate: int = 16000
    chunk_length: int = 30           # seconds

    @property
    def n_samples(self) -> int:
        return self.sample_rate * self.chunk_length


# ---------------------------------------------------------------------------
# Frontend (whisper/audio.py semantics)
# ---------------------------------------------------------------------------


def whisper_log_mel(wav: jnp.ndarray, n_mels: int = 80) -> jnp.ndarray:
    """wav [..., n_samples] @16 kHz → log-mel [..., frames, n_mels].

    Matches whisper's ``log_mel_spectrogram``: |stft(400,160,hann)|² with the
    final frame dropped, slaney mel (fmin 0, fmax 8000), log10 clamped at
    1e-10, dynamic-range floor at max−8, then (x+4)/4.
    """
    power = spectrogram(wav, 400, 160, 400, center=True, pad_mode="reflect", power=2.0)
    power = power[..., :-1, :]  # whisper drops the last frame
    fb = jnp.asarray(mel_filterbank(16000, 400, n_mels, 0.0, 8000.0))
    mel = jnp.matmul(power, fb, preferred_element_type=jnp.float32)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    floor = jnp.max(log_spec, axis=(-2, -1), keepdims=True) - 8.0
    log_spec = jnp.maximum(log_spec, floor)
    return (log_spec + 4.0) / 4.0


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Whisper's fixed sinusoidal encoder positions."""
    log_timescale_increment = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(
        np.float32
    )


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


class MHA(nn.Module):
    """Whisper attention: q/v/out have bias, k doesn't."""

    d_model: int
    n_head: int

    def setup(self):
        d = self.d_model
        self.q_proj = nn.Dense(d, name="q")
        self.k_proj = nn.Dense(d, use_bias=False, name="k")
        self.v_proj = nn.Dense(d, name="v")
        self.out_proj = nn.Dense(d, name="out")

    def _split(self, x):
        b, t, _ = x.shape
        return x.reshape(b, t, self.n_head, self.d_model // self.n_head)

    def __call__(self, x, kv=None, is_causal=False, cache: KVCache | None = None,
                 mask=None):
        """``kv=None`` → self-attention. With ``cache`` (decode), the K/V of
        the current tokens are appended and attention spans the cache."""
        q = self._split(self.q_proj(x))
        src = x if kv is None else kv
        k = self._split(self.k_proj(src))
        v = self._split(self.v_proj(src))
        new_cache = None
        if cache is not None:
            new_cache = cache.update(k, v)
            k, v = new_cache.k, new_cache.v
            # causal valid-length mask over the cache: query j of this chunk
            # may see cache entries up to its own global position — the
            # multi-token prime (SOT prompt in one call) must NOT let
            # position 0 attend to later prompt tokens, or the no-speech /
            # language probabilities read at the SOT position become
            # non-causal (they differ from whisper's single-forward values)
            t_q = x.shape[1]
            pos = jnp.arange(k.shape[1])[None, None, None, :]
            q_pos = new_cache.index - t_q + jnp.arange(t_q)
            mask = pos <= q_pos[None, None, :, None]
        out = attention(q, k, v, mask=mask, is_causal=is_causal and cache is None)
        b, t, _, _ = out.shape
        out = self.out_proj(out.reshape(b, t, self.d_model))
        return (out, new_cache) if cache is not None else out


class ResidualBlock(nn.Module):
    """Pre-LN transformer block; optional cross-attention (decoder)."""

    d_model: int
    n_head: int
    cross: bool = False

    def setup(self):
        self.attn = MHA(self.d_model, self.n_head, name="attn")
        self.attn_ln = nn.LayerNorm(epsilon=1e-5, name="attn_ln")
        if self.cross:
            self.cross_attn = MHA(self.d_model, self.n_head, name="cross_attn")
            self.cross_attn_ln = nn.LayerNorm(epsilon=1e-5, name="cross_attn_ln")
        self.mlp_ln = nn.LayerNorm(epsilon=1e-5, name="mlp_ln")
        self.fc1 = nn.Dense(self.d_model * 4, name="fc1")
        self.fc2 = nn.Dense(self.d_model, name="fc2")

    def __call__(self, x, xa=None, self_cache: KVCache | None = None, is_causal=False):
        if self_cache is not None:
            h, self_cache = self.attn(self.attn_ln(x), cache=self_cache)
            x = x + h
        else:
            x = x + self.attn(self.attn_ln(x), is_causal=is_causal)
        if self.cross:
            x = x + self.cross_attn(self.cross_attn_ln(x), kv=xa)
        x = x + self.fc2(jax.nn.gelu(self.fc1(self.mlp_ln(x)), approximate=False))
        return (x, self_cache) if self_cache is not None else x


class WhisperEncoder(nn.Module):
    cfg: WhisperConfig

    @nn.compact
    def __call__(self, mel):
        """mel [B, frames(=2*ctx), n_mels] → [B, ctx, d]."""
        cfg = self.cfg
        d = cfg.n_audio_state
        x = nn.Conv(d, (3,), padding=1, name="conv1")(mel)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(d, (3,), strides=(2,), padding=1, name="conv2")(x)
        x = jax.nn.gelu(x, approximate=False)
        # cast to x's dtype: the f32 numpy constant would silently promote
        # a bf16 activation stream back to f32 (bf16 throughput mode)
        x = x + jnp.asarray(sinusoids(cfg.n_audio_ctx, d),
                            dtype=x.dtype)[: x.shape[1]]
        for i in range(cfg.n_audio_layer):
            x = ResidualBlock(d, cfg.n_audio_head, name=f"block_{i}")(x)
        return nn.LayerNorm(epsilon=1e-5, name="ln_post")(x)


class WhisperDecoder(nn.Module):
    cfg: WhisperConfig

    def setup(self):
        cfg = self.cfg
        self.token_embedding = nn.Embed(cfg.n_vocab, cfg.n_text_state,
                                        name="token_embedding")
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.n_text_ctx, cfg.n_text_state),
        )
        self.blocks = [
            ResidualBlock(cfg.n_text_state, cfg.n_text_head, cross=True,
                          name=f"block_{i}")
            for i in range(cfg.n_text_layer)
        ]
        self.ln = nn.LayerNorm(epsilon=1e-5, name="ln")

    def __call__(self, tokens, xa, pos_offset=0, caches=None):
        """tokens [B, t] + encoder states xa [B, ctx, d] → logits [B, t, vocab].

        With ``caches`` (list of per-layer KVCache), runs incremental decode;
        returns (logits, new_caches).
        """
        x = self.token_embedding(tokens)
        x = x + jax.lax.dynamic_slice_in_dim(
            self.positional_embedding, pos_offset, tokens.shape[1], axis=0
        )
        new_caches = [] if caches is not None else None
        for i, blk in enumerate(self.blocks):
            if caches is not None:
                x, c = blk(x, xa=xa, self_cache=caches[i])
                new_caches.append(c)
            else:
                x = blk(x, xa=xa, is_causal=True)
        x = self.ln(x)
        logits = x @ self.token_embedding.embedding.T
        return (logits, new_caches) if caches is not None else logits


class WhisperModel(nn.Module):
    cfg: WhisperConfig

    def setup(self):
        self.encoder = WhisperEncoder(self.cfg, name="encoder")
        self.decoder = WhisperDecoder(self.cfg, name="decoder")

    def __call__(self, mel, tokens):
        xa = self.encoder(mel)
        return self.decoder(tokens, xa)

    def encode(self, mel):
        return self.encoder(mel)

    def decode_step(self, tokens, xa, pos_offset, caches):
        return self.decoder(tokens, xa, pos_offset=pos_offset, caches=caches)


# ---------------------------------------------------------------------------
# Decode as one compiled program (greedy / sampled, with logit filters)
# ---------------------------------------------------------------------------


def greedy_decode(
    model: WhisperModel,
    params,
    mel: jnp.ndarray,
    prompt: jnp.ndarray,       # [B, P] forced prefix (SOT sequence)
    max_tokens: int,
    eot_id: int,
) -> jnp.ndarray:
    """Plain greedy decode → tokens [B, P+max_tokens] (EOT-padded).
    Thin wrapper over :func:`decode` with no filters (parity tests)."""
    return decode(model, params, mel, prompt, max_tokens, eot_id)[0]


def decode(
    model: WhisperModel,
    params,
    mel: jnp.ndarray,
    prompt: jnp.ndarray,
    max_tokens: int,
    eot_id: int,
    *,
    suppress: tuple = (),
    suppress_gte: int | None = None,
    blank_ids: tuple = (),
    no_speech_id: int | None = None,
    temperature: float = 0.0,
    rng=None,
    lang_range: tuple | None = None,
    timestamps: bool = False,
    timestamp_begin: int | None = None,
    max_initial_timestamp: int | None = 50,
):
    """One-program whisper decode with the reference's logit filters
    (openai-whisper ``DecodingTask._get_logit_filters`` semantics, used by
    the reference at ``audio-chatgpt.py:571-575``), TPU-shaped:

      * ``suppress`` / ``suppress_gte`` — static −inf masks applied at EVERY
        step (non-speech symbol ids + the special-token region above EOT);
        baked into the compiled program, not per-step host logic.
      * ``blank_ids`` — additionally suppressed at the FIRST sampled token
        (whisper's ``SuppressBlank``: leading space/EOT).
      * ``no_speech_id`` — returns p(no-speech) from the SOT position of the
        prime forward (whisper's no-speech detection).
      * ``temperature`` — TRACED: 0 → argmax, >0 → categorical sampling, so
        the temperature-fallback ladder re-dispatches ONE compiled program
        instead of compiling per temperature.
      * ``lang_range`` — ``(base_id, n_langs)``: additionally return the
        softmax over the language-token block at the SOT position of the
        prime forward (whisper ``detect_language`` — the reference runs it
        at ``audio-chatgpt.py:570-571``). Costs one softmax; rides the same
        program.
      * ``timestamps`` + ``timestamp_begin`` — whisper's timestamp-token
        decode mode (``DecodingOptions()`` default, the ``transcribe()``
        path at ``audio-chatgpt.py:573-575``): tokens ≥ ``timestamp_begin``
        are segment-time markers. The ``ApplyTimestampRules`` constraints
        are carried scan state + vectorized masks — the first sampled token
        must be a timestamp (≤ ``max_initial_timestamp`` ticks), timestamps
        pair up (after a lone closing timestamp only a timestamp/EOT may
        follow; after an opening pair, text), never decrease, and when the
        total timestamp probability beats every text token the step is
        forced to a timestamp.

    The sampler loop is a ``lax.scan`` over token positions inside one jit —
    the per-step forward reuses the static KV cache (contrast: the
    reference's python for-loop). The program is cached per
    (model, max_tokens, eot, masks) — building it fresh per call re-traced
    and re-compiled the whole encoder+scan every request (measured 0.95×
    realtime; cached it is hundreds× realtime).

    Returns ``(tokens [B, P+max_tokens], avg_logprob [B],
    no_speech_prob [B], lang_probs [B, n_langs])`` — avg_logprob is the mean
    logprob of the sampled tokens (EOT included), whisper's fallback
    statistic; lang_probs is ``[B, 0]`` when ``lang_range`` is None.
    """
    fn = _decode_fn(model, max_tokens, eot_id, tuple(suppress),
                    suppress_gte, tuple(blank_ids), no_speech_id,
                    lang_range, timestamps, timestamp_begin,
                    max_initial_timestamp)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    return fn(params, mel, prompt, jnp.float32(temperature), rng)


@functools.lru_cache(maxsize=16)
def _decode_fn(model: WhisperModel, max_tokens: int, eot_id: int,
               suppress: tuple = (), suppress_gte: int | None = None,
               blank_ids: tuple = (), no_speech_id: int | None = None,
               lang_range: tuple | None = None, timestamps: bool = False,
               timestamp_begin: int | None = None,
               max_initial_timestamp: int | None = 50):
    cfg = model.cfg
    heads, d = cfg.n_text_head, cfg.n_text_state // cfg.n_text_head
    ts_begin = timestamp_begin
    if timestamps:
        if ts_begin is None or not (eot_id < ts_begin < cfg.n_vocab):
            raise ValueError(
                f"timestamp decode needs eot < timestamp_begin < n_vocab "
                f"(got {ts_begin}, eot {eot_id}, vocab {cfg.n_vocab})")
    # static −inf masks (compile-time constants — XLA folds the adds)
    base = np.zeros((cfg.n_vocab,), np.float32)
    if suppress_gte is not None and suppress_gte < cfg.n_vocab:
        base[suppress_gte:] = -np.inf
    for i in suppress:
        if 0 <= i < cfg.n_vocab:
            base[i] = -np.inf
    if timestamps:
        # the timestamp region must stay reachable; <|notimestamps|>
        # (directly below it) must not (whisper ApplyTimestampRules.apply)
        base[ts_begin:] = 0.0
        if ts_begin - 1 != eot_id:
            base[ts_begin - 1] = -np.inf
    base[eot_id] = 0.0  # EOT must stay reachable
    first = base.copy()
    for i in blank_ids:
        if 0 <= i < cfg.n_vocab:
            first[i] = -np.inf
    if timestamps:
        # the first sampled token must be a timestamp, capped at the
        # max_initial_timestamp option (whisper default 1 s = 50 ticks)
        first[:ts_begin] = -np.inf
        if max_initial_timestamp is not None:
            first[ts_begin + max_initial_timestamp + 1:] = -np.inf
    is_ts_vec = np.arange(cfg.n_vocab) >= (ts_begin if timestamps
                                           else cfg.n_vocab)

    @jax.jit
    def run(params, mel, prompt, temperature, rng):
        b, p = prompt.shape
        total = p + max_tokens
        # compute dtype follows the params (bf16 throughput mode casts the
        # tree once at the engine — ASREngine(bf16=True)); the f32 log-mel
        # is cast at the boundary so the whole encoder→decoder stream stays
        # in one dtype (an f32 xa would re-promote the decoder residual via
        # cross-attention and break the KV-cache dtype from layer 2 on)
        flt = [l for l in jax.tree_util.tree_leaves(params)
               if jnp.issubdtype(l.dtype, jnp.floating)]
        cdt = flt[0].dtype if flt else jnp.float32
        xa = model.apply(params, mel.astype(cdt), method=WhisperModel.encode)
        caches = [
            KVCache.create(b, total, heads, d, dtype=cdt)
            for _ in range(cfg.n_text_layer)
        ]
        # prime with the prompt; logits consumed in f32 (softmax/logprob
        # statistics keep full precision regardless of compute dtype)
        logits, caches = model.apply(
            params, prompt, xa, 0, caches, method=WhisperModel.decode_step
        )
        logits = logits.astype(jnp.float32)
        if no_speech_id is not None:
            ns_prob = jax.nn.softmax(logits[:, 0], axis=-1)[:, no_speech_id]
        else:
            ns_prob = jnp.zeros((b,), jnp.float32)
        if lang_range is not None:
            lb, ln = lang_range
            lang_probs = jax.nn.softmax(logits[:, 0, lb:lb + ln], axis=-1)
        else:
            lang_probs = jnp.zeros((b, 0), jnp.float32)

        def pick(lg, key):
            greedy = jnp.argmax(lg, axis=-1)
            sampled = jax.random.categorical(
                key, lg / jnp.maximum(temperature, 1e-6), axis=-1)
            return jnp.where(temperature > 0, sampled, greedy)

        k0, k_rest = jax.random.split(rng)
        l0 = logits[:, -1] + jnp.asarray(first)
        last = pick(l0, k0)
        lp0 = jax.nn.log_softmax(l0, axis=-1)
        sum_lp = jnp.take_along_axis(lp0, last[:, None], 1)[:, 0]
        count = jnp.ones((b,), jnp.float32)
        sup = jnp.asarray(base)
        is_ts = jnp.asarray(is_ts_vec)
        vocab_ids = jnp.arange(cfg.n_vocab)

        def apply_ts_rules(lg, last, prev_ts, max_ts):
            """whisper ApplyTimestampRules as batch-vectorized masks over
            carried state — ``prev_ts``: was the token before ``last`` a
            timestamp; ``max_ts``: largest timestamp sampled so far."""
            last_ts = last >= ts_begin
            # after an opening pair (..ts ts) text must follow; after a lone
            # closing timestamp (..text ts) only a timestamp/EOT may follow
            pair = last_ts & prev_ts
            lone = last_ts & ~prev_ts
            lg = jnp.where(pair[:, None] & is_ts[None, :], -jnp.inf, lg)
            lg = jnp.where(lone[:, None] & (vocab_ids < eot_id)[None, :],
                           -jnp.inf, lg)
            # timestamps never decrease (equality allowed only when closing
            # re-opens at the same tick, i.e. directly after a lone close)
            bound = jnp.where(lone, max_ts, max_ts + 1)
            lg = jnp.where(is_ts[None, :]
                           & (vocab_ids[None, :] < bound[:, None]),
                           -jnp.inf, lg)
            # if total timestamp probability beats every text token, force a
            # timestamp (computed on the already-masked logits, so a fully
            # suppressed timestamp region can never force itself)
            lp = jax.nn.log_softmax(lg, axis=-1)
            ts_lp = jax.nn.logsumexp(
                jnp.where(is_ts[None, :], lp, -jnp.inf), axis=-1)
            txt_max = jnp.max(jnp.where(is_ts[None, :], -jnp.inf, lp),
                              axis=-1)
            force = ts_lp > txt_max
            return jnp.where(force[:, None] & ~is_ts[None, :], -jnp.inf, lg)

        def step(carry, inp):
            i, key = inp
            last, caches, done, sum_lp, count, prev_ts, max_ts = carry
            tok = jnp.where(done, eot_id, last)
            logits, caches = model.apply(
                params, tok[:, None], xa, p + i, caches,
                method=WhisperModel.decode_step,
            )
            lg = logits[:, -1].astype(jnp.float32) + sup
            if timestamps:
                lg = apply_ts_rules(lg, last, prev_ts, max_ts)
            nxt = pick(lg, key)
            lp = jax.nn.log_softmax(lg, axis=-1)
            tok_lp = jnp.take_along_axis(lp, nxt[:, None], 1)[:, 0]
            done_now = done | (tok == eot_id)
            sum_lp = sum_lp + jnp.where(done_now, 0.0, tok_lp)
            count = count + jnp.where(done_now, 0.0, 1.0)
            if timestamps:
                prev_ts = last >= ts_begin
                max_ts = jnp.where((nxt >= ts_begin) & ~done_now,
                                   jnp.maximum(max_ts, nxt), max_ts)
            return (nxt, caches, done_now, sum_lp, count, prev_ts, max_ts), tok

        # first sampled token: whisper treats the (empty) penultimate slot
        # as a timestamp, so text is forced right after the opening tick
        init_prev = jnp.ones((b,), bool)
        init_max = jnp.where(last >= ts_begin, last,
                             jnp.full((b,), ts_begin or 0, last.dtype)) \
            if timestamps else jnp.zeros((b,), last.dtype)
        (_, _, _, sum_lp, count, _, _), toks = jax.lax.scan(
            step,
            (last, caches, jnp.zeros((b,), bool), sum_lp, count,
             init_prev, init_max),
            (jnp.arange(max_tokens), jax.random.split(k_rest, max_tokens)),
        )
        return (jnp.concatenate([prompt, toks.T], axis=1),
                sum_lp / count, ns_prob, lang_probs)

    return run
