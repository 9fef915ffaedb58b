"""FastSpeech2 (non-autoregressive TTS), TPU-native.

Re-design of the reference's ``FastSpeech2``
(``NeuralSeq/modules/fastspeech/fs2.py:22``) with its FFT encoder/decoder
(``tts_modules.py:276``, ``common_layers.py:541`` EncSALayer: pre-LN →
bias-free MHA → mask; pre-LN → conv-FFN(k)·k^-0.5 → gelu → linear → mask) and
variance adaptors (``DurationPredictor`` tts_modules.py:59,
``PitchPredictor``:217, ``LengthRegulator``:179).

TPU-first differences:
  * **static shapes**: the length regulator expands to a fixed ``max_frames``
    canvas (bucketed by the engine); no ``dur.sum().max()`` dynamic sizing,
  * the whole text→mel graph is one jit program (the reference crosses the
    python boundary per sub-module),
  * gather-based expansion (``expand_states``) stays a single ``take_along_axis``
    that XLA lowers to a dynamic-gather on TPU.

Defaults follow ``egs/egs_bases/tts/fs2.yaml`` + ``base.yaml`` (hidden 256,
4+4 layers, 2 heads, ffn kernel 9, dur k3×2, pitch k5×5, pitch_type 'frame',
pitch_norm 'standard', use_uv).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audiogpt_tpu.ops.attention import attention

# f0 constants (NeuralSeq/utils/pitch_utils.py:14-19)
F0_BIN = 256
F0_MAX = 1100.0
F0_MIN = 50.0
F0_MEL_MIN = 1127.0 * math.log(1.0 + F0_MIN / 700.0)
F0_MEL_MAX = 1127.0 * math.log(1.0 + F0_MAX / 700.0)


@dataclasses.dataclass(frozen=True)
class FastSpeech2Config:
    vocab_size: int = 100
    hidden_size: int = 256
    enc_layers: int = 4
    dec_layers: int = 4
    num_heads: int = 2
    enc_ffn_kernel_size: int = 9
    dec_ffn_kernel_size: int = 9
    n_mels: int = 80
    dur_predictor_layers: int = 2
    dur_predictor_kernel: int = 3
    predictor_layers: int = 5
    predictor_kernel: int = 5
    predictor_hidden: int = -1     # -1 → hidden_size
    use_pitch_embed: bool = True
    use_energy_embed: bool = False
    use_uv: bool = True
    pitch_type: str = "frame"      # 'frame' | 'cwt' (fs2.py:191)
    cwt_std_scale: float = 0.8     # hparams['cwt_std_scale']
    pitch_norm: str = "standard"   # 'standard' | 'log'
    f0_mean: float = 200.0
    f0_std: float = 60.0
    num_spk: int = 0               # >0 → speaker-id embedding
    max_frames: int = 2048         # static mel canvas
    dropout: float = 0.1
    use_midi: bool = False         # DiffSinger: midi/slur embeddings
    rel_pos: bool = False          # ESPnet-style reversed PE (ds1000 rel_pos)
    # Mask predictor activations at padded frames between conv layers. The
    # reference's PitchPredictor doesn't (tts_modules.py:247-260), so conv
    # bias values leak from padding into valid tail frames — an artifact that
    # a static canvas would amplify. True = our fix; False = bit-exact
    # reference behavior (used by parity tests).
    predictor_mask_pad: bool = True

    @property
    def pred_hidden(self) -> int:
        return self.predictor_hidden if self.predictor_hidden > 0 else self.hidden_size


# ---------------------------------------------------------------------------
# f0 utilities (pitch_utils.py jnp ports)
# ---------------------------------------------------------------------------


def f0_to_coarse(f0: jnp.ndarray) -> jnp.ndarray:
    """Hz → coarse bin in [1, 255]; 0 Hz (unvoiced/pad) → bin 1."""
    f0_mel = 1127.0 * jnp.log(1.0 + f0 / 700.0)
    scaled = (f0_mel - F0_MEL_MIN) * (F0_BIN - 2) / (F0_MEL_MAX - F0_MEL_MIN) + 1.0
    scaled = jnp.where(f0_mel > 0, scaled, f0_mel)
    scaled = jnp.clip(scaled, 1.0, F0_BIN - 1)
    return jnp.rint(scaled).astype(jnp.int32)


def norm_f0(f0, uv, cfg: FastSpeech2Config):
    if cfg.pitch_norm == "standard":
        f0 = (f0 - cfg.f0_mean) / cfg.f0_std
    elif cfg.pitch_norm == "log":
        f0 = jnp.log2(jnp.maximum(f0, 1e-5))
    if uv is not None and cfg.use_uv:
        f0 = jnp.where(uv > 0, 0.0, f0)
    return f0


def denorm_f0(f0, uv, cfg: FastSpeech2Config, pitch_padding=None):
    if cfg.pitch_norm == "standard":
        f0 = f0 * cfg.f0_std + cfg.f0_mean
    elif cfg.pitch_norm == "log":
        f0 = 2.0 ** f0
    if uv is not None and cfg.use_uv:
        f0 = jnp.where(uv > 0, 0.0, f0)
    if pitch_padding is not None:
        f0 = jnp.where(pitch_padding, 0.0, f0)
    return f0


def length_regulator(dur: jnp.ndarray, max_frames: int, alpha: float = 1.0) -> jnp.ndarray:
    """Durations [B, T_txt] (ints; pad rows 0) → mel2ph [B, max_frames].

    Same cumsum-interval trick as the reference (tts_modules.py:184) but with
    a STATIC output length: frame f belongs to token i iff
    cumsum[i-1] <= f < cumsum[i]; frames past the total are 0 (padding).
    """
    dur = jnp.round(dur.astype(jnp.float32) * alpha).astype(jnp.int32)
    csum = jnp.cumsum(dur, axis=1)  # [B, T]
    csum_prev = jnp.pad(csum[:, :-1], ((0, 0), (1, 0)))
    pos = jnp.arange(max_frames)[None, None, :]  # [1, 1, F]
    tok = jnp.arange(1, dur.shape[1] + 1)[None, :, None]  # [1, T, 1]
    mask = (pos >= csum_prev[:, :, None]) & (pos < csum[:, :, None])
    return jnp.sum(tok * mask.astype(jnp.int32), axis=1)  # [B, F]


def sinusoid_table(n_pos: int, dim: int) -> np.ndarray:
    """fairseq-style table (common_layers.py:104): [sin | cos] halves."""
    half = dim // 2
    freq = np.exp(np.arange(half, dtype=np.float64) * -(math.log(10000.0) / (half - 1)))
    ang = np.arange(n_pos, dtype=np.float64)[:, None] * freq[None, :]
    emb = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    if dim % 2 == 1:
        emb = np.concatenate([emb, np.zeros((n_pos, 1))], axis=1)
    return emb.astype(np.float32)


def positions_like(nonpad: jnp.ndarray, padding_idx: int = 0) -> jnp.ndarray:
    """fairseq make_positions: pad→padding_idx, else padding_idx + cumsum."""
    return (jnp.cumsum(nonpad, axis=1) * nonpad + padding_idx).astype(jnp.int32)


class SinusoidalPositions(nn.Module):
    dim: int
    max_pos: int = 4096
    padding_idx: int = 0

    @nn.compact
    def __call__(self, nonpad: jnp.ndarray) -> jnp.ndarray:
        table = jnp.asarray(sinusoid_table(self.max_pos + 1 + self.padding_idx, self.dim))
        table = table.at[self.padding_idx].set(0.0)
        pos = positions_like(nonpad, self.padding_idx)
        return table[pos]


# ---------------------------------------------------------------------------
# FFT blocks
# ---------------------------------------------------------------------------


class BiasFreeMHA(nn.Module):
    """fairseq MultiheadAttention(bias=False) as used by EncSALayer."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, nonpad):
        d = self.dim
        h = self.heads
        qkv = nn.Dense(3 * d, use_bias=False, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(t.shape[0], t.shape[1], h, d // h)
        mask = nonpad[:, None, None, :] > 0  # key padding mask
        out = attention(split(q), split(k), split(v), mask=mask)
        out = out.reshape(x.shape)
        return nn.Dense(d, use_bias=False, name="out_proj")(out)


class FFTBlock(nn.Module):
    """EncSALayer: pre-LN self-attn + pre-LN conv-FFN, masked after each."""

    dim: int
    heads: int
    ffn_kernel: int

    @nn.compact
    def __call__(self, x, nonpad):
        m = nonpad[..., None]
        h = nn.LayerNorm(epsilon=1e-5, name="ln1")(x)
        x = (x + BiasFreeMHA(self.dim, self.heads, name="attn")(h, nonpad)) * m
        h = nn.LayerNorm(epsilon=1e-5, name="ln2")(x)
        h = nn.Conv(4 * self.dim, (self.ffn_kernel,), padding="SAME", name="ffn_conv")(h)
        h = h * self.ffn_kernel ** -0.5
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="ffn_out")(h)
        return (x + h) * m


class FFTBlocks(nn.Module):
    dim: int
    layers: int
    heads: int
    ffn_kernel: int
    use_pos_embed: bool = True
    use_last_norm: bool = True

    @nn.compact
    def __call__(self, x, nonpad):
        m = nonpad[..., None]
        if self.use_pos_embed:
            alpha = self.param("pos_alpha", nn.initializers.ones, (1,))
            x = x + alpha * SinusoidalPositions(self.dim, name="pos")(nonpad)
        x = x * m
        for i in range(self.layers):
            x = FFTBlock(self.dim, self.heads, self.ffn_kernel, name=f"layer_{i}")(x, nonpad)
        if self.use_last_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="ln")(x) * m
        return x


class ConvPredictor(nn.Module):
    """Shared conv stack for duration/pitch/energy predictors: n×(pad→conv→
    relu→channel-LN) → linear. Channel-LN == LayerNorm over C at each t."""

    hidden: int
    layers: int
    kernel: int
    odim: int
    with_pos: bool = False
    pos_dim: int = 0

    @nn.compact
    def __call__(self, x, nonpad=None, pos_nonpad=None):
        if self.with_pos:
            # the reference derives positions from `xs[..., 0] != 0`
            # (tts_modules.py:247) — i.e. padded frames get the zero embedding
            alpha = self.param("pos_alpha", nn.initializers.ones, (1,))
            if pos_nonpad is None:
                pos_nonpad = jnp.ones(x.shape[:2], x.dtype)
            x = x + alpha * SinusoidalPositions(self.pos_dim or x.shape[-1],
                                                name="pos")(pos_nonpad)
        for i in range(self.layers):
            x = nn.Conv(self.hidden, (self.kernel,), padding="SAME", name=f"conv_{i}")(x)
            x = jax.nn.relu(x)
            x = nn.LayerNorm(epsilon=1e-5, name=f"ln_{i}")(x)
            if nonpad is not None:
                x = x * nonpad[..., None]
        x = nn.Dense(self.odim, name="out")(x)
        if nonpad is not None:
            x = x * nonpad[..., None]
        return x


# ---------------------------------------------------------------------------
# FastSpeech2
# ---------------------------------------------------------------------------


class FastSpeech2(nn.Module):
    cfg: FastSpeech2Config

    def setup(self):
        cfg = self.cfg
        d = cfg.hidden_size
        self.embed = nn.Embed(cfg.vocab_size, d, name="embed_tokens")
        self.enc_pos = SinusoidalPositions(d, name="enc_pos")
        self.encoder = FFTBlocks(d, cfg.enc_layers, cfg.num_heads,
                                 cfg.enc_ffn_kernel_size, use_pos_embed=False,
                                 name="encoder")
        self.decoder = FFTBlocks(d, cfg.dec_layers, cfg.num_heads,
                                 cfg.dec_ffn_kernel_size, name="decoder")
        self.mel_out = nn.Dense(cfg.n_mels, name="mel_out")
        self.dur_predictor = ConvPredictor(cfg.pred_hidden, cfg.dur_predictor_layers,
                                           cfg.dur_predictor_kernel, 1,
                                           name="dur_predictor")
        if cfg.use_pitch_embed:
            self.pitch_embed = nn.Embed(300, d, name="pitch_embed")
            if cfg.pitch_type == "cwt":
                # 10 CWT scales + uv logit (fs2.py:191-203)
                self.cwt_predictor = ConvPredictor(
                    cfg.pred_hidden, cfg.predictor_layers,
                    cfg.predictor_kernel, 11, with_pos=True, pos_dim=d,
                    name="cwt_predictor")
                self.cwt_stats = nn.Dense(2, name="cwt_stats")
            else:
                self.pitch_predictor = ConvPredictor(
                    cfg.pred_hidden, cfg.predictor_layers, cfg.predictor_kernel,
                    2 if cfg.use_uv else 1, with_pos=True, pos_dim=d,
                    name="pitch_predictor")
        if cfg.use_energy_embed:
            self.energy_embed = nn.Embed(256, d, name="energy_embed")
            self.energy_predictor = ConvPredictor(
                cfg.pred_hidden, cfg.predictor_layers, cfg.predictor_kernel, 1,
                with_pos=True, pos_dim=d, name="energy_predictor")
        if cfg.num_spk > 0:
            self.spk_embed = nn.Embed(cfg.num_spk + 1, d, name="spk_embed")
        if cfg.use_midi:
            self.midi_embed = nn.Embed(300, d, name="midi_embed")
            self.midi_dur_layer = nn.Dense(d, name="midi_dur_layer")
            self.is_slur_embed = nn.Embed(2, d, name="is_slur_embed")

    def encode(self, tokens, pitch_midi=None, midi_dur=None, is_slur=None):
        """tokens [B, T] → encoder_out [B, T, H] (FastspeechEncoder:352;
        MIDI variant diffsinger_midi/fs2.py:57)."""
        cfg = self.cfg
        nonpad = (tokens > 0).astype(jnp.float32)
        x = self.embed(tokens) * math.sqrt(cfg.hidden_size)
        if cfg.use_midi and pitch_midi is not None:
            x = x + self.midi_embed(pitch_midi)
            if midi_dur is not None:
                x = x + self.midi_dur_layer(midi_dur[..., None])
            if is_slur is not None:
                x = x + self.is_slur_embed(is_slur)
        if cfg.rel_pos:
            # ESPnet RelPositionalEncoding (espnet_positional_embedding.py:89):
            # x*sqrt(d) + reversed interleaved sin/cos table. The reference
            # builds the reversed table once at max_len=5000 and slices its
            # head, so row i carries position 4999-i (extend_pe never
            # re-runs for shorter inputs) — matched here for weight parity.
            t = tokens.shape[1]
            d = cfg.hidden_size
            pos = jnp.arange(4999, 4999 - t, -1.0)[:, None]
            div = jnp.exp(jnp.arange(0, d, 2) * -(math.log(10000.0) / d))
            pe = jnp.zeros((t, d))
            pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
            pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
            x = x * math.sqrt(d) + pe[None]
        else:
            x = x + self.enc_pos(nonpad)
        return self.encoder(x, nonpad), nonpad

    @staticmethod
    def expand_states(h, mel2ph):
        """Gather token states to frames; mel2ph==0 → zeros (fs2.py:246)."""
        h = jnp.pad(h, ((0, 0), (1, 0), (0, 0)))
        return jnp.take_along_axis(h, mel2ph[..., None], axis=1)

    def __call__(self, tokens, mel2ph=None, f0=None, uv=None, spk_id=None,
                 pitch_midi=None, midi_dur=None, is_slur=None,
                 infer: bool = False):
        """Returns dict: mel_out [B, F, n_mels], dur (log-domain pred),
        mel2ph, pitch_pred, f0_denorm. Training passes gt mel2ph/f0/uv;
        inference predicts them (static F = cfg.max_frames)."""
        cfg = self.cfg
        ret = {}
        encoder_out, src_nonpad = self.encode(tokens, pitch_midi, midi_dur, is_slur)

        spk = 0.0
        if cfg.num_spk > 0 and spk_id is not None:
            spk = self.spk_embed(spk_id)[:, None, :]

        # --- duration
        dur_inp = (encoder_out + spk) * src_nonpad[..., None]
        dur_log = self.dur_predictor(dur_inp, src_nonpad)[..., 0]  # log domain
        ret["dur"] = dur_log
        if mel2ph is None:
            dur = jnp.clip(jnp.round(jnp.exp(dur_log) - 1.0), 0, None)
            dur = dur * src_nonpad
            mel2ph = length_regulator(dur, cfg.max_frames)
        ret["mel2ph"] = mel2ph

        decoder_inp = self.expand_states(encoder_out, mel2ph)
        tgt_nonpad = (mel2ph > 0).astype(jnp.float32)

        # --- pitch (fs2.py:174-221; 'frame' and 'cwt' branches)
        if cfg.use_pitch_embed:
            pitch_inp = (decoder_inp + spk) * tgt_nonpad[..., None]
            if cfg.pitch_type == "cwt":
                cwt_out = self.cwt_predictor(
                    pitch_inp,
                    nonpad=tgt_nonpad if cfg.predictor_mask_pad else None,
                    pos_nonpad=tgt_nonpad)
                ret["cwt"] = cwt_out
                stats = self.cwt_stats(encoder_out[:, 0])  # [B, 2] (fs2.py:194)
                mean, std = stats[:, 0], stats[:, 1]
                std = std * cfg.cwt_std_scale
                ret["f0_mean"], ret["f0_std"] = mean, std
                if f0 is None:
                    from audiogpt_tpu.dsp.f0 import cwt2f0

                    f0_hz = cwt2f0(cwt_out[..., :10], mean, std)
                    f0 = norm_f0(f0_hz, None, cfg)
                if cfg.use_uv and uv is None:
                    uv = (cwt_out[..., -1] > 0).astype(jnp.float32)
            else:
                pitch_pred = self.pitch_predictor(
                    pitch_inp,
                    nonpad=tgt_nonpad if cfg.predictor_mask_pad else None,
                    pos_nonpad=tgt_nonpad,
                )
                ret["pitch_pred"] = pitch_pred
                if f0 is None:
                    f0 = pitch_pred[..., 0]
                if cfg.use_uv and uv is None:
                    uv = (pitch_pred[..., 1] > 0).astype(jnp.float32)
            f0_denorm = denorm_f0(f0, uv, cfg, pitch_padding=mel2ph == 0)
            ret["f0_denorm"] = f0_denorm
            pitch = f0_to_coarse(f0_denorm)
            decoder_inp = decoder_inp + self.pitch_embed(pitch)

        if cfg.use_energy_embed:
            energy_pred = self.energy_predictor(
                (decoder_inp + spk) * tgt_nonpad[..., None])[..., 0]
            ret["energy_pred"] = energy_pred
            e = jnp.clip(energy_pred * 256 // 4, 0, 255).astype(jnp.int32)
            decoder_inp = decoder_inp + self.energy_embed(e)

        decoder_inp = (decoder_inp + spk) * tgt_nonpad[..., None]
        ret["decoder_inp"] = decoder_inp
        x = self.decoder(decoder_inp, tgt_nonpad)
        ret["mel_out"] = self.mel_out(x) * tgt_nonpad[..., None]
        return ret
