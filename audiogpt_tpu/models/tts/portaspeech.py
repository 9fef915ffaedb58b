"""PortaSpeech / SyntaSpeech — word-level VAE TTS with a flow-enhanced prior.

The reference ships the PortaSpeech task and configs but the model package is
**missing from its tree**: ``tasks/tts/ps.py:6`` imports
``modules.portaspeech.portaspeech`` and ``modules/syntaspeech/syntaspeech.py:12``
imports ``modules.portaspeech.fvae`` — neither exists under
``NeuralSeq/modules/`` (SURVEY.md §2.2/§2.3), so both its TTS tool
(``audio-chatgpt.py:275``) and SyntaSpeech are unrunnable upstream. This is a
ground-up TPU-native rebuild from the surviving surface:

  * hyperparameters: ``egs/egs_bases/tts/ps.yaml`` (hidden 192, word-level
    durations, FVAE latent 16 / stride 4 / enc 8 dec 4 layers, prior flow
    64×4 blocks) and ``ps_flow_small.yaml``,
  * the word-level linguistic encoder + word-to-mel attention wiring, FVAE
    call contract and KL bookkeeping: ``modules/syntaspeech/syntaspeech.py``
    (run_text_encoder:149, attention:194, run_decoder:211, forward_dur:234,
    get_pos_embed:259),
  * losses: ``tasks/tts/ps.py`` (KL ramp + clamp:55-59, word/sent duration
    L1 in log domain:86-101),
  * the syntactic extension: ``modules/syntaspeech/syntactic_graph_encoder.py``
    (two GatedGraphConv layers over typed word graphs) and
    ``tts_modules.py:145`` (SyntaDurationPredictor).

TPU-first design points:
  * static shapes end to end — phones/words/frames all live on bucketed
    canvases; word grouping and in-word positions are one-hot matmuls on the
    MXU instead of ``scatter_add``/boolean indexing,
  * the dgl sparse GGNN becomes a dense per-edge-type adjacency einsum
    (``[B,E,W,W] x [B,W,H]``) — words per utterance are small, the dense
    form is faster than gather/scatter on TPU and jit-stable,
  * the whole text→mel graph (encoder, duration, attention expansion, prior
    flow, FVAE decoder) is ONE jit program; the reference crosses the python
    boundary per submodule,
  * posterior sampling / prior noise are explicit ``rng`` arguments (pure
    function; the reference mutates global torch RNG state).

``use_graph=True`` selects SyntaSpeech (graph-aux duration predictor and
graph-conditioned prior), ``False`` plain PortaSpeech.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from audiogpt_tpu.models.tts.fastspeech2 import (
    FFTBlocks, length_regulator,
)


@dataclasses.dataclass(frozen=True)
class PortaSpeechConfig:
    ph_vocab_size: int = 100
    word_vocab_size: int = 100
    hidden_size: int = 192          # ps.yaml hidden_size
    enc_layers: int = 4
    word_enc_layers: int = 4
    num_heads: int = 2
    enc_ffn_kernel_size: int = 5
    #: 'rel_fft' = relative-window transformer (ps.yaml encoder_type /
    #: word_encoder_type; ops/rel_attention.py); 'fft' = plain FFT blocks
    encoder_type: str = "rel_fft"
    rel_window: int = 4             # rel_transformer.py window_size default
    dur_predictor_layers: int = 3
    dur_predictor_kernel: int = 5
    n_mels: int = 80
    max_frames: int = 1024          # static mel canvas (multiple of strides)
    frames_multiple: int = 4        # ps.yaml frames_multiple
    # FVAE (ps.yaml `## fvae`)
    latent_size: int = 16
    fvae_hidden: int = 192
    fvae_kernel: int = 5
    fvae_enc_layers: int = 8
    fvae_dec_layers: int = 4
    fvae_strides: int = 4
    # prior flow (ps.yaml `# prior flow`)
    use_prior_flow: bool = True
    prior_flow_hidden: int = 64
    prior_flow_kernel: int = 3
    prior_flow_blocks: int = 4
    # SyntaSpeech extension
    use_graph: bool = False
    graph_steps: int = 5            # GatedGraphConv n_steps (graph_encoder.py:41)
    n_edge_types: int = 6
    num_spk: int = 0
    text_encoder_postnet: bool = True


# ---------------------------------------------------------------------------
# word-level helpers (align_ops / seq_utils equivalents, matmul form)
# ---------------------------------------------------------------------------


def word_onehot(x2word: jnp.ndarray, max_words: int) -> jnp.ndarray:
    """membership [B, W, T]: 1 where token t belongs to word w (1-based)."""
    return (x2word[:, None, :] ==
            jnp.arange(1, max_words + 1)[None, :, None]).astype(jnp.float32)


def group_hidden_by_words(h: jnp.ndarray, x2word: jnp.ndarray,
                          max_words: int) -> jnp.ndarray:
    """Mean-pool token states into word states [B, W, H]
    (``group_hidden_by_segs``, syntactic_graph_encoder.py:16 — scatter_add
    there, one-hot matmul on the MXU here)."""
    onehot = word_onehot(x2word, max_words)              # [B, W, T]
    cnt = jnp.maximum(onehot.sum(-1, keepdims=True), 1.0)
    return jnp.einsum("bwt,bth->bwh", onehot, h) / cnt


def expand_word_states(h_word: jnp.ndarray, x2word: jnp.ndarray) -> jnp.ndarray:
    """Gather word states to token/frame positions; index 0 → zeros."""
    h = jnp.pad(h_word, ((0, 0), (1, 0), (0, 0)))
    return jnp.take_along_axis(h, x2word[..., None], axis=1)


def in_word_position(x2word: jnp.ndarray, max_words: int) -> jnp.ndarray:
    """Fractional position of each token inside its word, in (0, 1]
    (``get_pos_embed``, syntaspeech.py:259-263). Padding (word 0) → 0."""
    member = word_onehot(x2word, max_words)              # [B, W, T]
    cum = jnp.cumsum(member, axis=-1) * member
    frac = cum / jnp.maximum(member.sum(-1, keepdims=True), 1.0)
    return frac.sum(1)                                   # [B, T]


def clip_mel2word_to_multiple(mel2word: jnp.ndarray, multiple: int) -> jnp.ndarray:
    """Truncate the utterance to a frame count divisible by ``multiple``
    (``clip_mel2token_to_multiple``, align_ops.py) on the static canvas."""
    n = (mel2word > 0).sum(1)
    keep = jnp.arange(mel2word.shape[1])[None, :] < ((n // multiple) * multiple)[:, None]
    return mel2word * keep


def mel2word_to_dur(mel2word: jnp.ndarray, max_words: int) -> jnp.ndarray:
    """Frames per word [B, W] (``mel2token_to_dur``, utils/tts_utils.py)."""
    return word_onehot(mel2word, max_words).sum(-1)


class ContinuousSinPos(nn.Module):
    """Sinusoidal embedding of real-valued positions (SinusoidalPosEmb,
    syntaspeech.py:17 — [sin | cos] halves over a log-spaced frequency bank)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        half = self.dim // 2
        freq = jnp.exp(jnp.arange(half) * -(math.log(10000.0) / (half - 1)))
        ang = x[..., None] * freq
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


# ---------------------------------------------------------------------------
# syntactic graph encoder (dense GGNN)
# ---------------------------------------------------------------------------


class GRUUpdate(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, msg, h):
        rz = nn.Dense(2 * self.hidden, name="x_rz")(msg) + \
            nn.Dense(2 * self.hidden, use_bias=False, name="h_rz")(h)
        r, z = jnp.split(jax.nn.sigmoid(rz), 2, axis=-1)
        n = jnp.tanh(nn.Dense(self.hidden, name="x_n")(msg) +
                     r * nn.Dense(self.hidden, use_bias=False, name="h_n")(h))
        return (1.0 - z) * n + z * h


class GatedGraphConv(nn.Module):
    """GGNN layer: per-edge-type linear messages aggregated over a dense
    adjacency, GRU state update, weights shared across steps (dgl
    ``GatedGraphConv`` semantics, syntactic_graph_encoder.py:41)."""

    hidden: int
    steps: int = 5
    n_etypes: int = 6

    @nn.compact
    def __call__(self, h, adj, mask):
        """h [B,W,H]; adj [B,E,W,W] (adj[b,e,i,j]: edge j→i); mask [B,W,1]."""
        w_e = self.param("etype_kernel", nn.initializers.lecun_normal(),
                         (self.n_etypes, self.hidden, self.hidden))
        gru = GRUUpdate(self.hidden, name="gru")
        for _ in range(self.steps):
            msg = jnp.einsum("beij,bjh,ehk->bik", adj, h, w_e)
            h = gru(msg, h) * mask
        return h


class GraphAuxEnc(nn.Module):
    """Two stacked GGC layers with skip connections over word states
    (``GraphAuxEnc``, syntactic_graph_encoder.py:33)."""

    hidden: int
    steps: int = 5
    n_etypes: int = 6

    @nn.compact
    def __call__(self, h_word, adj, word_mask):
        m = word_mask[..., None]
        h1 = GatedGraphConv(self.hidden, self.steps, self.n_etypes,
                            name="ggc1")(h_word * m, adj, m) + h_word * m
        h2 = GatedGraphConv(self.hidden, self.steps, self.n_etypes,
                            name="ggc2")(h1, adj, m)
        return (h1 + h2) * m


# ---------------------------------------------------------------------------
# FVAE
# ---------------------------------------------------------------------------


class ResConvStack(nn.Module):
    """Residual LN→cond-add→conv→gelu blocks (the FVAE 'conv' encoder/decoder
    type, ps.yaml fvae_encoder_type/fvae_decoder_type: conv)."""

    hidden: int
    layers: int
    kernel: int

    @nn.compact
    def __call__(self, x, cond=None, mask=None):
        for i in range(self.layers):
            h = nn.LayerNorm(name=f"ln{i}")(x)
            if cond is not None:
                h = h + nn.Dense(self.hidden, name=f"cond{i}")(cond)
            h = nn.Conv(self.hidden, (self.kernel,), padding="SAME",
                        name=f"conv{i}")(h)
            x = x + jax.nn.gelu(h, approximate=False)
            if mask is not None:
                x = x * mask
        return x


class FVAEEncoder(nn.Module):
    cfg: PortaSpeechConfig

    @nn.compact
    def __call__(self, mels, cond_lat, lat_mask):
        """mels [B,F,80] → posterior (m, logs) at the latent rate [B,F/s,16]."""
        cfg = self.cfg
        s = cfg.fvae_strides
        h = nn.Conv(cfg.fvae_hidden, (2 * s,), strides=(s,), name="down")(mels)
        h = h * lat_mask
        h = ResConvStack(cfg.fvae_hidden, cfg.fvae_enc_layers,
                         cfg.fvae_kernel, name="stack")(h, cond_lat, lat_mask)
        # zero-init: the posterior starts at N(0, I) (m=0, logs=0) so the KL
        # term begins near zero instead of exp(logs) exploding on the
        # unnormalized conv features.
        stats = nn.Dense(2 * cfg.latent_size, name="proj",
                         kernel_init=nn.initializers.zeros)(h) * lat_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        return m, logs


class FVAEDecoder(nn.Module):
    cfg: PortaSpeechConfig

    @nn.compact
    def __call__(self, z, cond_lat, lat_mask, frame_mask):
        cfg = self.cfg
        s = cfg.fvae_strides
        h = nn.Dense(cfg.fvae_hidden, name="pre")(z) * lat_mask
        h = ResConvStack(cfg.fvae_hidden, cfg.fvae_dec_layers,
                         cfg.fvae_kernel, name="stack")(h, cond_lat, lat_mask)
        h = nn.ConvTranspose(cfg.fvae_hidden, (2 * s,), strides=(s,),
                             name="up")(h)
        h = h[:, : frame_mask.shape[1]] * frame_mask
        return nn.Dense(cfg.n_mels, name="out")(h) * frame_mask


class CondCoupling(nn.Module):
    """Mean-only affine coupling over the latent, conditioned on the text
    encoding (volume-preserving ⇒ zero log-det; the prior flow of
    PortaSpeech's FVAE, ps.yaml use_prior_flow)."""

    latent: int
    hidden: int
    kernel: int

    @nn.compact
    def __call__(self, x, cond, mask, reverse: bool = False):
        half = self.latent // 2
        xa, xb = x[..., :half], x[..., half:]
        h = nn.Dense(self.hidden, name="pre")(xa) + \
            nn.Dense(self.hidden, name="cond")(cond)
        h = h * mask
        h = nn.Conv(self.hidden, (self.kernel,), padding="SAME", name="conv")(h)
        h = jax.nn.gelu(h, approximate=False) * mask
        m = nn.Dense(half, kernel_init=nn.initializers.zeros, name="post")(h)
        xb = (xb + m) * mask if not reverse else (xb - m) * mask
        return jnp.concatenate([xa, xb], axis=-1)


class PriorFlow(nn.Module):
    cfg: PortaSpeechConfig

    def setup(self):
        cfg = self.cfg
        self.flows = [CondCoupling(cfg.latent_size, cfg.prior_flow_hidden,
                                   cfg.prior_flow_kernel, name=f"f{i}")
                      for i in range(cfg.prior_flow_blocks)]

    def __call__(self, z, cond, mask, reverse: bool = False):
        if not reverse:                      # z (posterior) → z_p (prior space)
            for f in self.flows:
                z = f(z, cond, mask)
                z = jnp.flip(z, axis=-1)
        else:                                # prior noise → z for the decoder
            for f in reversed(self.flows):
                z = jnp.flip(z, axis=-1)
                z = f(z, cond, mask, reverse=True)
        return z


# ---------------------------------------------------------------------------
# duration predictor (word-level, optionally graph-augmented)
# ---------------------------------------------------------------------------


class WordDurationPredictor(nn.Module):
    """Phone-level conv stack → softplus frame counts, summed per word
    (``SyntaDurationPredictor`` tts_modules.py:145 + ``forward_dur``
    syntaspeech.py:234-257). With ``use_graph`` the phone input is augmented
    by the GGNN encoding of its word (gathered back to phones)."""

    cfg: PortaSpeechConfig

    @nn.compact
    def __call__(self, x, src_nonpad, ph2word, max_words, graph_adj=None):
        cfg = self.cfg
        if cfg.use_graph and graph_adj is not None:
            word_mask = (word_onehot(ph2word, max_words).sum(-1) > 0
                         ).astype(jnp.float32)
            h_word = group_hidden_by_words(x, ph2word, max_words)
            g = GraphAuxEnc(cfg.hidden_size, cfg.graph_steps,
                            cfg.n_edge_types, name="graph_enc")(
                h_word, graph_adj, word_mask)
            x = x + expand_word_states(g, ph2word)
        h = x
        for i in range(cfg.dur_predictor_layers):
            h = nn.Conv(cfg.hidden_size, (cfg.dur_predictor_kernel,),
                        padding="SAME", name=f"conv{i}")(h)
            h = jax.nn.relu(h)
            h = nn.LayerNorm(name=f"ln{i}")(h)
            h = h * src_nonpad[..., None]
        ph_dur = jax.nn.softplus(nn.Dense(1, name="out")(h)[..., 0])
        ph_dur = ph_dur * src_nonpad                       # [B, T_ph] frames
        onehot = word_onehot(ph2word, max_words)           # [B, W, T_ph]
        return jnp.einsum("bwt,bt->bw", onehot, ph_dur)    # word durations


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


class PortaSpeech(nn.Module):
    cfg: PortaSpeechConfig

    def setup(self):
        cfg = self.cfg
        d = cfg.hidden_size
        self.ph_embed = nn.Embed(cfg.ph_vocab_size, d, name="ph_embed")
        self.word_embed = nn.Embed(cfg.word_vocab_size, d, name="word_embed")
        if cfg.encoder_type == "rel_fft":
            from audiogpt_tpu.ops.rel_attention import RelTransformerEncoder

            def rel_enc(layers, name):
                return RelTransformerEncoder(
                    0, d, 4 * d, cfg.num_heads, layers,
                    cfg.enc_ffn_kernel_size, cfg.rel_window, name=name)

            self.encoder = rel_enc(cfg.enc_layers, "encoder")
            self.word_encoder = rel_enc(cfg.word_enc_layers, "word_encoder")
            self.ph2word_encoder = rel_enc(cfg.word_enc_layers,
                                           "ph2word_encoder")
        else:
            self.encoder = FFTBlocks(d, cfg.enc_layers, cfg.num_heads,
                                     cfg.enc_ffn_kernel_size, name="encoder")
            self.word_encoder = FFTBlocks(d, cfg.word_enc_layers,
                                          cfg.num_heads,
                                          cfg.enc_ffn_kernel_size,
                                          name="word_encoder")
            self.ph2word_encoder = FFTBlocks(d, cfg.word_enc_layers,
                                             cfg.num_heads,
                                             cfg.enc_ffn_kernel_size,
                                             use_pos_embed=False,
                                             name="ph2word_encoder")
        self.sin_pos = ContinuousSinPos(d, name="sin_pos")
        self.enc_pos_proj = nn.Dense(d, name="enc_pos_proj")
        self.dec_res_proj = nn.Dense(d, name="dec_res_proj")
        if cfg.text_encoder_postnet:
            self.postnet = ResConvStack(d, 3, 5, name="text_postnet")
        else:
            self.dec_query_proj = nn.Dense(d, name="dec_query_proj")
        self.attn_q = nn.Dense(d, use_bias=False, name="attn_q")
        self.attn_k = nn.Dense(d, use_bias=False, name="attn_k")
        self.attn_v = nn.Dense(d, use_bias=False, name="attn_v")
        self.attn_o = nn.Dense(d, use_bias=False, name="attn_o")
        self.word_pos_proj = nn.Dense(d, name="word_pos_proj")
        self.dur_predictor = WordDurationPredictor(cfg, name="dur_predictor")
        self.fvae_enc = FVAEEncoder(cfg, name="fvae_enc")
        self.fvae_dec = FVAEDecoder(cfg, name="fvae_dec")
        if cfg.use_prior_flow:
            self.prior_flow = PriorFlow(cfg, name="prior_flow")
        if cfg.use_graph:
            self.prior_graph_enc = GraphAuxEnc(cfg.hidden_size,
                                               cfg.graph_steps,
                                               cfg.n_edge_types,
                                               name="prior_graph_enc")
            self.prior_graph_proj = nn.Dense(cfg.hidden_size,
                                             kernel_init=nn.initializers.zeros,
                                             name="prior_graph_proj")
        if cfg.num_spk > 0:
            self.spk_embed = nn.Embed(cfg.num_spk + 1, d, name="spk_embed")

    # -- word-to-mel attention expansion (syntaspeech.py:194-209) -----------
    def _attention(self, ph_kv_inp, dec_inp, word_mask_ft):
        d = self.cfg.hidden_size
        q = self.attn_q(dec_inp)
        k = self.attn_k(ph_kv_inp)
        v = self.attn_v(ph_kv_inp)
        scores = jnp.einsum("bfd,btd->bft", q, k) / math.sqrt(d)
        scores = jnp.where(word_mask_ft > 0, scores, -1e9)
        w = jax.nn.softmax(scores, axis=-1)
        return self.attn_o(jnp.einsum("bft,btd->bfd", w, v)), w

    def __call__(self, txt_tokens, word_tokens, ph2word, mel2word=None,
                 tgt_mels=None, graph_adj=None, spk_id=None,
                 infer: bool = False, rng: jax.Array | None = None,
                 noise_scale: float = 1.0):
        """txt_tokens [B,T_ph], word_tokens [B,W], ph2word [B,T_ph] (1-based,
        0 = pad). Training: pass mel2word + tgt_mels (+rng). Inference:
        durations are predicted onto the static ``max_frames`` canvas.

        Returns dict: mel_out [B,F,80], kl (scalar), dur [B,W] (linear
        frames), mel2word, attn [B,F,T_ph], z_q/z_p diagnostics.
        """
        cfg = self.cfg
        ret: dict = {}
        if rng is None:
            rng = jax.random.PRNGKey(0)
        max_words = word_tokens.shape[1]
        src_nonpad = (txt_tokens > 0).astype(jnp.float32)
        word_nonpad = (word_tokens > 0).astype(jnp.float32)

        style = 0.0
        if cfg.num_spk > 0 and spk_id is not None:
            style = self.spk_embed(spk_id)[:, None, :]

        # --- linguistic encoder (run_text_encoder, syntaspeech.py:149)
        d = cfg.hidden_size
        ph_x = self.ph_embed(txt_tokens) * math.sqrt(d)
        ph_enc = self.encoder(ph_x, src_nonpad) * src_nonpad[..., None] + style
        word_emb_enc = self.word_encoder(
            self.word_embed(word_tokens) * math.sqrt(d), word_nonpad)
        ph_enc = ph_enc + expand_word_states(word_emb_enc + style, ph2word)
        ph_enc = ph_enc * src_nonpad[..., None]

        # word-level encoding: phone states grouped by word, re-encoded
        h_gb_word = group_hidden_by_words(ph_enc, ph2word, max_words)
        word_enc = self.ph2word_encoder(h_gb_word, word_nonpad) + word_emb_enc

        # --- word durations (forward_dur, syntaspeech.py:234)
        dur = self.dur_predictor(ph_enc * src_nonpad[..., None], src_nonpad,
                                 ph2word, max_words, graph_adj)
        ret["dur"] = dur
        if mel2word is None:
            mel2word = length_regulator(dur, cfg.max_frames)
            mel2word = clip_mel2word_to_multiple(mel2word, cfg.frames_multiple)
        ret["mel2word"] = mel2word
        tgt_nonpad = (mel2word > 0).astype(jnp.float32)

        # --- word-to-mel attention expansion
        enc_pos = self.sin_pos(in_word_position(ph2word, max_words))
        dec_pos = self.sin_pos(in_word_position(mel2word, max_words))
        ph_kv = self.enc_pos_proj(jnp.concatenate([ph_enc, enc_pos], -1))
        word_expand = expand_word_states(word_enc, mel2word)
        dec_inp_cat = jnp.concatenate([word_expand, dec_pos], -1)
        if cfg.text_encoder_postnet:
            x_res = self.postnet(self.dec_res_proj(dec_inp_cat),
                                 mask=tgt_nonpad[..., None])
            dec_q = x_res
        else:
            dec_q = self.dec_query_proj(dec_inp_cat)
            x_res = self.dec_res_proj(dec_inp_cat)
        # frame f may only attend to phones of its own word
        word_mask_ft = jnp.einsum("bwf,bwt->bft",
                                  word_onehot(mel2word, max_words),
                                  word_onehot(ph2word, max_words))
        attn_out, attn_w = self._attention(ph_kv, dec_q, word_mask_ft)
        ret["attn"] = attn_w
        x = attn_out + x_res
        x = x + self.word_pos_proj(dec_pos)          # add_word_pos: true
        x = (x + style) * tgt_nonpad[..., None]
        ret["decoder_inp"] = x

        # --- FVAE decode (run_decoder, syntaspeech.py:211)
        s = cfg.fvae_strides
        lat_mask = tgt_nonpad[:, ::s, None]
        cond_lat = x[:, ::s]                          # strided text condition
        prior_cond = cond_lat
        if cfg.use_graph and graph_adj is not None:
            # SyntaFVAE: GGNN over word-grouped condition feeds the prior
            g = self.prior_graph_enc(
                group_hidden_by_words(x, mel2word, max_words), graph_adj,
                (word_onehot(mel2word, max_words).sum(-1) > 0
                 ).astype(jnp.float32))
            prior_cond = prior_cond + self.prior_graph_proj(
                expand_word_states(g, mel2word)[:, ::s])
        frame_mask = tgt_nonpad[..., None]

        if not infer:
            m_q, logs_q = self.fvae_enc(tgt_mels, cond_lat, lat_mask)
            eps = jax.random.normal(rng, m_q.shape)
            z_q = (m_q + jnp.exp(logs_q) * eps) * lat_mask
            z_p = self.prior_flow(z_q, prior_cond, lat_mask) \
                if cfg.use_prior_flow else z_q
            # KL(q || p) with p = flow-pulled N(0, I); volume-preserving
            # couplings ⇒ no log-det term.
            kl_elem = -logs_q + 0.5 * (z_p ** 2 - eps ** 2)
            denom = jnp.maximum(lat_mask.sum() * cfg.latent_size, 1.0)
            ret["kl"] = (kl_elem * lat_mask).sum() / denom
            ret["m_q"], ret["logs_q"], ret["z_p"] = m_q, logs_q, z_p
            z = z_q
        else:
            zshape = (x.shape[0], cfg.max_frames // s, cfg.latent_size)
            z = jax.random.normal(rng, zshape) * noise_scale * lat_mask
            if cfg.use_prior_flow:
                z = self.prior_flow(z, prior_cond, lat_mask, reverse=True)
            ret["kl"] = jnp.zeros(())
        ret["mel_out"] = self.fvae_dec(z, cond_lat, lat_mask, frame_mask)
        return ret
