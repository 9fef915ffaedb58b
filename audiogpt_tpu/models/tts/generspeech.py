"""GenerSpeech — style-transfer TTS for out-of-domain voices (TTS_OOD tool).

Reference: ``NeuralSeq/modules/GenerSpeech/model/generspeech.py:15``
(``GenerSpeech(FastSpeech2)``): global style = projected speaker + emotion
embeddings (external encoders in the reference); local style = three
``LocalStyleAdaptor`` branches (utterance / phoneme / word level — ConvBlocks
mel encoder + EMA vector-quantization, ``prosody_util.py:172,16``) aligned to
the text sequence by a 2-layer cross-attention ``ProsodyAligner``
(``prosody_util.py:129``); ``MixStyle`` feature-statistics mixing for domain
generalization (``mixstyle.py``); a pitch "inpainter" predictor blending
domain-agnostic and domain-specific inputs; and a Glow post-flow refining the
mel conditioned on [mel, text, spk, emo, prosody]
(``glow_modules.py``, ``run_post_glow`` at generspeech.py:233).

TPU re-design notes:
  * all three style branches run as ONE jitted program; VQ EMA updates live
    in a flax ``vq_stats`` mutable collection (the reference mutates module
    buffers in-place),
  * the external speaker/emotion encoders (resemblyzer + a wav2vec2-based
    emotion ckpt) are replaced by a built-in GST-style reference encoder
    (``GlobalStyleEncoder``) emitting both 256-d embeddings — documented
    substitution, same conditioning surface,
  * the Glow post-flow is a real invertible flow (actnorm + invertible 1×1 +
    WaveNet affine coupling, squeeze 2) with forward log-likelihood for
    training and reverse sampling for inference, expressed with static
    shapes so both directions jit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audiogpt_tpu.models.tts.fastspeech2 import (
    ConvPredictor, FastSpeech2Config, FFTBlocks, SinusoidalPositions,
    denorm_f0, f0_to_coarse, length_regulator,
)
from audiogpt_tpu.ops.attention import attention


# ---------------------------------------------------------------------------
# Style modules
# ---------------------------------------------------------------------------


class VQEmbeddingEMA(nn.Module):
    """Vector quantizer (``prosody_util.py:16``; k-means init replaced by
    normal init).

    Two codebook-learning modes:
      * ``ema=True`` (reference behavior): EMA updates via the ``vq_stats``
        mutable collection — for training loops that thread mutable state;
      * ``ema=False``: codebook is a regular parameter trained by the
        VQ-VAE codebook loss ``‖sg(x) − e‖²`` (the task adds it) — plays
        directly with the jitted Trainer step (no mutable state).
    """

    n_codes: int = 64
    dim: int = 256
    decay: float = 0.999
    epsilon: float = 1e-5
    ema: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x [B, T, D] → (quantized straight-through, indices, raw_quant)."""
        init = lambda rng=None: jax.random.normal(
            jax.random.PRNGKey(0), (self.n_codes, self.dim)) * 0.1
        if self.ema:
            emb_var = self.variable("vq_stats", "embedding", init)
            ema_w = self.variable("vq_stats", "ema_weight",
                                  lambda: emb_var.value)
            ema_n = self.variable("vq_stats", "ema_count",
                                  lambda: jnp.ones((self.n_codes,)))
            embedding = emb_var.value
        else:
            embedding = self.param("embedding", lambda rng: init())

        flat = x.reshape(-1, self.dim)
        d = (jnp.sum(flat ** 2, 1, keepdims=True)
             - 2 * flat @ embedding.T
             + jnp.sum(embedding ** 2, 1)[None])
        idx = jnp.argmin(d, axis=-1)
        quant = embedding[idx].reshape(x.shape)

        if self.ema and train and not self.is_initializing():
            onehot = jax.nn.one_hot(idx, self.n_codes)
            n = onehot.sum(0)
            dw = onehot.T @ flat
            new_count = self.decay * ema_n.value + (1 - self.decay) * n
            new_weight = self.decay * ema_w.value + (1 - self.decay) * dw
            tot = new_count.sum()
            stable = (new_count + self.epsilon) / \
                (tot + self.n_codes * self.epsilon) * tot
            ema_n.value = new_count
            ema_w.value = new_weight
            emb_var.value = new_weight / stable[:, None]

        # straight-through estimator
        quant_st = x + jax.lax.stop_gradient(quant - x)
        return quant_st, idx.reshape(x.shape[:-1]), quant


class ConvStack(nn.Module):
    """Non-causal residual conv encoder over ref mels
    (``ConvBlocks(80, hidden, [1]*5, 5)`` in ``prosody_util.py:175``)."""

    hidden: int
    layers: int = 5
    kernel: int = 5

    @nn.compact
    def __call__(self, mel, nonpad=None):
        x = nn.Dense(self.hidden, name="inp")(mel)
        for i in range(self.layers):
            h = nn.LayerNorm(name=f"ln{i}")(x)
            h = nn.Conv(self.hidden, (self.kernel,), padding="SAME",
                        name=f"conv{i}")(h)
            x = x + jax.nn.gelu(h)
            if nonpad is not None:
                x = x * nonpad[..., None]
        return x


class LocalStyleAdaptor(nn.Module):
    """Ref-mel → VQ-quantized local style sequence (``prosody_util.py:172``)."""

    hidden: int
    n_codes: int = 64
    vq_ema: bool = True

    @nn.compact
    def __call__(self, ref_mel, ref_nonpad=None, train: bool = False):
        h = ConvStack(self.hidden, name="encoder")(ref_mel, ref_nonpad)
        quant, idx, raw = VQEmbeddingEMA(self.n_codes, self.hidden,
                                         ema=self.vq_ema,
                                         name="vq")(h, train=train)
        commit = jnp.mean((h - jax.lax.stop_gradient(raw)) ** 2)
        if not self.vq_ema:
            # codebook loss replaces the EMA update (VQ-VAE eq. 3)
            commit = commit + jnp.mean(
                (jax.lax.stop_gradient(h) - raw) ** 2)
        return quant, commit


class ProsodyAligner(nn.Module):
    """Cross-attention text←style aligner (``prosody_util.py:129``): 2 post-LN
    layers, 2 heads; returns the aligned style plus a guided-attention loss
    encouraging near-diagonal alignment (``_make_guided_attention_mask``)."""

    hidden: int
    num_layers: int = 2
    heads: int = 2
    guided_sigma: float = 0.3

    @nn.compact
    def __call__(self, text_h, style_h, text_nonpad, style_nonpad):
        x = text_h
        guided_loss = 0.0
        mask = (style_nonpad[:, None, None, :] > 0)
        for li in range(self.num_layers):
            def split(t):
                return t.reshape(t.shape[0], t.shape[1], self.heads, -1)

            q = nn.Dense(self.hidden, name=f"q{li}")(x)
            k = nn.Dense(self.hidden, name=f"k{li}")(style_h)
            v = nn.Dense(self.hidden, name=f"v{li}")(style_h)
            attn_out = attention(split(q), split(k), split(v), mask=mask)
            attn_out = attn_out.reshape(x.shape)
            x = nn.LayerNorm(name=f"ln1_{li}")(
                x + nn.Dense(self.hidden, name=f"o{li}")(attn_out))
            h = nn.Dense(self.hidden * 4, name=f"ff1_{li}")(x)
            x = nn.LayerNorm(name=f"ln2_{li}")(
                x + nn.Dense(self.hidden, name=f"ff2_{li}")(jax.nn.relu(h)))

            # guided attention loss on the average head weights
            tl = text_nonpad.sum(-1, keepdims=True)   # [B,1]
            sl = style_nonpad.sum(-1, keepdims=True)
            ti = jnp.arange(text_h.shape[1])[None, :, None]
            si = jnp.arange(style_h.shape[1])[None, None, :]
            w = 1.0 - jnp.exp(-((ti / jnp.maximum(tl[..., None], 1)
                                 - si / jnp.maximum(sl[..., None], 1)) ** 2)
                              / (2 * self.guided_sigma ** 2))
            pair_mask = text_nonpad[:, :, None] * style_nonpad[:, None, :]
            # recompute attn probs cheaply for the loss (same q/k)
            logits = jnp.einsum("bthd,bshd->bhts", split(q), split(k)
                                ).mean(1) / math.sqrt(self.hidden // self.heads)
            logits = jnp.where(style_nonpad[:, None, :] > 0, logits, -1e30)
            probs = jax.nn.softmax(logits, -1)
            guided_loss = guided_loss + (probs * w * pair_mask).sum() / \
                jnp.maximum(pair_mask.sum(), 1.0)
        return x, guided_loss


class MixStyle(nn.Module):
    """Feature-statistics mixing (``mixstyle.py``): at train time, mix the
    per-utterance mean/std of the (style-conditioned) features with a
    shuffled batch; identity at inference."""

    p: float = 0.5
    alpha: float = 0.1
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, cond, train: bool = False, rng=None):
        x = x + cond
        if not train or rng is None:
            return x
        k1, k2, k3 = jax.random.split(rng, 3)
        mu = x.mean(axis=1, keepdims=True)
        sig = jnp.sqrt(x.var(axis=1, keepdims=True) + self.eps)
        xn = (x - mu) / sig
        perm = jax.random.permutation(k1, x.shape[0])
        lam = jax.random.beta(k2, self.alpha, self.alpha, (x.shape[0], 1, 1))
        mu2 = lam * mu + (1 - lam) * mu[perm]
        sig2 = lam * sig + (1 - lam) * sig[perm]
        mixed = xn * sig2 + mu2
        apply = jax.random.bernoulli(k3, self.p)
        return jnp.where(apply, mixed, x)


class GlobalStyleEncoder(nn.Module):
    """Ref-mel → (spk_embed, emo_embed), both 256-d.

    Substitution for the reference's external encoders (resemblyzer voice
    encoder + a finetuned wav2vec2 emotion model, ``generspeech.py`` inference
    wrapper ``inference/tts/GenerSpeech.py``): a GST-style conv+GRU reference
    encoder with two projection heads — same downstream conditioning surface.
    """

    emb_dim: int = 256

    @nn.compact
    def __call__(self, ref_mel, ref_nonpad=None):
        x = ref_mel[..., None]
        for i, ch in enumerate((32, 32, 64, 64)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                        name=f"conv{i}")(x)
            x = jax.nn.relu(nn.LayerNorm(name=f"ln{i}")(x))
        b, t, m, c = x.shape
        x = x.reshape(b, t, m * c)
        # masked mean-pool (a pooled summary is what both heads consume)
        x = x.mean(axis=1)
        h = jax.nn.tanh(nn.Dense(256, name="proj")(x))
        return (nn.Dense(self.emb_dim, name="spk_head")(h),
                nn.Dense(self.emb_dim, name="emo_head")(h))


# ---------------------------------------------------------------------------
# Glow post-flow
# ---------------------------------------------------------------------------


class WNCoupling(nn.Module):
    """WaveNet-style affine coupling conditioned on ``g`` (glow_modules.py WN)."""

    channels: int      # coupling operates on channels//2
    hidden: int
    layers: int
    kernel: int = 3

    @nn.compact
    def __call__(self, xa, g):
        """xa [B, T, C/2], g [B, T, G] → (log_s, t)."""
        x = nn.Dense(self.hidden, name="start")(xa)
        cond = nn.Dense(2 * self.hidden * self.layers, name="cond")(g)
        for i in range(self.layers):
            h = nn.Conv(2 * self.hidden, (self.kernel,),
                        kernel_dilation=(2 ** i,), padding="SAME",
                        name=f"in{i}")(x)
            ci = cond[..., 2 * self.hidden * i: 2 * self.hidden * (i + 1)]
            h = h + ci
            t_act = jnp.tanh(h[..., : self.hidden])
            s_act = jax.nn.sigmoid(h[..., self.hidden:])
            acts = t_act * s_act
            res_skip = nn.Dense(2 * self.hidden, name=f"rs{i}")(acts)
            x = x + res_skip[..., : self.hidden]
            if i == 0:
                skip = res_skip[..., self.hidden:]
            else:
                skip = skip + res_skip[..., self.hidden:]
        out = nn.Dense(self.channels, name="end",
                       kernel_init=nn.initializers.zeros)(skip)
        half = self.channels // 2
        return out[..., :half], out[..., half:]


class GlowStep(nn.Module):
    channels: int
    hidden: int
    wn_layers: int

    def setup(self):
        c = self.channels
        self.logs = self.param("actnorm_logs", nn.initializers.zeros, (c,))
        self.bias = self.param("actnorm_bias", nn.initializers.zeros, (c,))
        w = np.linalg.qr(np.random.default_rng(0).normal(size=(c, c)))[0]
        self.w = self.param("inv1x1_w", lambda rng: jnp.asarray(w, jnp.float32))
        self.wn = WNCoupling(c, self.hidden, self.wn_layers, name="wn")

    def forward(self, x, g, mask):
        """x → z, total logdet. x [B, T, C]."""
        x = (x * jnp.exp(self.logs) + self.bias) * mask[..., None]
        logdet = jnp.sum(self.logs) * mask.sum()
        x = x @ self.w
        logdet = logdet + jnp.linalg.slogdet(self.w)[1] * mask.sum()
        half = x.shape[-1] // 2
        xa, xb = x[..., :half], x[..., half:]
        log_s, t = self.wn(xa, g)
        xb = (xb * jnp.exp(log_s) + t) * mask[..., None]
        logdet = logdet + (log_s * mask[..., None]).sum()
        return jnp.concatenate([xa, xb], -1) * mask[..., None], logdet

    def reverse(self, z, g, mask):
        half = z.shape[-1] // 2
        za, zb = z[..., :half], z[..., half:]
        log_s, t = self.wn(za, g)
        zb = (zb - t) * jnp.exp(-log_s)
        z = jnp.concatenate([za, zb], -1)
        z = z @ jnp.linalg.inv(self.w)
        z = (z - self.bias) * jnp.exp(-self.logs)
        return z * mask[..., None]


class Glow(nn.Module):
    """Squeeze-2 Glow over mel frames (compact but real; glow_modules.py Glow
    with n_sqz=2)."""

    in_channels: int = 80
    hidden: int = 128
    n_steps: int = 4
    wn_layers: int = 3

    def setup(self):
        self.steps = [GlowStep(self.in_channels * 2, self.hidden,
                               self.wn_layers, name=f"step{i}")
                      for i in range(self.n_steps)]

    @staticmethod
    def squeeze(x, mask):
        b, t, c = x.shape
        t2 = (t // 2) * 2
        x = x[:, :t2].reshape(b, t2 // 2, 2 * c)
        m = mask[:, :t2].reshape(b, t2 // 2, 2).min(-1)
        return x, m

    @staticmethod
    def unsqueeze(x, t_out):
        b, t, c2 = x.shape
        x = x.reshape(b, t * 2, c2 // 2)
        return jnp.pad(x, ((0, 0), (0, max(0, t_out - 2 * t)), (0, 0)))[:, :t_out]

    def forward(self, mel, cond, mask):
        """→ (z, nll_per_element): training objective (run_post_glow)."""
        x, m = self.squeeze(mel, mask)
        g, _ = self.squeeze(cond, mask)
        logdet = 0.0
        for step in self.steps:
            x, ld = step.forward(x, g, m)
            logdet = logdet + ld
        n_elem = jnp.maximum(m.sum() * x.shape[-1], 1.0)
        nll = (0.5 * (x ** 2) * m[..., None]).sum() / n_elem \
            + 0.5 * math.log(2 * math.pi) - logdet / n_elem
        return x, nll

    def reverse(self, cond, mask, rng, temperature: float = 0.8):
        g, m = self.squeeze(cond, mask)
        z = jax.random.normal(rng, g[..., : self.in_channels * 2].shape) \
            * temperature * m[..., None]
        x = z
        for step in reversed(self.steps):
            x = step.reverse(x, g, m)
        t_out = mask.shape[1]
        return self.unsqueeze(x, t_out)


# ---------------------------------------------------------------------------
# GenerSpeech
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GenerSpeechConfig:
    fs2: FastSpeech2Config = FastSpeech2Config(use_pitch_embed=True)
    n_vq: int = 64                  # hparams['nVQ']
    emb_dim: int = 256
    glow_hidden: int = 128
    glow_steps: int = 4
    glow_wn_layers: int = 3
    use_post_flow: bool = True
    vq_ema: bool = True          # False → codebook-loss VQ (jit-friendly)


class GenerSpeech(nn.Module):
    cfg: GenerSpeechConfig

    def setup(self):
        cfg = self.cfg
        d = cfg.fs2.hidden_size
        self.embed = nn.Embed(cfg.fs2.vocab_size, d, name="embed_tokens")
        self.enc_pos = SinusoidalPositions(d, name="enc_pos")
        self.encoder = FFTBlocks(d, cfg.fs2.enc_layers, cfg.fs2.num_heads,
                                 cfg.fs2.enc_ffn_kernel_size,
                                 use_pos_embed=False, name="encoder")
        self.decoder = FFTBlocks(d, cfg.fs2.dec_layers, cfg.fs2.num_heads,
                                 cfg.fs2.dec_ffn_kernel_size, name="decoder")
        self.mel_out = nn.Dense(cfg.fs2.n_mels, name="mel_out")
        self.dur_predictor = ConvPredictor(
            cfg.fs2.pred_hidden, cfg.fs2.dur_predictor_layers,
            cfg.fs2.dur_predictor_kernel, 1, name="dur_predictor")

        self.global_style = GlobalStyleEncoder(cfg.emb_dim, name="global_style")
        self.spk_proj = nn.Dense(d, name="spk_embed_proj")
        self.emo_proj = nn.Dense(d, name="emo_embed_proj")
        self.mixstyle = MixStyle(name="mixstyle")

        for level in ("utter", "ph", "word"):
            setattr(self, f"style_{level}",
                    LocalStyleAdaptor(d, cfg.n_vq, vq_ema=cfg.vq_ema,
                                      name=f"style_{level}"))
            setattr(self, f"align_{level}",
                    ProsodyAligner(d, name=f"align_{level}"))

        self.pitch_embed = nn.Embed(300, d, name="pitch_embed")
        self.pitch_inpainter = ConvPredictor(
            d, 3, cfg.fs2.predictor_kernel, 2, with_pos=True, pos_dim=d,
            name="pitch_inpainter")
        if cfg.use_post_flow:
            self.post_flow = Glow(cfg.fs2.n_mels, cfg.glow_hidden,
                                  cfg.glow_steps, cfg.glow_wn_layers,
                                  name="post_flow")

    def _styles(self, decoder_inp, ref_mel, ref_nonpad, tgt_nonpad, train):
        total, commit, guided = 0.0, 0.0, 0.0
        for level in ("utter", "ph", "word"):
            quant, c = getattr(self, f"style_{level}")(
                ref_mel, ref_nonpad, train=train)
            aligned, g = getattr(self, f"align_{level}")(
                decoder_inp, quant, tgt_nonpad, ref_nonpad)
            total = total + aligned
            commit = commit + c
            guided = guided + g
        return total, commit, guided

    def __call__(self, tokens, ref_mel, ref_nonpad=None, mel2ph=None,
                 f0=None, uv=None, train: bool = False, rng=None,
                 infer_postflow: bool = True):
        cfg = self.cfg.fs2
        ret: dict[str, Any] = {}
        src_nonpad = (tokens > 0).astype(jnp.float32)
        if ref_nonpad is None:
            ref_nonpad = (jnp.abs(ref_mel).sum(-1) > 0).astype(jnp.float32)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        r_mix, r_flow = jax.random.split(rng)

        x = self.embed(tokens) * math.sqrt(cfg.hidden_size)
        x = x + self.enc_pos(src_nonpad)
        encoder_out = self.encoder(x, src_nonpad)

        spk_e, emo_e = self.global_style(ref_mel, ref_nonpad)
        spk = self.spk_proj(spk_e)[:, None]
        emo = self.emo_proj(emo_e)[:, None]

        dur_inp = (encoder_out + spk + emo) * src_nonpad[..., None]
        dur_log = self.dur_predictor(dur_inp, src_nonpad)[..., 0]
        ret["dur"] = dur_log
        if mel2ph is None:
            dur = jnp.clip(jnp.round(jnp.exp(dur_log) - 1.0), 0, None) * src_nonpad
            mel2ph = length_regulator(dur, cfg.max_frames)
        ret["mel2ph"] = mel2ph
        tgt_nonpad = (mel2ph > 0).astype(jnp.float32)

        h = jnp.pad(encoder_out, ((0, 0), (1, 0), (0, 0)))
        decoder_inp = jnp.take_along_axis(h, mel2ph[..., None], axis=1)
        decoder_inp = self.mixstyle(decoder_inp, spk + emo, train=train,
                                    rng=r_mix)

        prosody, commit, guided = self._styles(
            decoder_inp, ref_mel, ref_nonpad, tgt_nonpad, train)
        ret["vq_commit"] = commit
        ret["guided_attn"] = guided

        # pitch inpainting: agnostic + specific paths share the predictor
        pitch_inp = (decoder_inp + spk + emo + prosody) * tgt_nonpad[..., None]
        pitch_pred = self.pitch_inpainter(pitch_inp, nonpad=tgt_nonpad,
                                          pos_nonpad=tgt_nonpad)
        ret["pitch_pred"] = pitch_pred
        if f0 is None:
            f0 = pitch_pred[..., 0]
            uv = (pitch_pred[..., 1] > 0).astype(jnp.float32)
        f0_denorm = denorm_f0(f0, uv, cfg, pitch_padding=mel2ph == 0)
        ret["f0_denorm"] = f0_denorm
        decoder_inp = decoder_inp + self.pitch_embed(f0_to_coarse(f0_denorm))

        decoder_inp = (decoder_inp + spk + emo + prosody) * tgt_nonpad[..., None]
        ret["decoder_inp"] = decoder_inp
        dec = self.decoder(decoder_inp, tgt_nonpad)
        mel = self.mel_out(dec) * tgt_nonpad[..., None]
        ret["mel_out"] = mel

        if self.cfg.use_post_flow:
            cond = jnp.concatenate([mel, decoder_inp], axis=-1)
            if train:
                _, nll = self.post_flow.forward(ref_mel[:, : mel.shape[1]],
                                                cond, tgt_nonpad)
                ret["postflow_nll"] = nll
            elif infer_postflow and not self.is_initializing():
                ret["mel_out"] = self.post_flow.reverse(
                    cond, tgt_nonpad, r_flow) * tgt_nonpad[..., None]
            else:
                _, nll = self.post_flow.forward(mel, cond, tgt_nonpad)
                ret["postflow_nll"] = nll
        return ret
