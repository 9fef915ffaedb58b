"""Text→audio / inpaint latent-diffusion engine (Make-An-Audio class).

Reference flow (``audio-chatgpt.py:158-199`` T2A, 418-559 Inpaint): CLAP text
context → DDIM (S=100, scale 1.5, 3 samples) → VAE decode → (x+1)/2 mel →
BigVGAN → best-of-3 CLAP ranking.

TPU re-design:
  * ONE jit program for the whole sampler (context both branches batched, the
    scan from ``samplers.ddim_sample``), one more for VAE decode + vocoder,
  * the n_samples axis is the batch axis — 3 candidates cost one batched run,
    not 3 sequential runs,
  * the CLAP scorer is constructed once at engine init (the reference
    re-instantiates it per call — ``audio-chatgpt.py:187``, a known defect).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from audiogpt_tpu.registry import ENGINES
from audiogpt_tpu.engines.base import Engine
from audiogpt_tpu.engines.vocoder import VocoderEngine
from audiogpt_tpu.models.diffusion import (
    AutoencoderKL,
    DiffusionSchedule,
    UNetConfig,
    UNetModel,
    VAEConfig,
    ddim_sample,
    dpmpp_sample,
    plms_sample,
)
from audiogpt_tpu.models.textenc import CLAPTextConfig, CLAPTextEncoder
from audiogpt_tpu.models.textenc.clap import WordPieceTokenizer
from audiogpt_tpu.dsp.mel import ldm_mel


@dataclasses.dataclass(frozen=True)
class T2AConfig:
    #: inference default: remat OFF — ``nn.remat`` exists for the backward
    #: pass; in the forward-only sampler it only hinders XLA fusion
    #: (measured ~3 ms/eval on v5e). Training (``train/tasks/ldm.py``)
    #: keeps its own remat-on config.
    unet: UNetConfig = UNetConfig(use_checkpoint=False)
    vae: VAEConfig = VAEConfig()
    clap: CLAPTextConfig = CLAPTextConfig()
    mel_bins: int = 80
    mel_len: int = 624           # 10 s canvas (audio-chatgpt.py:202)
    inpaint_mel_len: int = 848   # inpaint canvas (audio-chatgpt.py:463)
    sample_rate: int = 16000
    hop: int = 256
    scale_factor: float = 1.0    # LDM latent scaling (ddpm_audio.py:104)
    timesteps: int = 1000
    linear_start: float = 0.00085
    linear_end: float = 0.0120
    #: run the UNet denoiser in bfloat16 (params cast once before the
    #: sampler scan; GroupNorm stats stay f32 inside the model; scheduler
    #: arithmetic and the VAE decode stay f32). MXU-rate win on TPU —
    #: off by default for bit-parity with the torch reference.
    unet_bf16: bool = False
    #: sampler the agent tool / serving path uses. The reference runs
    #: DDIM-100 (audio-chatgpt.py:166, ddim.py:118); DPM-Solver++(2M)-12 is
    #: measured output-equivalent on this schedule (same-seed mel-L1 ratio
    #: 0.034 of cross-seed scale, tools/sampler_equivalence.py) at 8.3×
    #: fewer UNet evals. ``txt2audio`` keeps reference-exact defaults;
    #: these knobs only steer the production tool call.
    tool_sampler: str = "dpmpp"
    tool_steps: int = 12

    @property
    def vae_factor(self) -> int:
        return 2 ** (len(self.vae.ch_mult) - 1)

    @property
    def latent_hw(self) -> tuple[int, int]:
        return self.mel_bins // self.vae_factor, self.mel_len // self.vae_factor


@ENGINES.register("t2a")
class T2AEngine(Engine):
    name = "t2a"

    def __init__(self, cfg: T2AConfig | None = None, params: dict | None = None,
                 vocoder: VocoderEngine | None = None,
                 tokenizer: WordPieceTokenizer | None = None,
                 scorer=None, mesh=None, rng_seed: int = 0):
        super().__init__()
        #: optional CLAPScorer for best-of-n re-ranking (constructed once —
        #: fixes the per-call reload at audio-chatgpt.py:187)
        self.scorer = scorer
        #: optional jax Mesh: candidates shard over the 'data' axis so
        #: best-of-n costs one multi-chip step (the reference runs three
        #: sequential GPU samples, audio-chatgpt.py:163-181); params
        #: replicate, the sampler's collectives ride ICI.
        self.mesh = mesh
        self.cfg = cfg or T2AConfig()
        self.unet = UNetModel(self.cfg.unet)
        self.vae = AutoencoderKL(self.cfg.vae)
        self.clap = CLAPTextEncoder(self.cfg.clap)
        self.schedule = DiffusionSchedule.linear(
            self.cfg.timesteps, self.cfg.linear_start, self.cfg.linear_end)
        self.tokenizer = tokenizer or WordPieceTokenizer(
            vocab_size=self.cfg.clap.bert.vocab_size)
        self.vocoder = vocoder
        self._rng = jax.random.PRNGKey(rng_seed)

        if params is None:
            params = self.init_params(jax.random.PRNGKey(rng_seed))
        if mesh is not None:
            from audiogpt_tpu.parallel.mesh import replicate

            params = replicate(params, mesh)
        self.params = params  # {"unet":…, "vae":…, "clap":…}

    def init_params(self, rng) -> dict:
        h, w = self.cfg.latent_hw
        k1, k2, k3 = jax.random.split(rng, 3)
        return {
            "unet": self.unet.init(
                k1, jnp.zeros((1, h, w, self.cfg.unet.in_channels)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 2, self.cfg.unet.context_dim))),
            "vae": self.vae.init(k2, jnp.zeros((1, 16, 16, self.cfg.vae.in_channels))),
            "clap": self.clap.init(k3, jnp.zeros((1, 4), jnp.int32)),
        }

    # -- conditioning -------------------------------------------------------
    @functools.cached_property
    def _encode_fn(self):
        return jax.jit(lambda p, ids, masks: self.clap.apply(p, ids, masks))

    def encode_text(self, texts: list[str]) -> jnp.ndarray:
        ids, masks = zip(*(self.tokenizer.encode(t, self.cfg.clap.max_length)
                           for t in texts))
        return self._encode_fn(self.params["clap"], jnp.asarray(np.stack(ids)),
                               jnp.asarray(np.stack(masks)))

    # -- compiled cores -----------------------------------------------------
    def _sample_core(self, params, context, uncond, rng, x_T, guidance,
                     n_steps, h, w, sampler):
        """Traced body shared by ``_sample_fn`` and ``_sample_vocode_fn``:
        fused sampler scan → VAE decode → mel01 [B, 80, W, 1]."""
        cfg = self.cfg
        unet_p = params["unet"]
        if cfg.unet_bf16:
            unet_p = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, unet_p)
            context = context.astype(jnp.bfloat16)
            uncond = uncond.astype(jnp.bfloat16)

        def eps(x, t, c):
            if cfg.unet_bf16:
                return self.unet.apply(
                    unet_p, x.astype(jnp.bfloat16), t, c
                ).astype(jnp.float32)
            return self.unet.apply(unet_p, x, t, c)

        b = context.shape[0]
        sample = {"plms": plms_sample,
                  "dpmpp": dpmpp_sample}.get(sampler, ddim_sample)
        z = sample(
            eps, self.schedule, (b, h, w, cfg.unet.in_channels),
            context, uncond, rng, n_steps=n_steps,
            guidance_scale=guidance, x_T=x_T)
        z = z / cfg.scale_factor
        mel = self.vae.apply(params["vae"], z, method=AutoencoderKL.decode)
        return jnp.clip((mel + 1.0) / 2.0, 0.0, 1.0)  # [B, 80, W, 1]

    @functools.cached_property
    def _sample_fn(self):
        @functools.partial(jax.jit, static_argnames=("guidance", "n_steps",
                                                     "h", "w", "sampler"))
        def run(params, context, uncond, rng, x_T, guidance, n_steps, h, w,
                sampler="ddim"):
            return self._sample_core(params, context, uncond, rng, x_T,
                                     guidance, n_steps, h, w, sampler)

        return run

    @functools.cached_property
    def _sample_vocode_fn(self):
        """Sampler scan + VAE decode + vocoder in ONE jit program — on the
        high-latency tunnel each extra dispatch/host-transfer costs more than
        the vocoder compute itself, so the whole text→wav tool call is a
        single device roundtrip (the reference runs three separate torch
        modules per candidate, audio-chatgpt.py:163-186)."""
        voc = self.vocoder

        @functools.partial(jax.jit, static_argnames=("guidance", "n_steps",
                                                     "h", "w", "sampler"))
        def run(params, voc_params, context, uncond, rng, x_T, guidance,
                n_steps, h, w, sampler="ddim"):
            mel01 = self._sample_core(params, context, uncond, rng, x_T,
                                      guidance, n_steps, h, w, sampler)
            mel_t = jnp.transpose(mel01[..., 0], (0, 2, 1))  # [B, W, 80]
            wav = voc.model.apply(voc_params, mel_t)
            return mel01, wav

        return run

    def _can_fuse_vocoder(self, frames: int | None = None) -> bool:
        v = self.vocoder
        return (v is not None
                and not (v.kind == "hifigan" and getattr(v.cfg, "use_nsf", False))
                and (frames or self.cfg.mel_len) in v.bucketer.buckets)

    @functools.cached_property
    def _sample_vocode_rank_fn(self):
        """Best-of-n tool call as ONE jit program: sampler scan + VAE decode
        + vocoder + CLAP candidate scoring + argmax. The reference runs these
        as five separate torch modules and re-instantiates the scorer per
        call (``select_best_audio``, audio-chatgpt.py:185-199); here only the
        winning wav crosses the host boundary — on the ~36 MB/s tunnel the
        losers' download plus their re-upload into a separate scoring
        dispatch costs more than the scoring compute itself."""
        voc, sc = self.vocoder, self.scorer

        @functools.partial(jax.jit, static_argnames=("guidance", "n_steps",
                                                     "h", "w", "sampler"))
        def run(params, voc_params, sc_text_p, sc_audio_p, ids, mask,
                context, uncond, rng, x_T, guidance, n_steps, h, w,
                sampler="ddim"):
            mel01 = self._sample_core(params, context, uncond, rng, x_T,
                                      guidance, n_steps, h, w, sampler)
            mel_t = jnp.transpose(mel01[..., 0], (0, 2, 1))  # [B, W, 80]
            wav = voc.model.apply(voc_params, mel_t)
            t = sc.text.apply(sc_text_p, ids, mask,
                              method=CLAPTextEncoder.cls_embedding)
            a = sc.audio.apply(sc_audio_p, wav,
                               jnp.full((wav.shape[0],), wav.shape[1],
                                        jnp.int32))
            t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
            a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
            scores = (a @ t.T)[:, 0]                        # [n]
            best = jnp.argmax(scores)
            return mel01[best], wav[best], scores

        return run

    def _inpaint_core(self, params, mel01, mask_latent, context, uncond, rng,
                      guidance, n_steps, sampler="ddim"):
        cfg = self.cfg
        # encode original mel (mel01 in [0,1] → VAE domain [-1,1])
        x = mel01 * 2.0 - 1.0
        post = self.vae.apply(params["vae"], x, method=AutoencoderKL.encode)
        z0 = post.mode() * cfg.scale_factor

        def eps(x_, t, c):
            return self.unet.apply(params["unet"], x_, t, c)

        sample = {"dpmpp": dpmpp_sample}.get(sampler, ddim_sample)
        z = sample(
            eps, self.schedule, z0.shape, context, uncond, rng,
            n_steps=n_steps, guidance_scale=guidance,
            mask=mask_latent, x0=z0)
        mel = self.vae.apply(params["vae"], z / cfg.scale_factor,
                             method=AutoencoderKL.decode)
        return jnp.clip((mel + 1.0) / 2.0, 0.0, 1.0)

    @functools.cached_property
    def _inpaint_fn(self):
        @functools.partial(jax.jit, static_argnames=("guidance", "n_steps",
                                                     "sampler"))
        def run(params, mel01, mask_latent, context, uncond, rng, guidance,
                n_steps, sampler="ddim"):
            return self._inpaint_core(params, mel01, mask_latent, context,
                                      uncond, rng, guidance, n_steps, sampler)

        return run

    @functools.cached_property
    def _inpaint_vocode_fn(self):
        """Inpaint + vocoder in one jit program (same rationale as
        ``_sample_vocode_fn``)."""
        voc = self.vocoder

        @functools.partial(jax.jit, static_argnames=("guidance", "n_steps",
                                                     "sampler"))
        def run(params, voc_params, mel01, mask_latent, context, uncond, rng,
                guidance, n_steps, sampler="ddim"):
            out = self._inpaint_core(params, mel01, mask_latent, context,
                                     uncond, rng, guidance, n_steps, sampler)
            mel_t = jnp.transpose(out[..., 0], (0, 2, 1))  # [1, W, 80]
            return out, voc.model.apply(voc_params, mel_t)

        return run

    # -- public API ---------------------------------------------------------
    def _prep_candidates(self, text: str, n_samples: int, seed: int | None):
        """Shared candidate prep: batched cond+uncond text encode (one
        dispatch), initial noise, mesh sharding. → (ctx, uc, rng, x_T) with
        n_samples rounded up to the mesh data axis."""
        cfg = self.cfg
        if self.mesh is not None:
            # round candidates up to the data axis — extra candidates are
            # free on idle chips and only improve best-of-n
            d = self.mesh.shape["data"]
            n_samples = ((n_samples + d - 1) // d) * d
        # one batched encode for cond+uncond — halves the dispatch roundtrips
        both = self.encode_text([text] * n_samples + [""] * n_samples)
        ctx, uc = both[:n_samples], both[n_samples:]
        h, w = cfg.latent_hw
        if seed is not None:
            rng = jax.random.PRNGKey(seed)
        else:
            self._rng, rng = jax.random.split(self._rng)
        rng, krng = jax.random.split(rng)
        x_T = jax.random.normal(krng, (n_samples, h, w, cfg.unet.in_channels))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sh = NamedSharding(self.mesh, P("data"))
            ctx, uc, x_T = (jax.device_put(a, batch_sh) for a in (ctx, uc, x_T))
        return ctx, uc, rng, x_T

    def txt2audio(self, text: str, n_samples: int = 3, ddim_steps: int = 100,
                  scale: float = 1.5, seed: int | None = None,
                  sampler: str = "ddim") -> np.ndarray:
        """→ candidate mels [n, frames, 80] in [0,1] (and wavs if a vocoder
        is attached: returns (mels, wavs)). ``sampler='plms'`` matches the
        reference's PLMSSampler (``plms.py``) — quality-comparable at ~4×
        fewer steps (25 vs 100); ``sampler='dpmpp'`` is DPM-Solver++(2M)
        (not in the reference) — use ``ddim_steps`` ≈ 10–15."""
        cfg = self.cfg
        ctx, uc, rng, x_T = self._prep_candidates(text, n_samples, seed)
        n_samples = x_T.shape[0]
        h, w = cfg.latent_hw
        if self._can_fuse_vocoder():
            mel, wav = self._sample_vocode_fn(
                self.params, self.vocoder.params, ctx, uc, rng, x_T, scale,
                ddim_steps, h, w, sampler)
            mels = np.asarray(mel)[..., 0].transpose(0, 2, 1)
            return mels, np.asarray(wav)
        mel = self._sample_fn(self.params, ctx, uc, rng, x_T, scale,
                              ddim_steps, h, w, sampler)
        mel = np.asarray(mel)[..., 0]          # [n, 80, W]
        mels = mel.transpose(0, 2, 1)          # [n, frames, 80]
        if self.vocoder is None:
            return mels
        wavs = self.vocoder(mels)
        return mels, wavs

    def select_best(self, text: str, wavs) -> int:
        """Best-of-n CLAP re-ranking (``select_best_audio``,
        audio-chatgpt.py:185-199); index 0 when no scorer is attached."""
        if self.scorer is None:
            return 0
        return self.scorer.select_best(text, wavs)

    def txt2audio_best(self, text: str, n_samples: int = 3,
                       ddim_steps: int | None = None, scale: float = 1.5,
                       seed: int | None = None, sampler: str | None = None):
        """The full best-of-n tool call (reference T2A semantics: sample n,
        vocode, CLAP-rank, keep the winner — audio-chatgpt.py:158-199) as a
        single device roundtrip. → ``(mel [frames, 80], wav [T], scores [n])``
        numpy arrays; ``scores`` are the per-candidate CLAP similarities.
        ``sampler``/``ddim_steps`` default to the engine's production tool
        config (``cfg.tool_sampler``/``cfg.tool_steps``). Falls back to the
        separate-program path when the vocoder can't fuse or no scorer is
        attached (identical results, more roundtrips)."""
        cfg = self.cfg
        sampler = cfg.tool_sampler if sampler is None else sampler
        ddim_steps = cfg.tool_steps if ddim_steps is None else ddim_steps
        if self.scorer is None or not self._can_fuse_vocoder():
            out = self.txt2audio(text, n_samples=n_samples,
                                 ddim_steps=ddim_steps, scale=scale,
                                 seed=seed, sampler=sampler)
            if self.vocoder is None:
                mels = out
                return mels[0], None, np.zeros(len(mels), np.float32)
            mels, wavs = out
            scores = (self.scorer.score(text, wavs) if self.scorer is not None
                      else np.zeros(len(wavs), np.float32))
            best = int(scores.argmax())
            return mels[best], wavs[best], scores
        ctx, uc, rng, x_T = self._prep_candidates(text, n_samples, seed)
        h, w = cfg.latent_hw
        sc = self.scorer
        sids, smask = sc.tokenizer.encode(text, sc.cfg.max_length)
        mel_b, wav_b, scores = self._sample_vocode_rank_fn(
            self.params, self.vocoder.params, sc.text_params, sc.audio_params,
            jnp.asarray(sids)[None], jnp.asarray(smask)[None],
            ctx, uc, rng, x_T, scale, ddim_steps, h, w, sampler)
        mel = np.asarray(mel_b)[..., 0].T              # [frames, 80]
        return mel, np.asarray(wav_b), np.asarray(scores)

    def inpaint(self, wav: np.ndarray, mask_time: np.ndarray,
                text: str = "", ddim_steps: int = 100,
                scale: float = 1.0, sampler: str = "ddim") -> np.ndarray:
        """``mask_time`` with 1 = KEEP original; regenerates the rest.
        Accepts a 1-D time mask ``[frames]`` (text-specified ranges) or a
        2-D time-frequency mask ``[frames, mel_bins]`` (the UI's sketch-
        drawn mel mask, ``audio-chatgpt.py:1351-1374`` — drawn pixels are
        inverted to keep=0 at the serving layer). Fixed 848-frame window
        (pad/truncate, audio-chatgpt.py:463-470)."""
        cfg = self.cfg
        n = cfg.inpaint_mel_len * cfg.hop
        wav = np.asarray(wav, np.float32)
        wav = np.pad(wav, (0, max(0, n - len(wav))))[:n]
        import dataclasses as _dc

        from audiogpt_tpu.dsp.mel import LDM_MEL_16K, ldm_normalize, log_mel

        spec = _dc.replace(LDM_MEL_16K, sr=cfg.sample_rate, hop=cfg.hop,
                           n_mels=cfg.mel_bins)
        mel = np.asarray(ldm_normalize(log_mel(jnp.asarray(wav), spec)))[: cfg.inpaint_mel_len]
        mel01 = mel[None].transpose(0, 2, 1)[..., None]  # [1, 80, frames, 1]

        mask = np.asarray(mask_time, np.float32)
        f = cfg.vae_factor
        lat_w = cfg.inpaint_mel_len // f
        if mask.ndim == 1:
            mask = np.pad(mask, (0, max(0, cfg.inpaint_mel_len - len(mask))
                                 ))[: cfg.inpaint_mel_len]
            # latent mask: downsample by the VAE factor; broadcast over freq
            m = mask.reshape(lat_w, f).max(axis=1)
            mask_latent = jnp.asarray(m)[None, None, :, None] * jnp.ones(
                (1, cfg.mel_bins // f, lat_w, cfg.unet.in_channels))
        else:
            # [frames, mel_bins] sketch mask → pad time, area-mean pool to
            # the latent grid (soft edges, the analogue of the reference's
            # F.interpolate on the drawn mask, audio-chatgpt.py:513)
            mask = np.pad(mask, ((0, max(0, cfg.inpaint_mel_len -
                                         mask.shape[0])), (0, 0)),
                          constant_values=1.0)[: cfg.inpaint_mel_len]
            m2 = mask.T  # [mel_bins, frames]
            m2 = m2.reshape(cfg.mel_bins // f, f, lat_w, f).mean(axis=(1, 3))
            mask_latent = jnp.asarray(m2)[None, :, :, None] * jnp.ones(
                (1, cfg.mel_bins // f, lat_w, cfg.unet.in_channels))

        if scale != 1.0:
            both = self.encode_text([text, ""])  # one batched dispatch
            ctx, uc = both[:1], both[1:]
        else:
            ctx = self.encode_text([text])
            uc = ctx
        self._rng, rng = jax.random.split(self._rng)
        if self._can_fuse_vocoder(cfg.inpaint_mel_len):
            _, wav = self._inpaint_vocode_fn(
                self.params, self.vocoder.params, jnp.asarray(mel01),
                mask_latent, ctx, uc, rng, scale, ddim_steps, sampler)
            return np.asarray(wav)[0]
        out = self._inpaint_fn(self.params, jnp.asarray(mel01), mask_latent,
                               ctx, uc, rng, scale, ddim_steps, sampler)
        out_mel = np.asarray(out)[0, :, :, 0].T  # [frames, 80]
        if self.vocoder is None:
            return out_mel
        return self.vocoder(out_mel)
