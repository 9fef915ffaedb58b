"""Text→image engine: a native StableDiffusion-class LDM on the shared
diffusion stack.

The reference's T2I tool shells out to a hosted HF StableDiffusion pipeline
(``audio-chatgpt.py`` ``T2I.__init__``: ``StableDiffusionPipeline.
from_pretrained("runwayml/stable-diffusion-v1-5")``); here the same UNet /
AutoencoderKL / sampler code that powers T2A (``models/diffusion/``) is
instantiated at the SD-1.x shape with a CLIP ViT-L/14 text conditioner —
one diffusion stack serves audio and image generation, and SD ckpts import
through the ``ldm_unet`` / ``vae`` / ``clip_text_hf`` converter families.

TPU notes: the sampler is ONE fused ``lax.scan`` jit program with the CFG
pair batched (2n UNet rows per step); candidates shard over the mesh's
``data`` axis exactly like T2A best-of-n.
"""

from __future__ import annotations

import functools
import os
import uuid

import jax
import jax.numpy as jnp
import numpy as np

from audiogpt_tpu.models.diffusion import UNetConfig, UNetModel, VAEConfig
from audiogpt_tpu.models.diffusion.samplers import (DiffusionSchedule,
                                                    ddim_sample, dpmpp_sample,
                                                    plms_sample)
from audiogpt_tpu.models.diffusion.vae import AutoencoderKL
from audiogpt_tpu.models.textenc.clip import CLIPTextConfig, CLIPTextTower

import dataclasses


@dataclasses.dataclass(frozen=True)
class T2IConfig:
    #: SD-1.x UNet: 320ch, 4 levels, attention at ds 1/2/4, 768-dim context
    unet: UNetConfig = UNetConfig(
        in_channels=4, out_channels=4, model_channels=320,
        num_res_blocks=2, attention_resolutions=(1, 2, 4),
        channel_mult=(1, 2, 4, 4), num_heads=8, context_dim=768,
        use_checkpoint=False)   # forward-only: remat off (see t2a.py)
    #: f8 image VAE (3-channel RGB)
    vae: VAEConfig = VAEConfig(ch=128, ch_mult=(1, 2, 4, 4),
                               num_res_blocks=2, attn_resolutions=(),
                               in_channels=3, out_ch=3, z_channels=4,
                               embed_dim=4, resolution=256)
    #: CLIP ViT-L/14 text tower (SD's conditioner)
    text: CLIPTextConfig = CLIPTextConfig(
        vocab_size=49408, context_length=77, width=768, layers=12,
        heads=12, embed_dim=768)
    height: int = 512
    width: int = 512
    scale_factor: float = 0.18215
    timesteps: int = 1000
    linear_start: float = 0.00085
    linear_end: float = 0.0120
    unet_bf16: bool = False

    @property
    def vae_factor(self) -> int:
        return 2 ** (len(self.vae.ch_mult) - 1)

    @property
    def latent_hw(self) -> tuple[int, int]:
        return self.height // self.vae_factor, self.width // self.vae_factor


class T2IEngine:
    """Immutable engine (CLAUDE.md conventions): config+params at
    construction, every jitted program compiles once. Callable as the
    toolset's ``t2i`` slot (text → saved PNG path)."""

    def __init__(self, cfg: T2IConfig | None = None, params: dict | None = None,
                 tokenizer="auto", mesh=None, media_root: str = ".",
                 rng_seed: int = 0, text_refiner=None):
        self.cfg = cfg or T2IConfig()
        self.unet = UNetModel(self.cfg.unet)
        self.vae = AutoencoderKL(self.cfg.vae)
        self.text = CLIPTextTower(self.cfg.text)
        self.schedule = DiffusionSchedule.linear(
            self.cfg.timesteps, self.cfg.linear_start, self.cfg.linear_end)
        #: CLIP-BPE callable text → ids. "auto" loads the bundled published
        #: CLIP vocab (`text/bpe.py ClipTokenizer`, exact SimpleTokenizer
        #: semantics — open_clap/tokenizer.py:68-94); pass None only to
        #: disable deliberately (prompt is then DROPPED, with a loud warn).
        if tokenizer == "auto":
            from audiogpt_tpu.text.bpe import ClipTokenizer

            tokenizer = ClipTokenizer()
        self.tokenizer = tokenizer
        #: optional MagicPrompt-class GPT-2 prompt refiner (the reference
        #: runs Gustavosta/MagicPrompt over the user prompt before SD —
        #: audio-chatgpt.py:112-125); any callable str -> str.
        self.text_refiner = text_refiner
        self.mesh = mesh
        self.media_root = media_root
        self._rng = jax.random.PRNGKey(rng_seed)
        if params is None:
            h, w = self.cfg.latent_hw
            k1, k2, k3 = jax.random.split(jax.random.PRNGKey(rng_seed), 3)
            params = {
                "unet": self.unet.init(
                    k1, jnp.zeros((1, h, w, self.cfg.unet.in_channels)),
                    jnp.zeros((1,), jnp.int32),
                    jnp.zeros((1, 2, self.cfg.unet.context_dim))),
                "vae": self.vae.init(
                    k2, jnp.zeros((1, 32, 32, self.cfg.vae.in_channels))),
                "text": self.text.init(k3, jnp.zeros((1, 4), jnp.int32)),
            }
        if mesh is not None:
            from audiogpt_tpu.parallel.mesh import replicate

            params = replicate(params, mesh)
        self.params = params

    # -- conditioning ------------------------------------------------------
    def encode_ids(self, ids: np.ndarray) -> jnp.ndarray:
        return self._text_fn(self.params["text"], jnp.asarray(ids))

    @functools.cached_property
    def _text_fn(self):
        return jax.jit(lambda p, ids: self.text.apply(
            p, ids, return_sequence=True))

    def _tokenize(self, texts: list[str]) -> np.ndarray:
        L, sot, eot = self.cfg.text.context_length, 49406, 49407
        if self.tokenizer is None and any(texts):
            from audiogpt_tpu.text.bpe import warn_fallback

            warn_fallback("T2IEngine",
                          "tokenizer disabled: prompts are DROPPED "
                          "([SOT, EOT] conditioning only)")
        ids = np.full((len(texts), L), eot, np.int32)
        for i, t in enumerate(texts):
            toks = [sot] + (list(self.tokenizer(t))[: L - 2]
                            if self.tokenizer else []) + [eot]
            ids[i, : len(toks)] = toks
        return ids

    # -- compiled core -----------------------------------------------------
    @functools.cached_property
    def _sample_fn(self):
        cfg = self.cfg

        @functools.partial(jax.jit, static_argnames=("guidance", "n_steps",
                                                     "sampler"))
        def run(params, context, uncond, rng, x_T, guidance, n_steps,
                sampler="ddim"):
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

            h, w = cfg.latent_hw
            sample = {"plms": plms_sample,
                      "dpmpp": dpmpp_sample}.get(sampler, ddim_sample)
            z = sample(eps, self.schedule,
                       (context.shape[0], h, w, cfg.unet.in_channels),
                       context, uncond, rng, n_steps=n_steps,
                       guidance_scale=guidance, x_T=x_T)
            img = self.vae.apply(params["vae"], z / cfg.scale_factor,
                                 method=AutoencoderKL.decode)
            return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)  # [B, H, W, 3]

        return run

    # -- public API --------------------------------------------------------
    def txt2img(self, text: str, n_samples: int = 1, steps: int = 50,
                scale: float = 7.5, seed: int | None = None,
                sampler: str = "ddim") -> np.ndarray:
        """→ images [n, H, W, 3] float in [0, 1]."""
        if self.text_refiner is not None and text:
            text = self.text_refiner(text)
        if self.mesh is not None:
            d = self.mesh.shape["data"]
            n_samples = ((n_samples + d - 1) // d) * d
        ctx = self.encode_ids(self._tokenize([text] * n_samples))
        uc = self.encode_ids(self._tokenize([""] * n_samples))
        if seed is not None:
            rng = jax.random.PRNGKey(seed)
        else:
            self._rng, rng = jax.random.split(self._rng)
        rng, krng = jax.random.split(rng)
        h, w = self.cfg.latent_hw
        x_T = jax.random.normal(
            krng, (n_samples, h, w, self.cfg.unet.in_channels))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P("data"))
            ctx, uc, x_T = (jax.device_put(a, sh) for a in (ctx, uc, x_T))
        img = self._sample_fn(self.params, ctx, uc, rng, x_T, scale, steps,
                              sampler)
        return np.asarray(img)

    def __call__(self, text: str) -> str:
        """Toolset ``t2i`` slot: text → saved PNG path (media-root-relative,
        same file conventions as the audio tools)."""
        from PIL import Image

        img = self.txt2img(text, n_samples=1)
        os.makedirs(os.path.join(self.media_root, "image"), exist_ok=True)
        rel = os.path.join("image", f"{str(uuid.uuid4())[:8]}.png")
        Image.fromarray((img[0] * 255).astype(np.uint8)).save(
            os.path.join(self.media_root, rel))
        return rel
