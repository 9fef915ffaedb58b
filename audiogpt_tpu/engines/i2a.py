"""Image→audio engine (the reference's I2A tool, ``audio-chatgpt.py:214``).

Same latent-diffusion core as T2A but conditioned on the L2-normalized CLIP
image embedding as a length-1 context (``img2audio``:232-253: DDIM S=100,
scale 3, 1 sample, fixed seed 55), unconditional branch = CLIP text
embedding of ``""``. Shares the T2A engine's UNet/VAE/vocoder — one params
tree serves both tools (the reference loads a second full ckpt).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audiogpt_tpu.registry import ENGINES
from audiogpt_tpu.engines.base import Engine
from audiogpt_tpu.engines.t2a import T2AEngine
from audiogpt_tpu.models.textenc.clip import (
    CLIPTextConfig, CLIPTextTower, CLIPVisionConfig, CLIPVisionEncoder,
    preprocess_image,
)


@ENGINES.register("i2a")
class I2AEngine(Engine):
    name = "i2a"

    def __init__(self, t2a: T2AEngine,
                 vision_cfg: CLIPVisionConfig | None = None,
                 text_cfg: CLIPTextConfig | None = None,
                 vision_params=None, text_params=None, rng_seed: int = 0):
        super().__init__()
        self.t2a = t2a
        ctx_dim = t2a.cfg.unet.context_dim
        self.vision_cfg = vision_cfg or CLIPVisionConfig(embed_dim=ctx_dim)
        self.text_cfg = text_cfg or CLIPTextConfig(embed_dim=ctx_dim)
        if self.vision_cfg.embed_dim != ctx_dim:
            raise ValueError(
                f"CLIP embed_dim {self.vision_cfg.embed_dim} must match UNet "
                f"context_dim {ctx_dim}")
        self.vision = CLIPVisionEncoder(self.vision_cfg)
        self.text = CLIPTextTower(self.text_cfg)
        k1, k2 = jax.random.split(jax.random.PRNGKey(rng_seed))
        if vision_params is None:
            size = self.vision_cfg.image_size
            vision_params = self.vision.init(k1, jnp.zeros((1, size, size, 3)))
        if text_params is None:
            text_params = self.text.init(
                k2, jnp.zeros((1, self.text_cfg.context_length), jnp.int32))
        self.vision_params = vision_params
        self.text_params = text_params

    @functools.cached_property
    def _embed_img(self):
        return jax.jit(lambda p, img: self.vision.apply(p, img))

    @functools.cached_property
    def _uncond(self) -> jnp.ndarray:
        """normalized CLIP text embedding of '' as [1, 1, D] (modules.py:338)."""
        toks = np.zeros((1, self.text_cfg.context_length), np.int32)
        toks[0, 0] = 1  # start token; EOT pooling picks the max id
        z = self.text.apply(self.text_params, jnp.asarray(toks))
        return z[:, None, :]

    def embed_image(self, image) -> jnp.ndarray:
        """image path / array → [1, 1, D] context."""
        arr = preprocess_image(image, self.vision_cfg.image_size)
        z = self._embed_img(self.vision_params, jnp.asarray(arr))
        return z[:, None, :]

    def img2audio(self, image, seed: int = 55, scale: float = 3.0,
                  ddim_steps: int = 100):
        """→ (wav, sample_rate) — reference defaults (audio-chatgpt.py:232)."""
        t2a = self.t2a
        cfg = t2a.cfg
        ctx = self.embed_image(image)
        h, w = cfg.latent_hw
        rng = jax.random.PRNGKey(seed)
        rng, krng = jax.random.split(rng)
        x_T = jax.random.normal(krng, (1, h, w, cfg.unet.in_channels))
        if t2a._can_fuse_vocoder():
            # one device roundtrip: sampler + VAE + vocoder (see t2a)
            _, wav = t2a._sample_vocode_fn(
                t2a.params, t2a.vocoder.params, ctx, self._uncond, rng, x_T,
                scale, ddim_steps, h, w, "ddim")
            return np.asarray(wav)[0], cfg.sample_rate
        mel = t2a._sample_fn(t2a.params, ctx, self._uncond, rng, x_T, scale,
                             ddim_steps, h, w)
        mel = np.asarray(mel)[0, :, :, 0].T  # [frames, 80]
        if t2a.vocoder is None:
            return mel, cfg.sample_rate
        return t2a.vocoder(mel), cfg.sample_rate

    def __call__(self, image_path: str):
        return self.img2audio(image_path)
