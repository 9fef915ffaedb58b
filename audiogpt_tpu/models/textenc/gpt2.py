"""GPT-2-class causal LM — the MagicPrompt prompt refiner's backbone.

The reference's T2I tool runs a GPT-2 (``Gustavosta/MagicPrompt-Stable-
Diffusion``) over the user prompt before StableDiffusion
(``audio-chatgpt.py:112-125``: ``pipeline("text-generation", ...)`` →
``generated_text``). Here the same capability is a flax pre-LN transformer
with tied input/output embeddings, decoded greedily as ONE compiled
``lax.scan`` program with a static-shape KV cache — the BLIP decode pattern
(``models/caption/blip.py``), prompt-length bucketed with LEFT padding so
one program serves all prompts in a bucket.

Weights import from any HF ``GPT2LMHeadModel`` checkpoint via the ``gpt2``
converter family (``utils/torch_import.py``); text I/O uses the GPT-2
byte-level BPE codec (``text/bpe.py load_bpe_dir``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audiogpt_tpu.ops.attention import KVCache, attention


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    width: int = 768
    layers: int = 12
    heads: int = 12
    ln_eps: float = 1e-5
    eos_id: int = 50256


class _Block(nn.Module):
    cfg: GPT2Config

    def setup(self):
        d = self.cfg.width
        self.ln_1 = nn.LayerNorm(epsilon=self.cfg.ln_eps, name="ln_1")
        self.c_attn = nn.Dense(3 * d, name="c_attn")
        self.c_proj = nn.Dense(d, name="c_proj")
        self.ln_2 = nn.LayerNorm(epsilon=self.cfg.ln_eps, name="ln_2")
        self.c_fc = nn.Dense(4 * d, name="c_fc")
        self.mlp_proj = nn.Dense(d, name="mlp_proj")

    def _split(self, t):
        return t.reshape(t.shape[0], t.shape[1], self.cfg.heads,
                         self.cfg.width // self.cfg.heads)

    def __call__(self, x, cache: KVCache | None = None, kv_valid=None):
        h = self.ln_1(x)
        q, k, v = (self._split(t) for t in
                   jnp.split(self.c_attn(h), 3, axis=-1))
        if cache is not None:
            cache = cache.update(k, v)
            k, v = cache.k, cache.v
            tq = q.shape[1]
            kpos = jnp.arange(k.shape[1])[None, None, None, :]
            qpos = (cache.index - tq + jnp.arange(tq))[None, None, :, None]
            mask = kpos <= qpos                      # causal over the cache
            if kv_valid is not None:                 # left-pad exclusion
                mask = mask & (kv_valid[:, None, None, :] > 0)
            a = attention(q, k, v, mask=mask)
        else:
            a = attention(q, k, v, is_causal=True,
                          kv_mask=kv_valid)
        x = x + self.c_proj(a.reshape(h.shape))
        h = self.ln_2(x)
        # HF GPT-2 uses gelu_new (tanh approximation)
        x = x + self.mlp_proj(jax.nn.gelu(self.c_fc(h), approximate=True))
        return (x, cache) if cache is not None else x


class GPT2LM(nn.Module):
    cfg: GPT2Config = GPT2Config()

    def setup(self):
        cfg = self.cfg
        self.wte = nn.Embed(cfg.vocab_size, cfg.width, name="wte")
        self.wpe = self.param("wpe", nn.initializers.normal(0.02),
                              (cfg.n_positions, cfg.width))
        self.blocks = [_Block(cfg, name=f"h{i}") for i in range(cfg.layers)]
        self.ln_f = nn.LayerNorm(epsilon=cfg.ln_eps, name="ln_f")

    def __call__(self, tokens, pos_ids=None, caches=None, kv_valid=None):
        """tokens [B, t] → logits [B, t, vocab] (tied head: x @ wteᵀ).

        ``pos_ids`` [B, t] gives explicit positions (left-padded prompts use
        cumsum-style positions, HF ``attention_mask`` semantics). With
        ``caches`` runs incremental decode → (logits, new_caches).
        """
        if pos_ids is None:
            pos_ids = jnp.arange(tokens.shape[1])[None]
        x = self.wte(tokens) + jnp.take(self.wpe, pos_ids, axis=0)
        new_caches = [] if caches is not None else None
        for i, blk in enumerate(self.blocks):
            if caches is not None:
                x, c = blk(x, cache=caches[i], kv_valid=kv_valid)
                new_caches.append(c)
            else:
                x = blk(x, kv_valid=kv_valid)
        x = self.ln_f(x)
        logits = x @ self.wte.embedding.T
        return (logits, new_caches) if caches is not None else logits


# ---------------------------------------------------------------------------
# Greedy generation as one compiled program (per prompt-length bucket)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _generate_fn(model: GPT2LM, prompt_len: int, max_new: int):
    cfg = model.cfg
    heads, d = cfg.heads, cfg.width // cfg.heads
    eos = cfg.eos_id

    @jax.jit
    def run(params, tokens, valid):
        """tokens [B, L] LEFT-padded (pads carry eos), valid [B, L] 1=real
        → generated [B, max_new] (eos-padded after stop)."""
        b, L = tokens.shape
        total = L + max_new
        kv_valid = jnp.concatenate(
            [valid, jnp.ones((b, max_new), valid.dtype)], axis=1)
        pos_ids = jnp.maximum(jnp.cumsum(valid, axis=1) - 1, 0)
        caches = [KVCache.create(b, total, heads, d)
                  for _ in range(cfg.layers)]
        logits, caches = model.apply(params, tokens, pos_ids, caches,
                                     kv_valid)
        last = jnp.argmax(logits[:, -1], axis=-1)
        plen = jnp.sum(valid, axis=1)               # true prompt lengths [B]

        def step(carry, i):
            last, caches, done = carry
            tok = jnp.where(done, eos, last)
            logits, caches = model.apply(
                params, tok[:, None], (plen + i)[:, None], caches, kv_valid)
            nxt = jnp.argmax(logits[:, -1], axis=-1)
            done = done | (tok == eos)
            return (nxt, caches, done), tok

        (_, _, _), out = jax.lax.scan(
            step, (last, caches, jnp.zeros((b,), bool)),
            jnp.arange(max_new))
        return out.T.astype(jnp.int32)

    return run


def greedy_generate(model: GPT2LM, params, prompt_ids: list[int],
                    max_new: int = 40, min_bucket: int = 8) -> list[int]:
    """One prompt → greedy continuation ids (stops at the first EOS).
    Prompt length buckets onto the dyadic ladder so each (bucket, max_new)
    compiles once (CLAUDE.md jit-caching contract)."""
    n = max(len(prompt_ids), 1)
    L = min_bucket
    while L < n:
        L *= 2
    toks = np.full((1, L), model.cfg.eos_id, np.int32)
    val = np.zeros((1, L), np.int32)
    toks[0, L - len(prompt_ids):] = prompt_ids
    val[0, L - len(prompt_ids):] = 1
    out = np.asarray(_generate_fn(model, L, max_new)(
        params, jnp.asarray(toks), jnp.asarray(val)))[0]
    ids = []
    for t in out:
        if int(t) == model.cfg.eos_id:
            break
        ids.append(int(t))
    return ids


class MagicPromptRefiner:
    """user prompt → SD-flavored prompt, the reference's text_refine slot
    (``audio-chatgpt.py:112-125``: HF pipeline default = greedy to
    ``max_length`` 50, ``generated_text`` = prompt + continuation).

    ``codec``: a GPT-2 ByteBPE (``text/bpe.py``) or any str↔ids pair of
    callables; MagicPrompt ckpt dirs carry their vocab (``load_bpe_dir``).
    """

    def __init__(self, cfg: GPT2Config | None = None, params=None,
                 codec=None, max_new_tokens: int = 40, rng_seed: int = 0):
        self.cfg = cfg or GPT2Config()
        self.model = GPT2LM(self.cfg)
        self.codec = codec
        self.max_new_tokens = max_new_tokens
        if params is None:
            params = self.model.init(jax.random.PRNGKey(rng_seed),
                                     jnp.zeros((1, 4), jnp.int32))
        self.params = params

    def __call__(self, text: str) -> str:
        if self.codec is None:
            from audiogpt_tpu.text.bpe import warn_fallback

            warn_fallback("MagicPromptRefiner",
                          "no GPT-2 codec wired: returning the prompt "
                          "unrefined")
            return text
        ids = self.codec.encode(text)
        if not ids:
            return text
        cont = greedy_generate(self.model, self.params, ids,
                               self.max_new_tokens)
        return (text + self.codec.decode(cont)).strip()
