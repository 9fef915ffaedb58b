"""GPT-2 causal LM (MagicPrompt refiner backbone) — parity vs HF
``GPT2LMHeadModel`` built offline from config (random init), converted
through the ``gpt2`` family."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiogpt_tpu.models.textenc.gpt2 import (GPT2Config, GPT2LM,
                                              MagicPromptRefiner,
                                              greedy_generate)

TINY = GPT2Config(vocab_size=97, n_positions=64, width=32, layers=2,
                  heads=4, eos_id=96)


def _hf_model():
    import torch
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    torch.manual_seed(0)
    hf = GPT2LMHeadModel(HFConfig(
        vocab_size=TINY.vocab_size, n_positions=TINY.n_positions,
        n_embd=TINY.width, n_layer=TINY.layers, n_head=TINY.heads,
        bos_token_id=TINY.eos_id, eos_token_id=TINY.eos_id,
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0))
    hf.eval()
    return hf


@pytest.fixture(scope="module")
def pair():
    from audiogpt_tpu.utils.torch_import import convert_gpt2

    hf = _hf_model()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_gpt2(sd, TINY)
    return hf, GPT2LM(TINY), params


def test_gpt2_logits_parity(pair):
    import torch

    hf, model, params = pair
    toks = np.random.default_rng(0).integers(0, 90, (2, 12)).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(toks)).logits.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(toks, jnp.int32)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_gpt2_greedy_matches_hf_generate(pair):
    import torch

    hf, model, params = pair
    prompt = [5, 17, 33, 42, 8]
    with torch.no_grad():
        ref = hf.generate(torch.tensor([prompt]), max_new_tokens=10,
                          do_sample=False,
                          pad_token_id=TINY.eos_id).numpy()[0]
    ref_cont = [int(t) for t in ref[len(prompt):]]
    while ref_cont and ref_cont[-1] == TINY.eos_id:
        ref_cont.pop()
    got = greedy_generate(model, params, prompt, max_new=10)
    assert got == ref_cont
    # left-padded bucket must not change the trajectory (prompt_len 5 → L=8)
    got16 = greedy_generate(model, params, prompt, max_new=10, min_bucket=16)
    assert got16 == ref_cont


def test_magicprompt_refiner_end_to_end(pair, tmp_path):
    # wire a fixture GPT-2 BPE codec; the refiner must return
    # prompt + decoded continuation (HF pipeline generated_text semantics)
    from tests.test_bpe import _write_fixture
    from audiogpt_tpu.text.bpe import load_gpt2_bpe

    _, vj, mt = _write_fixture(tmp_path)
    codec = load_gpt2_bpe(vj, mt)
    ref = MagicPromptRefiner(TINY, codec=codec, max_new_tokens=4)
    out = ref("the word")
    assert out.startswith("the word")

    # no codec → loud warning, prompt unchanged
    bare = MagicPromptRefiner(TINY, params=ref.params, max_new_tokens=4)
    with pytest.warns(UserWarning, match="unrefined"):
        assert bare("hello") == "hello"


def test_t2i_applies_refiner():
    from audiogpt_tpu.engines.t2i import T2IEngine

    calls = []
    eng = T2IEngine.__new__(T2IEngine)
    eng.text_refiner = lambda t: (calls.append(t) or t + " masterpiece")
    eng.mesh = None
    seen = {}

    def fake_tokenize(texts):
        seen["texts"] = list(texts)
        raise RuntimeError("stop-after-refine")

    eng._tokenize = fake_tokenize
    eng.encode_ids = lambda ids: ids
    with pytest.raises(RuntimeError, match="stop-after-refine"):
        eng.txt2img("a cat", n_samples=1)
    assert calls == ["a cat"]
    assert seen["texts"] == ["a cat masterpiece"]
