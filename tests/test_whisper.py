"""Whisper ASR parity vs HF transformers WhisperModel (random weights) and
greedy-decode machinery tests."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audiogpt_tpu.models.asr import (
    WhisperConfig,
    WhisperModel,
    greedy_decode,
    whisper_log_mel,
)
from audiogpt_tpu.utils.torch_import import convert_whisper

from audiogpt_tpu.models.asr.whisper import sinusoids


TINY = WhisperConfig(
    n_mels=80,
    n_audio_ctx=100,
    n_audio_state=64,
    n_audio_head=4,
    n_audio_layer=2,
    n_vocab=51000,
    n_text_ctx=50,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def pair():
    from transformers import WhisperConfig as HFConfig, WhisperModel as HFModel

    hf_cfg = HFConfig(
        d_model=TINY.n_audio_state,
        encoder_layers=TINY.n_audio_layer,
        decoder_layers=TINY.n_text_layer,
        encoder_attention_heads=TINY.n_audio_head,
        decoder_attention_heads=TINY.n_text_head,
        num_mel_bins=TINY.n_mels,
        max_source_positions=TINY.n_audio_ctx,
        max_target_positions=TINY.n_text_ctx,
        vocab_size=TINY.n_vocab,
        encoder_ffn_dim=TINY.n_audio_state * 4,
        decoder_ffn_dim=TINY.n_text_state * 4,
        activation_function="gelu",
        dropout=0.0,
    )
    torch.manual_seed(0)
    ref = HFModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_whisper(sd, TINY)
    return ref, WhisperModel(TINY), params


class TestWhisperParity:
    def test_encoder_matches_hf(self, pair):
        ref, model, params = pair
        rng = np.random.RandomState(0)
        mel = rng.randn(1, 2 * TINY.n_audio_ctx, TINY.n_mels).astype(np.float32)
        with torch.no_grad():
            y_ref = ref.encoder(
                torch.from_numpy(mel.transpose(0, 2, 1))
            ).last_hidden_state.numpy()
        y = np.asarray(model.apply(params, jnp.asarray(mel), method=WhisperModel.encode))
        assert y.shape == y_ref.shape
        np.testing.assert_allclose(y, y_ref, atol=2e-4)

    def test_full_forward_matches_hf(self, pair):
        ref, model, params = pair
        rng = np.random.RandomState(1)
        mel = rng.randn(1, 2 * TINY.n_audio_ctx, TINY.n_mels).astype(np.float32)
        tokens = rng.randint(0, TINY.n_vocab, (1, 7))
        with torch.no_grad():
            out_ref = ref(
                input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
                decoder_input_ids=torch.from_numpy(tokens),
            ).last_hidden_state.numpy()
        # our __call__ returns logits = hidden @ E^T; compare hidden via a
        # separate decoder run is awkward — instead project the ref hidden too
        emb = np.asarray(params["params"]["decoder"]["token_embedding"]["embedding"])
        logits_ref = out_ref @ emb.T
        logits = np.asarray(model.apply(params, jnp.asarray(mel), jnp.asarray(tokens)))
        np.testing.assert_allclose(logits, logits_ref, atol=2e-3)

    def test_incremental_decode_matches_full(self, pair):
        """KV-cached decode must produce identical logits to the full forward."""
        _, model, params = pair
        rng = np.random.RandomState(2)
        mel = rng.randn(1, 2 * TINY.n_audio_ctx, TINY.n_mels).astype(np.float32)
        tokens = rng.randint(0, TINY.n_vocab, (1, 6))
        full = np.asarray(model.apply(params, jnp.asarray(mel), jnp.asarray(tokens)))

        from audiogpt_tpu.ops.attention import KVCache

        xa = model.apply(params, jnp.asarray(mel), method=WhisperModel.encode)
        caches = [
            KVCache.create(1, 6, TINY.n_text_head, TINY.n_text_state // TINY.n_text_head)
            for _ in range(TINY.n_text_layer)
        ]
        outs = []
        for i in range(6):
            logits, caches = model.apply(
                params, jnp.asarray(tokens[:, i : i + 1]), xa, i, caches,
                method=WhisperModel.decode_step,
            )
            outs.append(np.asarray(logits)[:, 0])
        inc = np.stack(outs, axis=1)
        np.testing.assert_allclose(inc, full, atol=1e-3)

    def test_greedy_decode_runs_and_stops(self, pair):
        _, model, params = pair
        mel = jnp.zeros((2, 2 * TINY.n_audio_ctx, TINY.n_mels))
        prompt = jnp.array([[1, 2], [1, 2]], jnp.int32)
        toks = greedy_decode(model, params, mel, prompt, max_tokens=8, eot_id=3)
        assert toks.shape == (2, 10)
        assert np.array_equal(np.asarray(toks[:, :2]), np.asarray(prompt))

    def test_suppression_mask_pinned(self, pair):
        """Suppressed ids can never be emitted (whisper SuppressTokens):
        suppress everything except a tiny allowed set — the decode must emit
        only allowed ids / EOT, and the suppress_gte region stays closed."""
        from audiogpt_tpu.models.asr import decode

        _, model, params = pair
        mel = jnp.zeros((2, 2 * TINY.n_audio_ctx, TINY.n_mels))
        prompt = jnp.array([[1, 2], [1, 2]], jnp.int32)
        allowed = {5, 6, 7, 3}  # 3 = EOT
        suppress = tuple(i for i in range(TINY.n_vocab)
                         if i not in allowed and i < 40000)
        toks, avg_lp, ns = decode(
            model, params, mel, prompt, max_tokens=8, eot_id=3,
            suppress=suppress, suppress_gte=40000)
        body = np.asarray(toks)[:, 2:]
        assert set(body.ravel().tolist()) <= allowed
        assert avg_lp.shape == (2,) and np.all(np.asarray(avg_lp) <= 0)
        assert np.allclose(np.asarray(ns), 0.0)  # no no_speech_id wired

    def test_blank_suppression_first_token_only(self, pair):
        """blank_ids (space/EOT) are barred from the FIRST sampled position
        (whisper SuppressBlank) but stay available later — force it by
        suppressing everything except {8, EOT}: with EOT blank-suppressed
        the first token MUST be 8, and the decode still terminates."""
        from audiogpt_tpu.models.asr import decode

        _, model, params = pair
        mel = jnp.zeros((1, 2 * TINY.n_audio_ctx, TINY.n_mels))
        prompt = jnp.array([[1, 2]], jnp.int32)
        suppress = tuple(i for i in range(40000) if i not in (8, 3))
        toks, _, _ = decode(
            model, params, mel, prompt, max_tokens=6, eot_id=3,
            suppress=suppress, suppress_gte=40000, blank_ids=(3,))
        body = np.asarray(toks)[0, 2:]
        assert body[0] == 8            # EOT was suppressed at position 0
        assert set(body.tolist()) <= {8, 3}

    def test_temperature_is_traced_not_compiled(self, pair):
        """t=0 (argmax) and t>0 (categorical) must share ONE compiled
        program — the fallback ladder re-dispatches, never re-compiles."""
        from audiogpt_tpu.models.asr import decode
        from audiogpt_tpu.models.asr.whisper import _decode_fn

        _, model, params = pair
        mel = jnp.zeros((1, 2 * TINY.n_audio_ctx, TINY.n_mels))
        prompt = jnp.array([[1, 2]], jnp.int32)
        before = _decode_fn.cache_info().currsize
        a = decode(model, params, mel, prompt, max_tokens=4, eot_id=3,
                   temperature=0.0)
        b = decode(model, params, mel, prompt, max_tokens=4, eot_id=3,
                   temperature=0.8, rng=jax.random.PRNGKey(7))
        assert _decode_fn.cache_info().currsize == before + 1
        assert a[0].shape == b[0].shape


class TestWhisperFrontend:
    def test_log_mel_shape_and_scale(self):
        wav = jnp.zeros((16000,))
        m = whisper_log_mel(wav)
        assert m.shape == (100, 80)
        # silence → floor at (max-8+4)/4
        assert np.allclose(np.asarray(m).max() - np.asarray(m).min(), 0.0, atol=2.01)

    def test_matches_whisper_formula(self):
        """Independent numpy re-derivation of whisper's log_mel_spectrogram."""
        rng = np.random.RandomState(0)
        wav = (0.1 * rng.randn(16000)).astype(np.float32)
        spec = torch.stft(
            torch.from_numpy(wav), 400, 160,
            window=torch.hann_window(400), center=True,
            pad_mode="reflect", return_complex=True,
        ).abs().numpy() ** 2
        spec = spec[:, :-1]
        from audiogpt_tpu.dsp.mel import mel_filterbank

        fb = mel_filterbank(16000, 400, 80, 0.0, 8000.0)
        mel = fb.T @ spec
        log_spec = np.log10(np.maximum(mel, 1e-10))
        log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
        ref = ((log_spec + 4.0) / 4.0).T
        ours = np.asarray(whisper_log_mel(jnp.asarray(wav)))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_sinusoids_match_whisper(self):
        """Whisper's sinusoid table formula (log-spaced timescales)."""
        s = sinusoids(10, 8)
        inc = np.log(10000) / 3
        inv = np.exp(-inc * np.arange(4))
        t = np.arange(10)[:, None] * inv[None, :]
        ref = np.concatenate([np.sin(t), np.cos(t)], axis=1)
        np.testing.assert_allclose(s, ref, atol=1e-6)
