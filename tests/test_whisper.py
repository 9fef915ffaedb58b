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
        toks, avg_lp, ns, _ = decode(
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
        toks, _, _, _ = decode(
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


class TestTimestampDecode:
    """whisper ApplyTimestampRules semantics, expressed as carried scan
    state + masks inside the one-program decode (reference behavior:
    ``DecodingOptions()`` defaults ``without_timestamps=False`` and
    ``transcribe()`` — used at ``audio-chatgpt.py:573-575`` — relies on the
    emitted segment timestamps)."""

    TS_BEGIN = 50950  # 50 timestamp tokens in the TINY 51000 vocab

    def _trajectory(self, pair, temperature=0.0, max_tokens=14, seed=0):
        from audiogpt_tpu.models.asr import decode

        _, model, params = pair
        rng = np.random.RandomState(3)
        mel = jnp.asarray(
            rng.randn(2, 2 * TINY.n_audio_ctx, TINY.n_mels).astype(np.float32))
        prompt = jnp.array([[1, 2], [1, 2]], jnp.int32)
        toks, _, _, _ = decode(
            model, params, mel, prompt, max_tokens=max_tokens, eot_id=3,
            suppress_gte=50000, temperature=temperature,
            rng=jax.random.PRNGKey(seed),
            timestamps=True, timestamp_begin=self.TS_BEGIN,
            max_initial_timestamp=10)
        return np.asarray(toks)[:, 2:]

    def _check_rules(self, seq):
        ts = self.TS_BEGIN
        eot = 3
        # cut at EOT
        body = []
        for t in seq:
            if t == eot:
                break
            body.append(int(t))
        assert body, "decode emitted nothing before EOT"
        # first sampled token is a timestamp within the initial cap
        assert body[0] >= ts and body[0] <= ts + 10
        last_ts_val = None
        for j in range(1, len(body)):
            last_was = body[j - 1] >= ts
            penult_was = j < 2 or body[j - 2] >= ts
            cur_is = body[j] >= ts
            if last_was and penult_was:
                assert not cur_is, f"pos {j}: ts after opening pair in {body}"
            if last_was and not penult_was:
                assert cur_is, f"pos {j}: text after lone close in {body}"
        # timestamps never decrease
        stamps = [t for t in body if t >= ts]
        assert stamps == sorted(stamps), f"non-monotonic stamps in {body}"

    def test_greedy_trajectory_obeys_rules(self, pair):
        for row in self._trajectory(pair, temperature=0.0):
            self._check_rules(row)

    def test_sampled_trajectories_obey_rules(self, pair):
        for seed in range(3):
            for row in self._trajectory(pair, temperature=1.0, seed=seed):
                self._check_rules(row)

    def test_timestamp_region_reachable_despite_suppress_gte(self, pair):
        """suppress_gte closes the special region ABOVE eot but the
        timestamp block must stay open in timestamp mode."""
        rows = self._trajectory(pair)
        assert (rows >= self.TS_BEGIN).any()

    def test_bad_timestamp_begin_raises(self, pair):
        from audiogpt_tpu.models.asr import decode

        _, model, params = pair
        mel = jnp.zeros((1, 2 * TINY.n_audio_ctx, TINY.n_mels))
        prompt = jnp.array([[1, 2]], jnp.int32)
        with pytest.raises(ValueError):
            decode(model, params, mel, prompt, max_tokens=4, eot_id=3,
                   timestamps=True, timestamp_begin=TINY.n_vocab + 5)


class TestLanguageProbs:
    def test_lang_probs_shape_and_normalized(self, pair):
        from audiogpt_tpu.models.asr import decode

        _, model, params = pair
        mel = jnp.zeros((2, 2 * TINY.n_audio_ctx, TINY.n_mels))
        prompt = jnp.array([[1, 7], [1, 9]], jnp.int32)
        _, _, _, lp = decode(model, params, mel, prompt, max_tokens=2,
                             eot_id=3, lang_range=(100, 20))
        lp = np.asarray(lp)
        assert lp.shape == (2, 20)
        np.testing.assert_allclose(lp.sum(-1), 1.0, atol=1e-5)

    def test_position0_probs_ignore_later_prompt_tokens(self, pair):
        """Detection reads the logits AFTER consuming only SOT (causal), so
        the language token we assumed at position 1 cannot leak into the
        detection used to correct it — the one-dispatch-when-right design
        (engines/asr.py language=None) is sound."""
        from audiogpt_tpu.models.asr import decode

        _, model, params = pair
        rng = np.random.RandomState(5)
        mel = jnp.asarray(
            rng.randn(1, 2 * TINY.n_audio_ctx, TINY.n_mels).astype(np.float32))
        lp_a = decode(model, params, mel, jnp.array([[1, 7]], jnp.int32),
                      max_tokens=2, eot_id=3, lang_range=(100, 20))[3]
        lp_b = decode(model, params, mel, jnp.array([[1, 15]], jnp.int32),
                      max_tokens=2, eot_id=3, lang_range=(100, 20))[3]
        np.testing.assert_allclose(np.asarray(lp_a), np.asarray(lp_b),
                                   atol=1e-6)


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
