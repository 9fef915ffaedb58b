"""Cross-request micro-batching (serving/batcher.py): coalescing,
correctness vs single-call synthesis, and error propagation."""

import threading
import time

import numpy as np
import pytest

from audiogpt_tpu.serving.batcher import BatchedTTS, MicroBatcher


class TestMicroBatcher:
    def test_single_item(self):
        b = MicroBatcher(lambda xs: [x * 2 for x in xs], window_ms=1.0)
        try:
            assert b(21) == 42
        finally:
            b.close()

    def test_concurrent_calls_coalesce(self):
        seen = []

        def fn(xs):
            seen.append(len(xs))
            time.sleep(0.01)
            return [x + 1 for x in xs]

        b = MicroBatcher(fn, max_batch=8, window_ms=200.0)
        try:
            # enqueue all items from one thread (sub-ms) — the worker's
            # linger window is 200 ms, so they MUST coalesce regardless of
            # machine load
            futs = [b.submit(i) for i in range(8)]
            results = [f.result(timeout=30) for f in futs]
            assert results == [i + 1 for i in range(8)]
            assert sum(seen) == 8
            assert len(seen) <= 2
            assert max(seen) >= 4
        finally:
            b.close()

    def test_error_propagates_to_all_waiters(self):
        def fn(xs):
            raise ValueError("boom")

        b = MicroBatcher(fn, window_ms=1.0)
        try:
            with pytest.raises(ValueError, match="boom"):
                b(1)
        finally:
            b.close()

    def test_wrong_result_count_raises(self):
        b = MicroBatcher(lambda xs: [0], max_batch=4, window_ms=30.0)
        try:
            futs = [b.submit(i) for i in range(2)]
            excs = [f.exception(timeout=5) for f in futs]
            assert any("results" in str(e) for e in excs if e)
        finally:
            b.close()

    def test_closed_rejects(self):
        b = MicroBatcher(lambda xs: xs, window_ms=1.0)
        b.close()
        with pytest.raises(RuntimeError, match="closed"):
            b.submit(1)


@pytest.fixture(scope="module")
def tts_engine():
    from audiogpt_tpu.engines.tts import TTSEngine

    return TTSEngine()


class TestBatchSynthesize:
    def test_matches_single_calls(self, tts_engine):
        texts = ["hello there", "a somewhat longer benchmark sentence here"]
        batch = tts_engine.batch_synthesize(texts)
        for t, got in zip(texts, batch):
            single = tts_engine(t)
            assert got.shape == single.shape
            # both paths run the fused int16 program; allow one int16 step
            # for float rounding differences across batch shapes
            np.testing.assert_allclose(got, single, atol=1.5 / 32767.0)

    def test_batched_proxy_serves_concurrent(self, tts_engine):
        proxy = BatchedTTS(tts_engine, window_ms=30.0)
        try:
            texts = ["one", "two", "three", "four"]
            outs = [None] * len(texts)

            def call(i):
                outs[i] = proxy(texts[i])

            threads = [threading.Thread(target=call, args=(i,))
                       for i in range(len(texts))]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            for i, t in enumerate(texts):
                ref = tts_engine(t)
                np.testing.assert_allclose(outs[i], ref, atol=1.5 / 32767.0)
            assert proxy.sample_rate == tts_engine.sample_rate  # attr proxy
        finally:
            proxy.batcher.close()


def test_batched_asr_matches_single():
    """BatchedASR proxy: concurrent transcribe calls coalesce into one
    [B, T] whisper program and return the same texts as single calls."""
    from audiogpt_tpu.engines.asr import ASREngine
    from audiogpt_tpu.models.asr.whisper import WhisperConfig
    from audiogpt_tpu.serving.batcher import BatchedASR

    cfg = WhisperConfig(n_audio_state=64, n_audio_head=2, n_audio_layer=1,
                        n_text_state=64, n_text_head=2, n_text_layer=1,
                        n_vocab=200)
    # temperatures=(0.0,): deterministic single-rung decode — at t>0 the
    # categorical draws are batch-shape-dependent, so single-vs-batched
    # agreement is only pinned for the greedy rung
    eng = ASREngine(cfg=cfg, max_tokens=6, temperatures=(0.0,))
    rng = np.random.RandomState(0)
    wavs = [(rng.randn(16000) * 0.05).astype(np.float32) for _ in range(3)]
    singles = [eng.transcribe(w) for w in wavs]

    proxy = BatchedASR(eng, window_ms=100.0)
    try:
        futs = [proxy.batcher.submit(w) for w in wavs]
        batched = [f.result(timeout=120) for f in futs]
        assert proxy.batcher.batches <= 2
        assert proxy.max_tokens == eng.max_tokens      # attr proxy works
    finally:
        proxy.batcher.close()
    # compare decode agreement; exact argmax equality across differently
    # shaped XLA programs is not guaranteed for near-tied logits, so allow
    # a small per-transcript token disagreement
    agree = sum(b == s for b, s in zip(batched, singles))
    assert agree >= 2, (batched, singles)
