"""Regression guard for the fresh-jit-per-call bug class.

Building a new ``jax.jit`` wrapper inside a per-request function re-traces
and re-compiles on EVERY call (measured: streaming separation 1.36 s/call →
33 ms, whisper transcription 0.95× realtime → 212×). These tests pin the
cached-program contract: the decode/stream helpers must return the SAME
compiled callable for repeated lookups.
"""

import jax.numpy as jnp
import numpy as np


def test_separation_fn_cached():
    from audiogpt_tpu.models.separation.convtasnet import (
        ConvTasNet, ConvTasNetConfig, _sep_fn,
    )

    m = ConvTasNet(ConvTasNetConfig())
    assert _sep_fn(m) is _sep_fn(m)
    assert _sep_fn(m) is _sep_fn(ConvTasNet(ConvTasNetConfig()))


def test_binaural_fn_cached():
    from audiogpt_tpu.models.binaural.binaural import (
        BinauralConfig, BinauralNetwork, _binaural_fn,
    )

    m = BinauralNetwork(BinauralConfig())
    assert _binaural_fn(m) is _binaural_fn(m)


def test_whisper_decode_fn_cached():
    from audiogpt_tpu.models.asr.whisper import (
        WhisperConfig, WhisperModel, _decode_fn,
    )

    m = WhisperModel(WhisperConfig(n_audio_layer=1, n_text_layer=1))
    assert _decode_fn(m, 16, 50257) is _decode_fn(m, 16, 50257)
    assert _decode_fn(m, 16, 50257) is not _decode_fn(m, 32, 50257)


def test_caption_decode_fns_cached():
    from audiogpt_tpu.models.caption.captioner import (
        CaptionConfig, CaptionModel, _beam_fn, _greedy_fn,
    )
    from audiogpt_tpu.models.caption.cnn14 import Cnn14Config

    m = CaptionModel(CaptionConfig(cnn14=Cnn14Config(channels=(4, 8)),
                                   nlayers=1))
    assert _greedy_fn(m) is _greedy_fn(m)
    assert _beam_fn(m, 3, 1.0) is _beam_fn(m, 3, 1.0)
    assert _beam_fn(m, 3, 1.0) is not _beam_fn(m, 2, 1.0)


def test_download_rows_bounded_ladder():
    """Valid-sample downloads must ride a BOUNDED set of slice widths
    (canvas S and S>>1..S>>3), never a shape-specialized slice per distinct
    valid length — per-`end` slices compile a fresh program each (measured
    minutes apiece on a degraded compile service)."""
    from audiogpt_tpu.engines.base import Engine

    S = 1024
    arr = jnp.arange(4 * S, dtype=jnp.int16).reshape(4, S)
    ref = np.asarray(arr)
    allowed = {S >> k for k in range(Engine.DOWNLOAD_LEVELS + 1)}
    widths = set()
    for ends in ([5], [1], [S], [200, 90], [S // 8, S // 8 + 1], [777, 3]):
        block = Engine.download_rows(arr, ends)
        widths.add(block.shape[-1])
        assert block.shape[-1] >= max(ends)
        assert block.shape[-1] in allowed
        for r, e in enumerate(ends):
            np.testing.assert_array_equal(block[r, :e], ref[r, :e])
    assert widths <= allowed
