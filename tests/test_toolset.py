"""Engine wrappers (analysis/transform) + full toolset parity tests."""

import numpy as np
import pytest

from audiogpt_tpu.agent.toolset import build_toolset
from audiogpt_tpu.utils.audio_io import load_wav, save_wav


@pytest.fixture(scope="module")
def tiny_engines(tmp_path_factory):
    """Small-config engines with random params (no checkpoints in tests)."""
    from audiogpt_tpu.engines.analysis import CaptionEngine, SEDEngine, TSDEngine
    from audiogpt_tpu.engines.transform import (
        BinauralEngine, ExtractionEngine, SeparationEngine,
    )
    from audiogpt_tpu.models.caption.captioner import CaptionConfig
    from audiogpt_tpu.models.caption.cnn14 import Cnn14Config
    from audiogpt_tpu.models.sed.panns_sed import SEDConfig
    from audiogpt_tpu.models.sed.tsd import TSDConfig
    from audiogpt_tpu.models.separation.convtasnet import ConvTasNetConfig
    from audiogpt_tpu.models.binaural.binaural import BinauralConfig
    from audiogpt_tpu.models.extraction.lassnet import LASSNetConfig
    from audiogpt_tpu.models.textenc.bert import BertConfig
    from audiogpt_tpu.models.textenc.clap import CLAPTextConfig

    cnn = Cnn14Config(channels=(8, 8, 16, 16, 32, 32))
    bert = BertConfig(vocab_size=500, hidden_size=32, num_layers=1,
                      num_heads=2, intermediate_size=64)
    clap = CLAPTextConfig(bert=bert, d_proj=64)
    return {
        "caption": CaptionEngine(CaptionConfig(
            cnn14=cnn, rnn_hidden=16, vocab_size=50, emb_dim=16, nhead=2,
            nlayers=1, dim_feedforward=32, max_caption_len=8),
            vocab=[f"w{i}" for i in range(50)], max_sec=4.0),
        "sed": SEDEngine(SEDConfig(cnn14=cnn), max_sec=4.0),
        "tsd": TSDEngine(TSDConfig(mel_bins=32, embedding_dim=32,
                                   gru_hidden=16, channels=(4, 8, 8, 8)),
                         clap_cfg=clap, max_sec=4.0),
        "extraction": ExtractionEngine(LASSNetConfig(
            bert=bert, cond_dim=16, enc_channels=(4, 4, 8, 8, 8, 8)),
            max_sec=4.0),
        "enhance": SeparationEngine(ConvTasNetConfig(
            n_src=1, enc_dim=32, bottleneck=8, hidden=16, skip=8,
            n_blocks=2, n_repeats=1)),
        "separate": SeparationEngine(ConvTasNetConfig(
            n_src=2, enc_dim=32, bottleneck=8, hidden=16, skip=8,
            n_blocks=2, n_repeats=1)),
        "binaural": BinauralEngine(BinauralConfig(
            warpnet_layers=2, warpnet_channels=8)),
    }


def _tone(sr, sec=1.0, hz=440.0):
    t = np.arange(int(sr * sec)) / sr
    return (0.2 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


class TestEngines:
    def test_caption(self, tiny_engines):
        cap = tiny_engines["caption"].caption(_tone(32000))
        assert isinstance(cap, str)

    def test_sed(self, tiny_engines):
        events = tiny_engines["sed"].detect(_tone(32000))
        assert len(events) == 10
        assert all(0 <= ev["peak"] <= 1 for ev in events)

    def test_tsd(self, tiny_engines):
        spans = tiny_engines["tsd"].detect(_tone(22050), "a dog barking")
        for s, t in spans:
            assert 0 <= s < t

    def test_extraction(self, tiny_engines):
        wav = _tone(32000)
        out = tiny_engines["extraction"].extract(wav, "the tone")
        assert out.shape == wav.shape
        assert np.isfinite(out).all()

    def test_enhance_and_separate(self, tiny_engines):
        wav = _tone(16000, sec=1.0)
        enh = tiny_engines["enhance"].enhance(wav)
        assert enh.shape == wav.shape
        stems = tiny_engines["separate"].separate(_tone(16000, sec=3.0))
        assert stems.shape[0] == 2
        assert np.isfinite(stems).all()

    def test_binaural(self, tiny_engines):
        wav = _tone(48000, sec=1.0)
        stereo = tiny_engines["binaural"].binauralize(wav)
        assert stereo.shape[0] == 2
        assert abs(stereo.shape[1] - len(wav)) <= 400
        assert np.isfinite(stereo).all()


class TestToolset:
    def test_text_mode_names(self, tiny_engines, tmp_path):
        reg = build_toolset(tiny_engines, root=str(tmp_path), mode="text")
        names = reg.names()
        expected = [
            "Generate Text From The Audio",
            "Detect The Sound Event From The Audio",
            "Target Sound Detection",
            "Extract Sound Event From Mixture Audio Based On Language Description",
            "Speech Enhancement In Single-Channel",
            "Speech Separation In Single-Channel",
            "Sythesize Binaural Audio From A Mono Audio Input",
        ]
        for n in expected:
            assert n in names, f"missing tool {n!r}"

    def test_speech_mode_subset(self, tiny_engines, tmp_path):
        reg = build_toolset(tiny_engines, root=str(tmp_path), mode="speech")
        names = reg.names()
        assert "Generate Binaural Audio From A Mono Audio Input" in names
        assert "Speech Enhancement In Single-Channel" not in names
        assert "Detect The Sound Event From The Audio" not in names

    def test_tool_roundtrip(self, tiny_engines, tmp_path):
        reg = build_toolset(tiny_engines, root=str(tmp_path), mode="text")
        src = str(tmp_path / "in.wav")
        save_wav(_tone(16000), src, 16000)
        out = reg.get("Speech Enhancement In Single-Channel")(src)
        assert out.endswith(".wav")
        wav, sr = load_wav(str(tmp_path / out) if not out.startswith("/")
                           else out)
        assert sr == 16000 and len(wav) > 0

    def test_tsd_tool_string_io(self, tiny_engines, tmp_path):
        reg = build_toolset(tiny_engines, root=str(tmp_path), mode="text")
        src = str(tmp_path / "q.wav")
        save_wav(_tone(22050), src, 22050)
        res = reg.get("Target Sound Detection")(f"{src}, a siren")
        assert isinstance(res, str) and res


class TestSEDPlot:
    def test_plot_artifact(self, tiny_engines, tmp_path):
        out = str(tmp_path / "sed.png")
        sr = 32000
        t = np.arange(sr) / sr
        wav = (0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        path = tiny_engines["sed"].plot(wav, out)
        assert path == out
        import os
        assert os.path.getsize(out) > 5000  # a real PNG, not an empty file

    def test_sed_tool_returns_image(self, tiny_engines, tmp_path):
        from audiogpt_tpu.agent.toolset import build_toolset
        reg = build_toolset(tiny_engines, root=str(tmp_path), mode="text")
        tool = reg.get("Detect The Sound Event From The Audio")
        assert tool.media_kind == "image"
        src = str(tmp_path / "s.wav")
        save_wav(_tone(32000), src, 32000)
        out = tool(src)
        assert out.endswith(".png")
