"""Profiling + DTW utility tests."""

import numpy as np

from audiogpt_tpu.dsp.dtw import dtw, mel_cepstral_distortion
from audiogpt_tpu.utils.profiling import RTFMeter, Timer


def test_timer_accumulates():
    Timer.reset()
    import time
    for _ in range(3):
        with Timer("unit"):
            time.sleep(0.01)
    rep = Timer.report()["unit"]
    assert rep["calls"] == 3 and rep["total_s"] >= 0.03


def test_rtf_meter():
    m = RTFMeter()
    with m.measure(audio_s=2.0):
        pass
    assert m.calls == 1 and m.rtf < 0.5


def test_dtw_identity():
    x = np.random.default_rng(0).normal(size=(20, 4))
    cost, acc, path = dtw(x, x)
    assert cost < 1e-9
    np.testing.assert_array_equal(path[:, 0], path[:, 1])


def test_dtw_shift_alignment():
    t = np.linspace(0, 4 * np.pi, 50)
    x = np.sin(t)[:, None]
    y = np.sin(t - 0.5)[:, None]          # lagged copy
    cost_aligned, _, path = dtw(x, y)
    cost_raw = float(np.abs(x - y).sum())
    assert cost_aligned < cost_raw        # warping reduces the distance
    # path is monotonic
    assert (np.diff(path[:, 0]) >= 0).all() and (np.diff(path[:, 1]) >= 0).all()


def test_mcd_zero_for_identical():
    mel = np.random.default_rng(1).normal(size=(30, 10))
    assert mel_cepstral_distortion(mel, mel) < 1e-9


def test_infer_cli_enhance_and_tts(tmp_path, monkeypatch):
    """python -m audiogpt_tpu.infer_cli — the reference's per-model
    __main__ demos as one registry-driven entry point."""
    import numpy as np

    import audiogpt_tpu.app as app
    from audiogpt_tpu.infer_cli import main
    from audiogpt_tpu.utils.audio_io import load_wav, save_wav

    # tiny engines injected through the factory registry
    def tiny_enhance():
        from audiogpt_tpu.engines.transform import SeparationEngine
        from audiogpt_tpu.models.separation.convtasnet import ConvTasNetConfig

        return SeparationEngine(ConvTasNetConfig(
            n_src=1, enc_dim=32, bottleneck=8, hidden=16, skip=8,
            n_blocks=2, n_repeats=1))

    def tiny_tts():
        from audiogpt_tpu.engines.tts import TTSEngine
        from audiogpt_tpu.engines.vocoder import VocoderEngine
        from audiogpt_tpu.models.tts.fastspeech2 import FastSpeech2Config
        from audiogpt_tpu.models.vocoder.hifigan import HifiGANConfig

        voc = VocoderEngine("hifigan", cfg=HifiGANConfig(
            in_channels=20, upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
            upsample_initial_channel=16, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),), sample_rate=22050),
            buckets=(64, 256))
        return TTSEngine(cfg=FastSpeech2Config(
            vocab_size=90, hidden_size=16, enc_layers=1, dec_layers=1,
            num_heads=2, enc_ffn_kernel_size=3, dec_ffn_kernel_size=3,
            n_mels=20, dur_predictor_layers=1, predictor_layers=1,
            predictor_hidden=8, max_frames=256), vocoder=voc)

    monkeypatch.setitem(app._FACTORIES, "enhance", tiny_enhance)
    monkeypatch.setitem(app._FACTORIES, "tts", tiny_tts)

    src = str(tmp_path / "in.wav")
    sr = 16000
    save_wav(np.random.default_rng(0).normal(size=sr).astype(np.float32) * 0.1,
             src, sr)
    out = str(tmp_path / "clean.wav")
    assert main(["--engine", "enhance", "--in", src, "--out", out]) == 0
    wav, osr = load_wav(out)
    assert osr == sr and len(wav) == sr

    out2 = str(tmp_path / "speech.wav")
    assert main(["--engine", "tts", "--text", "hello there",
                 "--out", out2]) == 0
    wav2, osr2 = load_wav(out2)
    assert osr2 == 22050 and len(wav2) > 0
