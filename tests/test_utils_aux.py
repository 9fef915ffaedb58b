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
