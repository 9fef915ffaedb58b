"""Golden tests for the shared DSP frontend.

librosa isn't installed in this image, so golden values come from two
independent oracles: ``torch.stft`` (same math librosa uses) for STFT, and a
from-the-paper numpy implementation of the Slaney mel filterbank written
inside this test (independent code path from audiogpt_tpu.dsp.mel).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from audiogpt_tpu.dsp import (
    stft,
    istft,
    spectrogram,
    mel_filterbank,
    log_mel,
    ldm_normalize,
    LDM_MEL_16K,
    PANNS_MEL_32K,
    resample,
)
from audiogpt_tpu.dsp.mel import ldm_mel
from audiogpt_tpu.dsp.window import hann_window


def _sig(n=16000, sr=16000, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / sr
    x = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 2000 * t)
        + 0.05 * rng.randn(n)
    )
    return x.astype(np.float32)


class TestSTFT:
    @pytest.mark.parametrize("pad_mode", ["constant", "reflect"])
    def test_matches_torch_stft(self, pad_mode):
        x = _sig()
        ours = np.asarray(stft(jnp.asarray(x), 1024, 256, pad_mode=pad_mode))
        ref = torch.stft(
            torch.from_numpy(x),
            n_fft=1024,
            hop_length=256,
            window=torch.hann_window(1024, periodic=True),
            center=True,
            pad_mode=pad_mode,
            return_complex=True,
        ).numpy().T  # torch is [freq, frames]
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)

    def test_win_length_lt_nfft(self):
        x = _sig()
        ours = np.asarray(stft(jnp.asarray(x), 1024, 256, win_length=800))
        ref = torch.stft(
            torch.from_numpy(x),
            n_fft=1024, hop_length=256, win_length=800,
            window=torch.hann_window(800, periodic=True),
            center=True, pad_mode="constant", return_complex=True,
        ).numpy().T
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)

    def test_istft_roundtrip(self):
        x = _sig(n=8192)
        s = stft(jnp.asarray(x), 1024, 256)
        y = np.asarray(istft(s, 1024, 256, length=len(x)))
        assert y.shape == x.shape
        np.testing.assert_allclose(y, x, atol=1e-3)

    def test_batched(self):
        x = np.stack([_sig(seed=0), _sig(seed=1)])
        s = np.asarray(stft(jnp.asarray(x), 512, 128))
        s0 = np.asarray(stft(jnp.asarray(x[0]), 512, 128))
        np.testing.assert_allclose(s[0], s0, atol=1e-5)


class TestMelFilterbank:
    def test_matches_independent_slaney_impl(self):
        """Independent re-derivation of librosa.filters.mel (O'Shaughnessy /
        Slaney Auditory Toolbox formulas)."""

        def hz2mel(f):
            f = np.asarray(f, dtype=float)
            out = f / (200.0 / 3)
            m = f >= 1000.0
            out[m] = 15.0 + np.log(f[m] / 1000.0) / (np.log(6.4) / 27.0)
            return out

        def mel2hz(m):
            m = np.asarray(m, dtype=float)
            out = m * (200.0 / 3)
            t = m >= 15.0
            out[t] = 1000.0 * np.exp((np.log(6.4) / 27.0) * (m[t] - 15.0))
            return out

        sr, n_fft, n_mels, fmin, fmax = 16000, 1024, 80, 125.0, 7600.0
        freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
        pts = mel2hz(np.linspace(hz2mel([fmin])[0], hz2mel([fmax])[0], n_mels + 2))
        fb = np.zeros((n_mels, len(freqs)))
        for i in range(n_mels):
            lo, c, hi = pts[i], pts[i + 1], pts[i + 2]
            up = (freqs - lo) / (c - lo)
            down = (hi - freqs) / (hi - c)
            fb[i] = np.maximum(0, np.minimum(up, down)) * (2.0 / (hi - lo))

        ours = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
        np.testing.assert_allclose(ours, fb.T, atol=1e-6)

    def test_all_filters_nonzero(self):
        fb = mel_filterbank(32000, 1024, 64, 50.0, 14000.0)
        assert (fb.sum(axis=0) > 0).all()
        assert fb.shape == (513, 64)


class TestMelSpecs:
    def test_ldm_mel_shape_and_range(self):
        x = jnp.asarray(_sig(n=16000 * 2))
        m = ldm_mel(x)
        # librosa center=True: 1 + T//hop frames
        assert m.shape == (1 + 32000 // 256, 80)
        assert float(m.min()) >= 0.0 and float(m.max()) <= 1.0

    def test_ldm_chain_matches_reference_formula(self):
        """Re-derive TRANSFORMS_16000 numerically with torch.stft + our fb."""
        x = _sig(n=16000)
        spec = torch.stft(
            torch.from_numpy(x), 1024, 256,
            window=torch.hann_window(1024), center=True,
            pad_mode="constant", return_complex=True,
        ).abs().numpy()  # [freq, frames], power 1
        fb = mel_filterbank(16000, 1024, 80, 125.0, 7600.0)  # [freq, mel]
        mel = fb.T @ spec  # [mel, frames]
        ref = np.clip(
            (20.0 * np.log10(np.maximum(mel, 1e-5)) - 20.0 + 100.0) / 100.0, 0, 1
        )
        ours = np.asarray(ldm_mel(jnp.asarray(x))).T
        np.testing.assert_allclose(ours, ref, atol=1e-3)

    def test_panns_mel(self):
        x = jnp.asarray(_sig(n=32000, sr=32000))
        m = log_mel(x, PANNS_MEL_32K)
        assert m.shape == (1 + 32000 // 320, 64)
        # db10 of power spec clamped at 1e-10 → >= -100 dB
        assert float(m.min()) >= -100.0


class TestResample:
    @pytest.mark.parametrize("src,dst", [(48000, 16000), (16000, 22050), (22050, 16000)])
    def test_preserves_tone(self, src, dst):
        t = np.arange(src) / src  # 1 s
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        y = np.asarray(resample(jnp.asarray(x), src, dst))
        assert abs(len(y) - dst) <= 1
        # dominant frequency preserved
        spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
        peak_hz = np.argmax(spec) * dst / len(y)
        assert abs(peak_hz - 440) < 5
        # energy roughly preserved (interior, away from edges)
        assert abs(np.std(y[dst // 4 : -dst // 4]) - np.std(x)) < 0.05

    def test_identity(self):
        x = jnp.asarray(_sig())
        np.testing.assert_array_equal(np.asarray(resample(x, 16000, 16000)), np.asarray(x))


class TestWindow:
    def test_matches_torch_hann(self):
        np.testing.assert_allclose(
            hann_window(1024), torch.hann_window(1024, periodic=True).numpy(), atol=1e-6
        )
        np.testing.assert_allclose(
            hann_window(400, periodic=False),
            torch.hann_window(400, periodic=False).numpy(),
            atol=1e-6,
        )
