"""SED / TSD / LASSNet / Binaural model tests (shape, finiteness, behavior,
and parity where the reference is importable)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audiogpt_tpu.models.sed import SEDConfig, SEDModel, audioset_labels, detect_events
from audiogpt_tpu.models.sed.tsd import (
    TSDConfig, TSDModel, decode_timestamps, find_contiguous_regions, median_filter,
)
from audiogpt_tpu.models.extraction import LASSNet, LASSNetConfig
from audiogpt_tpu.models.textenc.bert import BertConfig
from audiogpt_tpu.models.binaural import BinauralConfig, BinauralNetwork, binauralize_chunked
from audiogpt_tpu.models.caption.cnn14 import Cnn14Config


class TestSED:
    def test_labels_count(self):
        labels = audioset_labels()
        assert len(labels) == 527 and labels[0] == "Speech"

    def test_framewise_shapes(self):
        cfg = SEDConfig(cnn14=Cnn14Config(channels=(4, 4, 4, 4, 4, 8)), classes_num=10)
        model = SEDModel(cfg)
        wav = jnp.zeros((1, 32000))
        v = model.init(jax.random.PRNGKey(0), wav)
        out = model.apply(v, wav)
        assert out["clipwise_output"].shape == (1, 10)
        fw = out["framewise_output"]
        assert fw.shape[-1] == 10 and fw.shape[1] % 32 == 0
        assert float(fw.min()) >= 0 and float(fw.max()) <= 1

    def test_detect_events(self):
        fw = np.zeros((100, 527), np.float32)
        fw[20:40, 3] = 0.9
        events = detect_events(fw, top_k=3)
        assert events[0]["peak"] == pytest.approx(0.9)
        assert events[0]["label"] == audioset_labels()[3]


class TestTSD:
    def test_shapes_and_upsample(self):
        cfg = TSDConfig(mel_bins=64, embedding_dim=8, channels=(4, 4, 4, 4))
        model = TSDModel(cfg)
        mel = jnp.zeros((1, 96, 64))
        emb = jnp.zeros((1, 8))
        v = model.init(jax.random.PRNGKey(0), mel, emb)
        dt, up = model.apply(v, mel, emb)
        assert up.shape == (1, 96, 2)
        assert dt.shape[1] == 96 // 8  # scale-8 time pooling

    def test_timestamp_decode(self):
        probs = np.zeros(100, np.float32)
        probs[10:30] = 0.9
        probs[50:52] = 0.9
        ts = decode_timestamps(probs, frame_rate=100.0)
        assert (0.10, 0.30) in [(round(a, 2), round(b, 2)) for a, b in ts]

    def test_median_filter_removes_blips(self):
        probs = np.zeros((1, 50), np.float32)
        probs[0, 25] = 1.0  # single-frame blip
        assert median_filter(probs, window_size=5).sum() == 0

    def test_contiguous_regions(self):
        act = np.array([1, 1, 0, 0, 1, 1, 1, 0], bool)
        np.testing.assert_array_equal(find_contiguous_regions(act), [[0, 2], [4, 7]])


class TestLASSNet:
    def test_mask_shape_and_range(self):
        cfg = LASSNetConfig(
            bert=BertConfig(vocab_size=100, hidden_size=16, num_layers=1,
                            num_heads=2, intermediate_size=32),
            cond_dim=16, enc_channels=(4, 4, 4, 4, 4, 4))
        model = LASSNet(cfg)
        sp = jnp.zeros((1, 100, 257))
        ids = jnp.zeros((1, 6), jnp.int32)
        v = model.init(jax.random.PRNGKey(0), sp, ids)
        mask = model.apply(v, sp, ids)
        assert mask.shape == (1, 100, 257)
        assert float(mask.min()) >= 0 and float(mask.max()) <= 1


class TestBinaural:
    def test_geometric_warp_matches_reference(self):
        """Geometric warpfield vs the reference torch implementation."""
        import sys
        sys.path.insert(0, "/root/reference/mono2binaural")
        from src.models import GeometricWarper

        ref = GeometricWarper()
        rng = np.random.RandomState(0)
        view = rng.randn(1, 7, 5).astype(np.float32)
        t = 2000
        with torch.no_grad():
            wf_ref = ref._warpfield(torch.from_numpy(view), t).numpy()
        from audiogpt_tpu.models.binaural.binaural import geometric_warpfield

        wf = np.asarray(geometric_warpfield(jnp.asarray(view), t, 48000))
        np.testing.assert_allclose(wf, wf_ref, atol=1e-3)

    def test_full_network_and_chunking(self):
        cfg = BinauralConfig(warpnet_channels=8)
        model = BinauralNetwork(cfg)
        t = 48000 * 2
        mono = np.sin(np.linspace(0, 880 * np.pi, t)).astype(np.float32)
        view = np.zeros((7, t // 400), np.float32)
        view[0] = 1.0  # 1 m in front
        view[6] = 1.0  # identity quat (w=1)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(mono[None, :800]),
                            jnp.asarray(view[None, :, :2]))
        out = binauralize_chunked(model, params, mono, view)
        assert out.shape == (2, t)
        assert np.isfinite(out).all()
        assert np.abs(out).max() <= 1.0

    def test_warp_is_differentiable(self):
        """The JAX warp autodiffs (replaces the reference's hand-written
        backward, src/warping.py:34-50)."""
        from audiogpt_tpu.models.binaural.binaural import monotone_warp

        sig = jnp.asarray(np.random.RandomState(0).randn(1, 2, 64).astype(np.float32))
        wf = jnp.full((1, 2, 64), -3.3)

        def loss(wf):
            return jnp.sum(monotone_warp(sig, wf) ** 2)

        g = jax.grad(loss)(wf)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestConvTasNet:
    @staticmethod
    def _tiny():
        from audiogpt_tpu.models.separation import ConvTasNet, ConvTasNetConfig

        cfg = ConvTasNetConfig(n_src=2, enc_dim=32, enc_kernel=16,
                               bottleneck=16, hidden=32, skip=16,
                               n_blocks=3, n_repeats=1)
        return ConvTasNet(cfg), cfg

    def test_shapes(self):
        model, cfg = self._tiny()
        wav = jnp.zeros((2, 4000))
        v = model.init(jax.random.PRNGKey(0), wav)
        out = model.apply(v, wav)
        assert out.shape == (2, 2, 4000)

    def test_streaming_matches_offline_roughly(self):
        from audiogpt_tpu.models.separation.convtasnet import separate_streaming

        model, cfg = self._tiny()
        rng = np.random.RandomState(0)
        wav = rng.randn(16000 * 3).astype(np.float32) * 0.1
        v = model.init(jax.random.PRNGKey(0), jnp.asarray(wav[None, :4000]))
        out = separate_streaming(model, v, wav)
        assert out.shape == (2, len(wav))
        assert np.isfinite(out).all()

    def test_gradients_flow(self):
        model, cfg = self._tiny()
        wav = jnp.asarray(np.random.RandomState(0).randn(1, 2000).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), wav)

        def loss(p):
            return jnp.mean(model.apply(p, wav) ** 2)

        g = jax.grad(loss)(v)
        total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
        assert np.isfinite(total) and total > 0


class TestPVT:
    """PVTv2 SED backbone (audio_infer/pytorch/models.py:141)."""

    def _tiny(self):
        from audiogpt_tpu.models.sed.pvt import PVTConfig, PVTSED

        cfg = PVTConfig(classes_num=10, embed_dims=(8, 16, 16, 16),
                        depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 2),
                        mlp_ratios=(2, 2, 2, 2), sr_ratios=(8, 4, 2, 1))
        return PVTSED(cfg), cfg

    def test_outputs(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        model, cfg = self._tiny()
        wav = jax.random.normal(jax.random.PRNGKey(0), (1, 32000)) * 0.1
        variables = model.init(jax.random.PRNGKey(1), wav,
                               jnp.asarray([32000]))
        out = model.apply(variables, wav, jnp.asarray([32000]))
        frames = out["framewise_output"].shape[1]
        # framewise spans the mel frame count; clipwise in (0, 1)
        assert out["framewise_output"].shape == (1, frames, 10)
        assert out["clipwise_output"].shape == (1, 10)
        c = np.asarray(out["clipwise_output"])
        assert (c > 0).all() and (c <= 1).all()

    def test_engine_with_pvt_backbone(self):
        import numpy as np
        from audiogpt_tpu.engines.analysis import SEDEngine

        model, cfg = self._tiny()
        eng = SEDEngine(model=model, max_sec=2.0)
        t = np.arange(32000) / 32000
        wav = (0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        events = eng.detect(wav, top_k=5)
        assert len(events) == 5
        assert all(np.isfinite(ev["peak"]) for ev in events)


class TestSkiM:
    """SkiM separator (Speech_SS backbone; segment + memory LSTMs)."""

    def test_shapes_and_engine(self):
        import jax
        import numpy as np
        from audiogpt_tpu.engines.transform import SeparationEngine
        from audiogpt_tpu.models.separation.skim import SkiM, SkiMConfig

        cfg = SkiMConfig(n_src=2, enc_dim=16, hidden=8, segment_size=10,
                         n_blocks=2)
        eng = SeparationEngine(model=SkiM(cfg))
        t = np.arange(16000 * 3) / 16000
        mix = (0.2 * np.sin(2 * np.pi * 300 * t)
               + 0.2 * np.sin(2 * np.pi * 800 * t)).astype(np.float32)
        stems = eng.separate(mix)
        assert stems.shape == (2, len(mix))
        assert np.isfinite(stems).all()

    def test_pit_trains(self):
        """A couple of SI-SNR+PIT steps run finite on SkiM."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from audiogpt_tpu.models.separation.skim import SkiM, SkiMConfig
        from audiogpt_tpu.train.tasks.separation import pit_si_snr

        cfg = SkiMConfig(n_src=2, enc_dim=16, hidden=8, segment_size=10,
                         n_blocks=1)
        model = SkiM(cfg)
        rng = np.random.default_rng(0)
        mix = jnp.asarray(rng.normal(size=(2, 4000)), jnp.float32)
        srcs = jnp.asarray(rng.normal(size=(2, 2, 4000)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), mix)

        def loss(p):
            return -pit_si_snr(model.apply(p, mix), srcs).mean()

        l0, g = jax.value_and_grad(loss)(params)
        assert np.isfinite(float(l0))
        assert any(np.abs(np.asarray(x)).max() > 0 for x in jax.tree.leaves(g))
