"""DiffSinger: DiffNet parity vs reference + full-pipeline smoke tests."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audiogpt_tpu.models.svs import DiffNet, DiffNetConfig, DiffSinger, DiffSingerConfig
from audiogpt_tpu.models.tts.fastspeech2 import FastSpeech2Config
from audiogpt_tpu.utils.torch_import import convert_diffnet

import ref_torch

NET_TINY = DiffNetConfig(mel_bins=16, encoder_hidden=24, residual_layers=4,
                         residual_channels=16, dilation_cycle_length=2)


@pytest.fixture(scope="module")
def diffnet_pair():
    ref_torch.add_neuralseq_path()
    from utils.hparams import hparams as H

    H.update({"hidden_size": 24, "residual_layers": 4, "residual_channels": 16,
              "dilation_cycle_length": 2})
    from modules.diff.net import DiffNet as RefDiffNet

    torch.manual_seed(0)
    ref = RefDiffNet(in_dims=16).eval()
    params = convert_diffnet(ref_torch.state_dict_numpy(ref), NET_TINY)
    return ref, DiffNet(NET_TINY), params


class TestDiffNetParity:
    def test_forward_matches(self, diffnet_pair):
        ref, model, params = diffnet_pair
        rng = np.random.RandomState(0)
        spec = rng.randn(2, 16, 12).astype(np.float32)   # torch [B, M, T]
        t = np.array([5, 55], np.int64)
        cond = rng.randn(2, 24, 12).astype(np.float32)   # torch [B, H, T]
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(spec[:, None]), torch.from_numpy(t),
                        torch.from_numpy(cond)).numpy()[:, 0]
        y = np.asarray(model.apply(params, jnp.asarray(spec.transpose(0, 2, 1)),
                                   jnp.asarray(t), jnp.asarray(cond.transpose(0, 2, 1))))
        np.testing.assert_allclose(y.transpose(0, 2, 1), y_ref, atol=2e-4)


class TestDiffSingerPipeline:
    @staticmethod
    def _model():
        cfg = DiffSingerConfig(
            fs2=FastSpeech2Config(
                vocab_size=60, hidden_size=24, enc_layers=1, dec_layers=1,
                num_heads=2, n_mels=16, use_midi=True, rel_pos=True,
                use_pitch_embed=False, predictor_hidden=16,
                predictor_layers=2, max_frames=64),
            net=NET_TINY,
            timesteps=50, K_step=50, max_beta=0.06,
            spec_min=(-6.0,) * 16, spec_max=(1.5,) * 16,
        )
        return DiffSinger(cfg)

    def test_infer_with_plms(self):
        model = self._model()
        tokens = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
        midi = jnp.asarray([[60, 62, 64, 65]], jnp.int32)
        midi_dur = jnp.asarray([[0.5, 0.5, 0.5, 0.5]], jnp.float32)
        slur = jnp.zeros((1, 4), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), tokens, pitch_midi=midi,
                            midi_dur=midi_dur, is_slur=slur)
        out = model.apply(params, tokens, pitch_midi=midi, midi_dur=midi_dur,
                          is_slur=slur, rng=jax.random.PRNGKey(1),
                          pndm_speedup=10)
        mel = np.asarray(out["mel_out"])
        assert mel.shape == (1, 64, 16)
        assert np.isfinite(mel).all()

    def test_infer_ddpm_full(self):
        model = self._model()
        tokens = jnp.asarray([[5, 6, 7]], jnp.int32)
        midi = jnp.asarray([[60, 62, 64]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), tokens, pitch_midi=midi)
        out = model.apply(params, tokens, pitch_midi=midi,
                          rng=jax.random.PRNGKey(1), pndm_speedup=None)
        assert np.isfinite(np.asarray(out["mel_out"])).all()
        # padded frames exactly zero
        m2p = np.asarray(out["mel2ph"])[0]
        mel = np.asarray(out["mel_out"])[0]
        assert (np.abs(mel[m2p == 0]).max() if (m2p == 0).any() else 0.0) == 0.0


class TestSVSEngine:
    def test_note_to_midi(self):
        from audiogpt_tpu.engines.svs import note_to_midi

        assert note_to_midi("C4") == 60
        assert note_to_midi("C#4/Db4") == 61
        assert note_to_midi("A4") == 69
        assert note_to_midi("Bb3") == 58
        assert note_to_midi("rest") == 0

    def test_split_pinyin(self):
        from audiogpt_tpu.engines.svs import split_pinyin

        assert split_pinyin("xiao") == ["x", "iao"]
        assert split_pinyin("ai") == ["ai"]
        assert split_pinyin("zhang") == ["zh", "ang"]

    def test_score_parsing_with_slur(self):
        from audiogpt_tpu.engines.svs import SVSEngine

        eng = SVSEngine.__new__(SVSEngine)  # parse only, no model build
        eng.pinyin2phs = {}
        phs, notes, durs, slur = SVSEngine.parse_word_level(
            eng, "xiao jiu", "C4 | D4 E4", "0.5 | 0.4 0.2")
        assert phs == ["x", "iao", "j", "iu", "iu"]
        # each phone carries its word's first note; slur appends extra notes
        assert notes == ["C4", "C4", "D4", "D4", "E4"]
        assert durs == ["0.5", "0.5", "0.4", "0.4", "0.2"]
        assert slur == [0, 0, 0, 0, 1]

    def test_synthesize_e2e_mel(self):
        from audiogpt_tpu.engines.svs import SVSEngine
        from audiogpt_tpu.models.tts.fastspeech2 import FastSpeech2Config

        cfg = DiffSingerConfig(
            fs2=FastSpeech2Config(
                vocab_size=80, hidden_size=24, enc_layers=1, dec_layers=1,
                num_heads=2, n_mels=16, use_midi=True, rel_pos=True,
                use_pitch_embed=False, predictor_hidden=16,
                predictor_layers=2, max_frames=64),
            net=NET_TINY, timesteps=20, K_step=20, max_beta=0.06,
            spec_min=(-6.0,) * 16, spec_max=(1.5,) * 16)
        eng = SVSEngine(cfg, token_buckets=(16,), pndm_speedup=5)
        mel = eng.synthesize("xiao jiu", "C4 | D4", "0.5 | 0.5")
        assert mel.ndim == 2 and mel.shape[1] == 16
        assert np.isfinite(mel).all()


class TestPitchExtractor:
    """PE network (pe.py:119) + NSF wiring in the SVS engine."""

    def test_pe_outputs(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from audiogpt_tpu.models.tts.pitch_extractor import (
            PitchExtractor, PitchExtractorConfig,
        )

        cfg = PitchExtractorConfig(n_mels=20, hidden=16, conv_layers=1,
                                   predictor_layers=1)
        model = PitchExtractor(cfg)
        mel = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 20))
        params = model.init(jax.random.PRNGKey(1), mel)
        out = model.apply(params, mel)
        assert out["pitch_pred"].shape == (2, 12, 2)
        assert out["f0_denorm_pred"].shape == (2, 12)
        f0 = np.asarray(out["f0_denorm_pred"])
        assert np.isfinite(f0).all()
        # padded frames → f0 exactly 0
        mel_pad = mel.at[:, 8:].set(0.0)
        out2 = model.apply(params, mel_pad)
        assert np.all(np.asarray(out2["f0_denorm_pred"])[:, 8:] == 0)

    def test_pe_task_step(self):
        import jax
        import numpy as np
        from audiogpt_tpu.models.tts.pitch_extractor import PitchExtractorConfig
        from audiogpt_tpu.train.optim import OptimConfig
        from audiogpt_tpu.train.tasks.pe import PETask, PETaskConfig

        task = PETask(PETaskConfig(
            model=PitchExtractorConfig(n_mels=20, hidden=16, conv_layers=1,
                                       predictor_layers=1),
            optim=OptimConfig(schedule="constant", lr=1e-3)))
        params = task.init_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        b, f = 2, 12
        batch = {
            "mels": rng.normal(size=(b, f, 20)).astype(np.float32),
            "f0": rng.uniform(100, 300, (b, f)).astype(np.float32),
            "uv": np.zeros((b, f), np.float32),
            "weight": np.ones(b, np.float32),
        }
        loss, metrics = task.loss_fns["model"](params, batch,
                                               jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        assert "f0" in metrics and "uv" in metrics
