"""FastSpeech2 parity vs the reference NeuralSeq model (random weights,
converted) and unit tests of the variance-adaptor math."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audiogpt_tpu.models.tts import (
    FastSpeech2,
    FastSpeech2Config,
    f0_to_coarse,
    length_regulator,
)
from audiogpt_tpu.utils.torch_import import convert_fastspeech2

import ref_torch


CFG = FastSpeech2Config(
    vocab_size=50,
    hidden_size=64,
    enc_layers=2,
    dec_layers=2,
    num_heads=2,
    predictor_hidden=48,
    f0_mean=200.0,
    f0_std=60.0,
    max_frames=200,
)

REF_HPARAMS = {
    "hidden_size": 64,
    "enc_layers": 2,
    "dec_layers": 2,
    "num_heads": 2,
    "enc_ffn_kernel_size": 9,
    "dec_ffn_kernel_size": 9,
    "encoder_type": "fft",
    "decoder_type": "fft",
    "use_spk_id": False,
    "use_split_spk_id": False,
    "use_spk_embed": False,
    "use_pitch_embed": True,
    "use_energy_embed": False,
    "pitch_type": "frame",
    "pitch_norm": "standard",
    "use_uv": True,
    "pitch_ar": False,
    "f0_mean": 200.0,
    "f0_std": 60.0,
    "predictor_hidden": 48,
    "predictor_layers": 5,
    "predictor_kernel": 5,
    "predictor_dropout": 0.0,
    "predictor_grad": 0.1,
    "dur_predictor_layers": 2,
    "dur_predictor_kernel": 3,
    "dur_loss": "mse",
    "dropout": 0.0,
    "ffn_act": "gelu",
    "ffn_padding": "SAME",
    "audio_num_mel_bins": 80,
    "use_pos_embed": True,
    "use_bert": False,
}


class FakeDictionary:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def pad(self):
        return 0


@pytest.fixture(scope="module")
def pair():
    ref_torch.add_neuralseq_path()
    from utils.hparams import hparams as ref_hparams

    ref_hparams.clear()
    ref_hparams.update(REF_HPARAMS)
    from modules.fastspeech.fs2 import FastSpeech2 as RefFS2

    torch.manual_seed(0)
    ref = RefFS2(FakeDictionary(50)).eval()
    # bias predicted log-durations positive so the infer path produces frames
    # (the reference crashes on all-zero durations with random weights)
    with torch.no_grad():
        ref.dur_predictor.linear.bias.fill_(1.0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_fastspeech2(sd, CFG)
    return ref, FastSpeech2(CFG), params


def _inputs(seed=0, b=2, t=11):
    rng = np.random.RandomState(seed)
    tokens = rng.randint(1, 50, (b, t))
    if b > 1:
        tokens[1, 8:] = 0  # padding tail
    # ground-truth mel2ph / f0 / uv for the training-style forward
    dur = rng.randint(1, 5, (b, t))
    dur[tokens == 0] = 0
    frames = 48
    mel2ph = np.zeros((b, frames), np.int64)
    for bi in range(b):
        pos = 0
        for ti in range(t):
            for _ in range(dur[bi, ti]):
                if pos < frames:
                    mel2ph[bi, pos] = ti + 1
                    pos += 1
    f0 = rng.randn(b, frames).astype(np.float32) * 0.3
    uv = (rng.rand(b, frames) > 0.8).astype(np.float32)
    return tokens, mel2ph, f0, uv


class TestFS2Parity:
    def test_training_forward_matches(self, pair):
        ref, model, params = pair
        tokens, mel2ph, f0, uv = _inputs()
        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(tokens),
                mel2ph=torch.from_numpy(mel2ph),
                f0=torch.from_numpy(f0),
                uv=torch.from_numpy(uv),
                infer=False,
            )
        import dataclasses

        # bit-exact reference comparison requires its (leaky) unmasked
        # predictor behavior on the shared gt-mel2ph canvas
        model_ref_exact = FastSpeech2(dataclasses.replace(CFG, predictor_mask_pad=False))
        out = model_ref_exact.apply(
            {"params": params["params"]},
            jnp.asarray(tokens),
            mel2ph=jnp.asarray(mel2ph.astype(np.int32)),
            f0=jnp.asarray(f0),
            uv=jnp.asarray(uv),
        )
        np.testing.assert_allclose(
            np.asarray(out["mel_out"]), out_ref["mel_out"].numpy(), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["dur"]), out_ref["dur"].numpy(), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["pitch_pred"]), out_ref["pitch_pred"].numpy(), atol=2e-4
        )

    def test_infer_forward_matches(self, pair):
        """Inference path: predicted durations/pitch. Single-row batch so the
        reference's dynamic canvas == our valid region; with predictor
        masking on, conv windows see zeros beyond the utterance either way,
        so the comparison is exact despite our static max_frames canvas."""
        ref, model, params = pair
        tokens, _, _, _ = _inputs(seed=3, b=1)
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(tokens), infer=True)
        out = model.apply({"params": params["params"]}, jnp.asarray(tokens), infer=True)
        ref_mel = out_ref["mel_out"].numpy()
        f = ref_mel.shape[1]
        assert f <= CFG.max_frames
        ours = np.asarray(out["mel_out"])[:, :f]
        np.testing.assert_allclose(ours, ref_mel, atol=2e-3)
        # frames beyond the reference length must be exact padding zeros
        assert np.abs(np.asarray(out["mel_out"])[:, f:]).max() == 0.0

    def test_predictor_masking_canvas_invariance(self, pair):
        """With predictor_mask_pad=True, growing the static canvas must not
        change results in the valid region (the static-shape discipline)."""
        _, model, params = pair
        import dataclasses

        tokens, _, _, _ = _inputs(seed=5, b=2)
        small = dataclasses.replace(CFG, max_frames=128)
        big = dataclasses.replace(CFG, max_frames=256)
        o1 = FastSpeech2(small).apply({"params": params["params"]},
                                      jnp.asarray(tokens), infer=True)
        o2 = FastSpeech2(big).apply({"params": params["params"]},
                                    jnp.asarray(tokens), infer=True)
        np.testing.assert_allclose(
            np.asarray(o1["mel_out"]), np.asarray(o2["mel_out"])[:, :128], atol=1e-5
        )


class TestVarianceMath:
    def test_f0_to_coarse_matches_reference_formula(self):
        f0 = jnp.asarray([0.0, 50.0, 100.0, 440.0, 1100.0, 2000.0])
        ours = np.asarray(f0_to_coarse(f0))
        # independent numpy derivation
        f0n = np.asarray(f0)
        mel = 1127 * np.log(1 + f0n / 700)
        lo = 1127 * np.log(1 + 50 / 700)
        hi = 1127 * np.log(1 + 1100 / 700)
        scaled = np.where(mel > 0, (mel - lo) * 254 / (hi - lo) + 1, mel)
        expect = np.rint(np.clip(scaled, 1, 255)).astype(int)
        np.testing.assert_array_equal(ours, expect)
        assert ours[0] == 1 and ours[-1] == 255

    def test_length_regulator(self):
        dur = jnp.asarray([[2, 2, 3], [1, 0, 2]])
        m = np.asarray(length_regulator(dur, 10))
        np.testing.assert_array_equal(m[0], [1, 1, 2, 2, 3, 3, 3, 0, 0, 0])
        np.testing.assert_array_equal(m[1], [1, 3, 3, 0, 0, 0, 0, 0, 0, 0])

    def test_length_regulator_matches_reference(self):
        ref_torch.add_neuralseq_path()
        from modules.fastspeech.tts_modules import LengthRegulator

        rng = np.random.RandomState(0)
        dur = rng.randint(0, 6, (3, 9))
        ref = LengthRegulator()(torch.from_numpy(dur)).numpy()
        ours = np.asarray(length_regulator(jnp.asarray(dur), 64))
        np.testing.assert_array_equal(ours[:, : ref.shape[1]], ref)
        assert (ours[:, ref.shape[1] :] == 0).all()


class TestCWTPitch:
    """CWT pitch mode (fs2.py:191-203): 10-scale cwt + uv head, stats layer,
    cwt2f0 inference path."""

    def _cfg(self):
        from audiogpt_tpu.models.tts.fastspeech2 import FastSpeech2Config
        return FastSpeech2Config(
            vocab_size=30, hidden_size=16, enc_layers=1, dec_layers=1,
            num_heads=2, enc_ffn_kernel_size=3, dec_ffn_kernel_size=3,
            n_mels=20, dur_predictor_layers=1, predictor_layers=1,
            predictor_hidden=8, max_frames=32, pitch_type="cwt")

    def test_infer_and_train_paths(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from audiogpt_tpu.models.tts.fastspeech2 import FastSpeech2

        cfg = self._cfg()
        model = FastSpeech2(cfg)
        tokens = jnp.asarray([[3, 5, 7, 9]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), tokens, infer=True)
        out = model.apply(params, tokens, infer=True)
        assert out["cwt"].shape[-1] == 11
        assert out["f0_mean"].shape == (1,)
        assert np.isfinite(np.asarray(out["f0_denorm"])).all()

        # training path with gt f0 + cwt loss inputs
        f = 8
        mel2ph = jnp.asarray([[1, 1, 2, 2, 3, 3, 4, 4]], jnp.int32)
        f0 = jnp.full((1, f), 0.5)
        uv = jnp.zeros((1, f))
        out = model.apply(params, tokens, mel2ph=mel2ph, f0=f0, uv=uv)
        assert out["cwt"].shape == (1, f, 11)

    def test_fs2task_cwt_losses(self):
        import jax
        import numpy as np
        from audiogpt_tpu.train.optim import OptimConfig
        from audiogpt_tpu.train.tasks import FS2Task, FS2TaskConfig

        task = FS2Task(FS2TaskConfig(
            model=self._cfg(), lambda_ssim=0.0,
            optim=OptimConfig(schedule="constant", lr=1e-3)))
        params = task.init_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        b, t, f = 2, 4, 8
        batch = {
            "txt_tokens": rng.integers(3, 30, (b, t)).astype(np.int32),
            "mel2ph": np.repeat(np.arange(1, t + 1), f // t)[None].repeat(
                b, 0).astype(np.int32),
            "mels": rng.normal(size=(b, f, 20)).astype(np.float32),
            "f0": rng.uniform(100, 300, (b, f)).astype(np.float32),
            "uv": np.zeros((b, f), np.float32),
            "cwt_spec": rng.normal(size=(b, f, 10)).astype(np.float32),
            "f0_mean": rng.uniform(4, 6, b).astype(np.float32),
            "f0_std": rng.uniform(0.1, 0.3, b).astype(np.float32),
            "weight": np.ones(b, np.float32),
        }
        loss, metrics = task.loss_fns["model"](
            params, batch, jax.random.PRNGKey(1))
        for k in ("cwt", "uv", "f0_mean", "f0_std"):
            assert k in metrics and np.isfinite(float(metrics[k])), k
