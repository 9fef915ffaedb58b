"""Checkpoint-import CLI: torch trainer ckpt → converter → orbax → parity."""

import numpy as np
import pytest
import torch

import ref_torch


def test_hifigan_import_roundtrip(tmp_path, monkeypatch):
    ref_torch.add_neuralseq_path()
    from modules.hifigan.hifigan import HifiGanGenerator

    import audiogpt_tpu.import_ckpt as ic
    from audiogpt_tpu.import_ckpt import restore_params
    from audiogpt_tpu.models.vocoder import HifiGANConfig, HifiGANGenerator

    torch.manual_seed(0)
    h = {"resblock_kernel_sizes": [3, 7, 11], "upsample_rates": [8, 8, 2, 2],
         "upsample_kernel_sizes": [16, 16, 4, 4],
         "upsample_initial_channel": 128, "resblock": "1",
         "resblock_dilation_sizes": [[1, 3, 5]] * 3,
         "use_pitch_embed": False}
    ref = HifiGanGenerator(h).eval()
    # trainer-dict wrapper + model_gen. prefix, as the reference saves it
    # (pl_utils.py:743)
    sd = {"model_gen." + k: v for k, v in ref.state_dict().items()}
    ckpt = str(tmp_path / "ref.pt")
    torch.save({"state_dict": sd}, ckpt)

    cfg = HifiGANConfig(upsample_initial_channel=128, use_nsf=False)
    monkeypatch.setattr(ic, "default_config", lambda fam: cfg)
    out = str(tmp_path / "params")
    ic.main(["--family", "hifigan", "--ckpt", ckpt, "--out", out])

    params = restore_params(out)
    model = HifiGANGenerator(cfg)
    rng = np.random.RandomState(0)
    mel = rng.randn(1, 80, 23).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(mel)).numpy()[:, 0, :]
    import jax.numpy as jnp

    y = np.asarray(model.apply(params, jnp.asarray(mel.transpose(0, 2, 1))))
    np.testing.assert_allclose(y, y_ref, atol=1e-4)


def test_unknown_family_errors(tmp_path):
    import audiogpt_tpu.import_ckpt as ic

    with pytest.raises(KeyError, match="unknown family"):
        ic.convert("nope", {}, None)
