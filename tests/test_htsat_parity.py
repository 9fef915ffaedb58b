"""HTSAT (CLAP audio tower) parity vs the reference torch module
(``open_clap/htsat.py`` HTSAT_Swin_Transformer) — VERDICT r1 missing#3:
shifted-window attention masks + a converter family so reference CLAP
checkpoints with the HTSAT tower import and match.

The reference module is loaded as a test ORACLE via ref_torch (never part of
the framework). Frontend (torchlibrosa STFT) is shimmed out: parity runs on
the image path (``reshape_wav2img`` + ``forward_features``), which is where
the Swin semantics (masks, merge order, rel-pos bias) live; the log-mel
frontend is covered by the golden DSP tests.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiogpt_tpu.dsp.mel import MelSpec
from audiogpt_tpu.models.textenc.htsat import (
    HTSATAudioEncoder, HTSATConfig, HTSATSwin, reshape_wav2img,
)

sys.path.insert(0, "tests") if "tests" not in sys.path else None
import ref_torch  # noqa: E402

TINY_MEL = MelSpec(32000, 1024, 320, 1024, 16, 50.0, 14000.0,
                   power=2.0, pad_mode="reflect", log="db10", amin=1e-10)
TINY = HTSATConfig(mel=TINY_MEL, spec_size=64, patch=4, window=8,
                   embed_dim=32, depths=(2, 2), num_heads=(2, 4),
                   num_classes=10, d_proj=24, project=False)


def _ref_model(cfg: HTSATConfig):
    import torch

    mod = ref_torch.load_open_clap_htsat()
    audio_cfg = types.SimpleNamespace(
        mel_bins=cfg.mel.n_mels, window_size=cfg.mel.n_fft,
        hop_size=cfg.mel.hop, sample_rate=cfg.mel.sr,
        fmin=cfg.mel.fmin, fmax=cfg.mel.fmax)
    torch.manual_seed(0)
    m = mod.HTSAT_Swin_Transformer(
        spec_size=cfg.spec_size, patch_size=cfg.patch, patch_stride=(4, 4),
        num_classes=cfg.num_classes, embed_dim=cfg.embed_dim,
        depths=list(cfg.depths), num_heads=list(cfg.num_heads),
        window_size=cfg.window, drop_path_rate=0.0, config=audio_cfg)
    return m.eval()


@pytest.fixture(scope="module")
def ref_and_params():
    from audiogpt_tpu.import_ckpt import convert

    ref = _ref_model(TINY)
    sd = ref_torch.state_dict_numpy(ref)
    params = convert("htsat", sd, TINY)
    return ref, params


def test_swin_forward_features_parity(ref_and_params):
    """Identical mel image → embedding/clipwise/framewise match torch within
    float32 tolerance. The stage-0 grid (16×16 > window 8) exercises the
    MASKED shifted-window path — the round-1 jnp.roll-only divergence."""
    import torch

    ref, params = ref_and_params
    rng = np.random.default_rng(0)
    b, fr = 2, TINY.freq_ratio
    t_img = TINY.spec_size * fr                       # 256 mel frames
    mel = rng.normal(size=(b, t_img, TINY.mel.n_mels)).astype(np.float32)

    with torch.no_grad():
        x = torch.from_numpy(mel)[:, None]            # [B, 1, T, F]
        img_t = ref.reshape_wav2img(x)
        out_t = ref.forward_features(img_t)

    img_j = reshape_wav2img(jnp.asarray(mel), TINY.spec_size, fr)
    np.testing.assert_allclose(np.asarray(img_j[..., 0]),
                               img_t[:, 0].numpy(), atol=1e-6)

    swin = HTSATSwin(TINY)
    out_j = swin.apply({"params": params["params"]["swin"]},
                       jnp.asarray(img_j))

    np.testing.assert_allclose(np.asarray(out_j["embedding"]),
                               out_t["embedding"].numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_j["clipwise"]),
                               out_t["clipwise_output"].numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_j["framewise"]),
                               out_t["framewise_output"].numpy(),
                               atol=2e-4, rtol=1e-3)


def test_reshape_wav2img_bicubic_stretch_parity(ref_and_params):
    """Short clips stretch with bicubic align_corners=True (htsat.py:840);
    the real 10 s @48 kHz case hits this path (1001 → 1024 frames)."""
    import torch

    ref, _ = ref_and_params
    rng = np.random.default_rng(1)
    t_short = 250                                      # < 256 target
    mel = rng.normal(size=(1, t_short, TINY.mel.n_mels)).astype(np.float32)
    with torch.no_grad():
        img_t = ref.reshape_wav2img(torch.from_numpy(mel)[:, None])
    img_j = reshape_wav2img(jnp.asarray(mel), TINY.spec_size,
                            TINY.freq_ratio)
    np.testing.assert_allclose(np.asarray(img_j[..., 0]),
                               img_t[:, 0].numpy(), atol=1e-4, rtol=1e-4)


def test_shifted_window_mask_blocks_wraparound():
    """Direct mask check: with the boundary mask, tokens that wrapped around
    via the cyclic roll get -100 logits against non-wrapped tokens."""
    from audiogpt_tpu.models.textenc.htsat import _shift_attn_mask

    m = _shift_attn_mask(16, 16, 8, 4)                # [nW, 64, 64]
    assert m.shape == (4, 64, 64)
    # interior window (0): fully visible
    assert (m[0] == 0).all()
    # boundary windows contain masked pairs
    assert (m[1:] == -100.0).any()
    # mask is symmetric (visibility is mutual)
    np.testing.assert_array_equal(m, np.transpose(m, (0, 2, 1)))


def test_full_ckpt_with_audio_projection_imports(ref_and_params):
    """A CLAP-checkpoint-shaped dict (audio_branch.* + audio_projection.*)
    converts in one call and the projected embedding applies end-to-end."""
    import torch

    from audiogpt_tpu.import_ckpt import convert

    ref, _ = ref_and_params
    torch.manual_seed(1)
    proj = torch.nn.Sequential(
        torch.nn.Linear(TINY.num_features, TINY.d_proj), torch.nn.ReLU(),
        torch.nn.Linear(TINY.d_proj, TINY.d_proj)).eval()
    sd = {f"audio_branch.{k}": v
          for k, v in ref_torch.state_dict_numpy(ref).items()}
    sd.update({f"audio_projection.{k}": v.detach().numpy()
               for k, v in proj.state_dict().items()})
    cfg = HTSATConfig(**{**TINY.__dict__, "project": True})
    params = convert("htsat", sd, cfg)

    model = HTSATAudioEncoder(cfg)
    wav = np.random.default_rng(2).normal(size=(1, 32000)).astype(np.float32)
    out = model.apply(params, jnp.asarray(wav), return_dict=True)
    assert out["projected"].shape == (1, TINY.d_proj)
    assert np.isfinite(np.asarray(out["projected"])).all()

    # the projection itself matches torch on the same embedding
    import torch as _t

    emb = np.asarray(out["embedding"])
    with _t.no_grad():
        want = proj(_t.from_numpy(emb)).numpy()
    got = np.asarray(out["projected"])
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
