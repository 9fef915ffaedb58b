"""Vocoder parity: our JAX HiFi-GAN / BigVGAN vs the reference PyTorch models
with converted random weights (strongest check available without trained
checkpoints — exercises every weight + topology detail)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audiogpt_tpu.models.vocoder import (
    BigVGANConfig,
    BigVGANGenerator,
    HifiGANConfig,
    HifiGANGenerator,
)
from audiogpt_tpu.utils.torch_import import convert_bigvgan, convert_hifigan

import ref_torch


@pytest.fixture(scope="module")
def hifigan_pair():
    ref_torch.add_neuralseq_path()
    from modules.hifigan.hifigan import HifiGanGenerator

    torch.manual_seed(0)
    h = {
        "resblock_kernel_sizes": [3, 7, 11],
        "upsample_rates": [8, 8, 2, 2],
        "upsample_kernel_sizes": [16, 16, 4, 4],
        "upsample_initial_channel": 128,  # slimmer for test speed; same topology
        "resblock": "1",
        "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        "use_pitch_embed": False,
    }
    ref = HifiGanGenerator(h).eval()
    cfg = HifiGANConfig(
        upsample_initial_channel=128,
        use_nsf=False,
    )
    params = convert_hifigan(ref_torch.state_dict_numpy(ref), cfg)
    return ref, HifiGANGenerator(cfg), params


class TestHifiGANParity:
    def test_forward_matches_reference(self, hifigan_pair):
        ref, model, params = hifigan_pair
        rng = np.random.RandomState(0)
        mel = rng.randn(2, 80, 37).astype(np.float32)  # torch layout [B,C,T]
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(mel)).numpy()[:, 0, :]
        y = np.asarray(model.apply(params, jnp.asarray(mel.transpose(0, 2, 1))))
        assert y.shape == y_ref.shape == (2, 37 * 256)
        np.testing.assert_allclose(y, y_ref, atol=1e-4)

    def test_jit_and_dtype(self, hifigan_pair):
        _, model, params = hifigan_pair
        mel = jnp.zeros((1, 32, 80))
        y = jax.jit(model.apply)(params, mel)
        assert y.shape == (1, 32 * 256) and y.dtype == jnp.float32


@pytest.fixture(scope="module")
def bigvgan_pair():
    ref_torch.add_mka_path()
    from vocoder.bigvgan.models import BigVGAN as RefBigVGAN
    from omegaconf import OmegaConf

    torch.manual_seed(0)
    h = OmegaConf.create(
        dict(
            num_mels=80,
            upsample_rates=[8, 8, 2, 2],
            upsample_kernel_sizes=[16, 16, 4, 4],
            upsample_initial_channel=64,
            resblock_kernel_sizes=[3, 7, 11],
            resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
            resblock="1",
            activation="snakebeta",
            snake_logscale=True,
        )
    )
    ref = RefBigVGAN(h).eval()
    cfg = BigVGANConfig(upsample_initial_channel=64)
    params = convert_bigvgan(ref_torch.state_dict_numpy(ref), cfg)
    return ref, BigVGANGenerator(cfg), params


class TestBigVGANParity:
    def test_forward_matches_reference(self, bigvgan_pair):
        ref, model, params = bigvgan_pair
        rng = np.random.RandomState(1)
        mel = rng.randn(1, 80, 25).astype(np.float32)
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(mel)).numpy()[:, 0, :]
        y = np.asarray(model.apply(params, jnp.asarray(mel.transpose(0, 2, 1))))
        assert y.shape == y_ref.shape
        np.testing.assert_allclose(y, y_ref, atol=2e-4)


class TestNSF:
    def test_nsf_hifigan_shapes(self):
        cfg = HifiGANConfig(upsample_initial_channel=64, use_nsf=True)
        model = HifiGANGenerator(cfg)
        mel = jnp.zeros((1, 20, 80))
        f0 = jnp.full((1, 20), 220.0)
        params = model.init(jax.random.PRNGKey(0), mel, f0)
        y = model.apply(params, mel, f0, rng=jax.random.PRNGKey(1))
        assert y.shape == (1, 20 * 256)
        assert bool(jnp.isfinite(y).all())


class TestPWGMelGAN:
    """ParallelWaveGAN + MelGAN generators (parallel_wavegan.py:21,
    melgan.py) through the shared engine."""

    def test_pwg_shapes(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from audiogpt_tpu.models.vocoder.pwg import PWGConfig, PWGGenerator

        cfg = PWGConfig(layers=6, stacks=2, residual_channels=8,
                        gate_channels=16, skip_channels=8,
                        upsample_scales=(4, 4))
        model = PWGGenerator(cfg)
        mel = jnp.zeros((2, 12, 80))
        params = model.init(jax.random.PRNGKey(0), mel)
        wav = model.apply(params, mel, rng=jax.random.PRNGKey(1))
        assert wav.shape == (2, 12 * 16)
        assert np.isfinite(np.asarray(wav)).all()

    def test_melgan_engine(self):
        import numpy as np
        from audiogpt_tpu.engines.vocoder import VocoderEngine
        from audiogpt_tpu.models.vocoder.pwg import MelGANConfig

        cfg = MelGANConfig(channels=32, upsample_scales=(4, 2),
                           stacks=1)
        eng = VocoderEngine("melgan", cfg=cfg, buckets=(32,))
        mel = np.zeros((20, 80), np.float32)
        wav = eng(mel)
        assert wav.shape == (20 * cfg.hop_size,)
        assert np.isfinite(wav).all()

    def test_bf16_throughput_mode_tracks_f32(self):
        # opt-in bf16 engine knob (BW-bound generator, BASELINE roofline):
        # same weights, f32 in/out, output must track the f32 path closely
        import numpy as np
        from audiogpt_tpu.engines.vocoder import VocoderEngine
        from audiogpt_tpu.models.vocoder import HifiGANConfig

        cfg = HifiGANConfig(upsample_initial_channel=32,
                            resblock_kernel_sizes=(3,),
                            resblock_dilation_sizes=((1, 3),))
        f32 = VocoderEngine("hifigan", cfg=cfg, buckets=(32,))
        b16 = VocoderEngine("hifigan", cfg=cfg, params=f32.params,
                            buckets=(32,), bf16=True)
        mel = np.random.RandomState(0).randn(24, 80).astype(np.float32)
        a, b = f32(mel), b16(mel)
        assert b.dtype == np.float32 and a.shape == b.shape
        ref = np.sqrt((a ** 2).mean())
        err = np.sqrt(((a - b) ** 2).mean())
        assert err < 0.05 * ref + 1e-6, (err, ref)

    def test_pwg_engine(self):
        import numpy as np
        from audiogpt_tpu.engines.vocoder import VocoderEngine
        from audiogpt_tpu.models.vocoder.pwg import PWGConfig

        cfg = PWGConfig(layers=4, stacks=2, residual_channels=8,
                        gate_channels=16, skip_channels=8,
                        upsample_scales=(4, 2))
        eng = VocoderEngine("pwg", cfg=cfg, buckets=(16,))
        wav = eng(np.zeros((10, 80), np.float32))
        assert wav.shape == (10 * cfg.hop_size,)


def test_denoise_spectral_subtraction():
    """vocoder_utils.denoise parity: magnitude subtraction preserves a loud
    tone but attenuates low-level broadband noise."""
    import numpy as np
    from audiogpt_tpu.engines.vocoder import denoise

    sr = 16000
    t = np.arange(sr) / sr
    tone = 0.8 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    noise = np.random.default_rng(0).normal(size=sr).astype(np.float32) * 0.01
    out = denoise(tone + noise, v=0.5)
    assert out.shape == tone.shape and np.isfinite(out).all()
    # tone survives
    corr = np.corrcoef(out[1024:-1024], tone[1024:-1024])[0, 1]
    assert corr > 0.98
    # pure noise at the same level is crushed
    out_n = denoise(noise, v=0.5)
    assert np.abs(out_n).mean() < 0.2 * np.abs(noise).mean()


def test_snake_aa_polyphase_identity():
    """The polyphase SnakeAA (no 2x intermediate, two 6-tap stride-1 convs)
    is numerically identical to the literal up2x -> snake -> down2x chain."""
    import jax
    import jax.numpy as jnp

    from audiogpt_tpu.models.vocoder.bigvgan import SnakeAA

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 37, 4).astype(np.float32))
    params = {"params": {
        "alpha": jnp.asarray(rng.randn(4).astype(np.float32) * 0.3),
        "beta": jnp.asarray(rng.randn(4).astype(np.float32) * 0.3)}}
    for variant in ("snakebeta", "snake"):
        p = params if variant == "snakebeta" else {
            "params": {"alpha": params["params"]["alpha"]}}
        y_ref = SnakeAA(4, variant, True, poly=False).apply(p, x)
        y_new = SnakeAA(4, variant, True, poly=True).apply(p, x)
        np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_ref),
                                   atol=2e-6)


def test_bigvgan_pallas_aa_matches_literal():
    """aa_impl='pallas' (fused polyphase Pallas kernel, interpret mode on
    CPU) produces the same waveform as the literal up->snake->down chain
    through the full generator."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from audiogpt_tpu.models.vocoder.bigvgan import (
        BigVGANConfig, BigVGANGenerator,
    )

    cfg_lit = BigVGANConfig(upsample_initial_channel=16,
                            upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
                            resblock_kernel_sizes=(3,),
                            resblock_dilation_sizes=((1, 2),),
                            aa_impl="literal")
    cfg_pal = dc.replace(cfg_lit, aa_impl="pallas")
    mel = jnp.asarray(np.random.RandomState(0).randn(1, 17, 80)
                      .astype(np.float32))
    params = BigVGANGenerator(cfg_lit).init(jax.random.PRNGKey(0), mel)
    # non-zero alphas so the snake actually bends
    params = jax.tree.map(
        lambda a: a + 0.1 if a.ndim == 1 else a, params)
    y_lit = BigVGANGenerator(cfg_lit).apply(params, mel)
    y_pal = BigVGANGenerator(cfg_pal).apply(params, mel)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_lit),
                               atol=3e-6)


def test_snake_aa_pallas_batch_fold_exact():
    """The lane-packing fast path (batch folded into lanes for C<128) must
    be bit-identical to per-batch kernel calls — the fold is a pure layout
    transform; FIR rows and edge clamps are lane-independent."""
    import jax.numpy as jnp

    from audiogpt_tpu.ops.snake_aa import snake_aa_pallas

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 53, 8).astype(np.float32))
    a = jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)
    y_fold = snake_aa_pallas(x, a, b, interpret=True)
    y_ref = jnp.concatenate([
        snake_aa_pallas(x[i:i + 1], a, b, interpret=True) for i in range(3)], 0)
    np.testing.assert_array_equal(np.asarray(y_fold), np.asarray(y_ref))


def test_snake_aa_pallas_bf16_path():
    """aa_bf16 + pallas combination: the kernel accepts bfloat16 tensors
    (bf16 tiles are (16,128) — t_blk stays 16-aligned) and tracks the
    literal bf16 chain within bf16 tolerance."""
    import jax
    import jax.numpy as jnp

    from audiogpt_tpu.models.vocoder.bigvgan import SnakeAA
    from audiogpt_tpu.ops.snake_aa import snake_aa_pallas

    rng = np.random.RandomState(0)
    x32 = jnp.asarray(rng.randn(1, 48, 8).astype(np.float32))
    ar = rng.randn(8).astype(np.float32) * 0.3
    br = rng.randn(8).astype(np.float32) * 0.3
    p = {"params": {"alpha": jnp.asarray(ar), "beta": jnp.asarray(br)}}
    ref = SnakeAA(8, "snakebeta", True, bf16=True, poly=False).apply(p, x32)
    got = snake_aa_pallas(x32.astype(jnp.bfloat16),
                          jnp.exp(jnp.asarray(ar)).astype(jnp.bfloat16),
                          jnp.exp(jnp.asarray(br)).astype(jnp.bfloat16),
                          interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=0.15)
