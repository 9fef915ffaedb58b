"""CLIP towers + I2A engine tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiogpt_tpu.models.textenc.clip import (
    CLIPTextConfig, CLIPTextTower, CLIPVisionConfig, CLIPVisionEncoder,
    preprocess_image,
)


def _tiny_vision(embed=32):
    return CLIPVisionConfig(image_size=32, patch_size=8, width=16, layers=1,
                            heads=2, embed_dim=embed)


def _tiny_text(embed=32):
    return CLIPTextConfig(vocab_size=100, context_length=16, width=16,
                          layers=1, heads=2, embed_dim=embed)


def test_vision_normalized():
    cfg = _tiny_vision()
    model = CLIPVisionEncoder(cfg)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), img)
    z = model.apply(params, img)
    assert z.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=-1), 1.0,
                               atol=1e-5)


def test_text_eot_pooling():
    cfg = _tiny_text()
    model = CLIPTextTower(cfg)
    toks = jnp.asarray([[1, 5, 7, 99, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]],
                       jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks)
    z = model.apply(params, toks)
    assert z.shape == (1, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=-1), 1.0,
                               atol=1e-5)
    # causality: tokens AFTER the EOT (max-id) position cannot change z
    toks2 = toks.at[0, 5].set(3)
    z2 = model.apply(params, toks2)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2), atol=1e-6)
    # tokens before EOT do change it
    toks3 = toks.at[0, 1].set(9)
    z3 = model.apply(params, toks3)
    assert np.abs(np.asarray(z) - np.asarray(z3)).max() > 1e-6


def test_preprocess_array():
    arr = np.random.default_rng(0).integers(0, 255, (32, 32, 3)).astype(np.uint8)
    out = preprocess_image(arr, 32)
    assert out.shape == (1, 32, 32, 3)
    assert out.dtype == np.float32


def test_i2a_engine(tmp_path):
    from audiogpt_tpu.engines.i2a import I2AEngine
    from audiogpt_tpu.engines.t2a import T2AConfig, T2AEngine
    from audiogpt_tpu.models.diffusion import UNetConfig, VAEConfig
    from audiogpt_tpu.models.textenc import CLAPTextConfig
    from audiogpt_tpu.models.textenc.bert import BertConfig

    t2a = T2AEngine(T2AConfig(
        unet=UNetConfig(model_channels=32, num_res_blocks=1,
                        channel_mult=(1, 2), num_heads=4, context_dim=32,
                        in_channels=4, use_checkpoint=False),
        vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), in_channels=1, z_channels=4,
                      resolution=16),
        clap=CLAPTextConfig(bert=BertConfig(vocab_size=100, hidden_size=16,
                                            num_layers=1, num_heads=2,
                                            intermediate_size=32), d_proj=32),
        mel_bins=16, mel_len=32))
    eng = I2AEngine(t2a, _tiny_vision(32), _tiny_text(32))

    from PIL import Image
    img_path = str(tmp_path / "img.png")
    Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (40, 56, 3)).astype(np.uint8)).save(img_path)

    mel, sr = eng.img2audio(img_path, ddim_steps=4)
    assert sr == 16000
    assert mel.shape[1] == 16 and np.isfinite(mel).all()

    # Different image → different audio. NOTE: the UNet's proj_out/out_conv
    # are zero-initialized (SD convention), so at exactly-random init the
    # eps net ignores everything; nudge all params off zero first.
    leaves, treedef = jax.tree_util.tree_flatten(t2a.params)
    rngs = jax.random.split(jax.random.PRNGKey(0), len(leaves))
    t2a.params = jax.tree_util.tree_unflatten(treedef, [
        l + 0.01 * jax.random.normal(r, jnp.shape(l), jnp.result_type(float))
        if hasattr(l, "shape") else l for l, r in zip(leaves, rngs)])
    mel1b, _ = eng.img2audio(img_path, ddim_steps=4)
    img2 = str(tmp_path / "img2.png")
    Image.fromarray(np.random.default_rng(7).integers(
        0, 255, (40, 56, 3)).astype(np.uint8)).save(img2)
    mel2, _ = eng.img2audio(img2, ddim_steps=4)
    assert np.abs(mel1b - mel2).max() > 1e-6


def test_i2a_fused_vocoder_matches_separate(tmp_path):
    """img2audio through the fused sampler+VAE+vocoder program returns the
    same waveform as the separate mel→vocoder path."""
    from audiogpt_tpu.engines.i2a import I2AEngine
    from audiogpt_tpu.engines.t2a import T2AConfig, T2AEngine
    from audiogpt_tpu.engines.vocoder import VocoderEngine
    from audiogpt_tpu.models.diffusion import UNetConfig, VAEConfig
    from audiogpt_tpu.models.textenc import CLAPTextConfig
    from audiogpt_tpu.models.textenc.bert import BertConfig
    from audiogpt_tpu.models.vocoder import BigVGANConfig

    cfg = T2AConfig(
        unet=UNetConfig(model_channels=32, num_res_blocks=1,
                        channel_mult=(1, 2), num_heads=4, context_dim=32,
                        in_channels=4, use_checkpoint=False),
        vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(), in_channels=1, z_channels=4,
                      resolution=16),
        clap=CLAPTextConfig(bert=BertConfig(vocab_size=100, hidden_size=16,
                                            num_layers=1, num_heads=2,
                                            intermediate_size=32), d_proj=32),
        mel_bins=16, mel_len=32)
    vcfg = BigVGANConfig(num_mels=16, upsample_rates=(4, 2),
                         upsample_kernel_sizes=(8, 4),
                         upsample_initial_channel=32,
                         resblock_kernel_sizes=(3,),
                         resblock_dilation_sizes=((1, 3),))
    voc = VocoderEngine("bigvgan", cfg=vcfg, buckets=(32,))
    t2a_f = T2AEngine(cfg, vocoder=voc)
    t2a_p = T2AEngine(cfg)
    t2a_p.params = t2a_f.params
    vis, txt = _tiny_vision(32), _tiny_text(32)
    eng_f = I2AEngine(t2a_f, vis, txt)
    eng_p = I2AEngine(t2a_p, vis, txt)
    eng_p.vision_params = eng_f.vision_params
    eng_p.text_params = eng_f.text_params

    from PIL import Image
    img_path = str(tmp_path / "img.png")
    Image.fromarray(np.random.default_rng(3).integers(
        0, 255, (40, 56, 3)).astype(np.uint8)).save(img_path)
    wav, sr = eng_f.img2audio(img_path, ddim_steps=3)
    mel, _ = eng_p.img2audio(img_path, ddim_steps=3)
    assert wav.ndim == 1 and wav.shape[0] == 32 * 8 and sr == 16000
    np.testing.assert_allclose(wav, voc(mel), atol=2e-5)
