"""PitchExtractor — mel → (f0, uv) network.

Reference: ``NeuralSeq/modules/fastspeech/pe.py:119`` (``PitchExtractor``:
3-layer conv Prenet → conv encoder → 5-layer PitchPredictor with uv head),
trained by ``tasks/tts/pe.py`` and used at SVS inference to extract f0 from
the predicted mel for the NSF vocoder (``ds_e2e.py:42-44`` when
``pe_enable``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from audiogpt_tpu.models.tts.fastspeech2 import (
    ConvPredictor, FastSpeech2Config, denorm_f0,
)


@dataclasses.dataclass(frozen=True)
class PitchExtractorConfig:
    n_mels: int = 80
    hidden: int = 256
    prenet_layers: int = 3
    conv_layers: int = 2
    predictor_layers: int = 5
    predictor_kernel: int = 5
    pitch_norm: str = "standard"
    f0_mean: float = 200.0
    f0_std: float = 60.0
    use_uv: bool = True

    @property
    def _fs2_like(self) -> FastSpeech2Config:
        # denorm_f0 reads these fields only
        return FastSpeech2Config(pitch_norm=self.pitch_norm,
                                 f0_mean=self.f0_mean, f0_std=self.f0_std,
                                 use_uv=self.use_uv)


class PitchExtractor(nn.Module):
    cfg: PitchExtractorConfig = PitchExtractorConfig()

    @nn.compact
    def __call__(self, mel: jnp.ndarray):
        """mel [B, T, M] → dict(pitch_pred [B, T, 2], f0_denorm_pred [B, T])."""
        cfg = self.cfg
        nonpad = (jnp.abs(mel).sum(-1) > 0).astype(jnp.float32)
        x = mel
        # Prenet: conv+relu+norm stack (pe.py:7)
        for i in range(cfg.prenet_layers):
            x = nn.Conv(cfg.hidden, (5,), padding="SAME",
                        name=f"prenet{i}")(x)
            x = jax.nn.relu(x)
            x = nn.LayerNorm(name=f"prenet_ln{i}")(x)
            x = x * nonpad[..., None]
        x = nn.Dense(cfg.hidden, name="prenet_out")(x) * nonpad[..., None]
        # residual conv encoder (ConvStacks)
        for i in range(cfg.conv_layers):
            h = nn.Conv(cfg.hidden, (3,), padding="SAME", name=f"enc{i}")(x)
            x = (x + jax.nn.relu(nn.LayerNorm(name=f"enc_ln{i}")(h))) \
                * nonpad[..., None]
        pitch_pred = ConvPredictor(
            cfg.hidden, cfg.predictor_layers, cfg.predictor_kernel, 2,
            with_pos=True, pos_dim=cfg.hidden, name="pitch_predictor")(
            x, nonpad=nonpad, pos_nonpad=nonpad)
        uv = (pitch_pred[..., 1] > 0).astype(jnp.float32) if cfg.use_uv \
            else None
        f0_denorm = denorm_f0(pitch_pred[..., 0], uv, cfg._fs2_like,
                              pitch_padding=nonpad == 0)
        return {"pitch_pred": pitch_pred, "f0_denorm_pred": f0_denorm}
