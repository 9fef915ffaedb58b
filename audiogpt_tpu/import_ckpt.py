"""Checkpoint import CLI — PyTorch reference weights → this framework.

    python -m audiogpt_tpu.import_ckpt --family hifigan \
        --ckpt checkpoints/hifigan/model_ckpt_steps_*.ckpt --out params/hifigan

Covers the converter families in :mod:`audiogpt_tpu.utils.torch_import`
(SURVEY.md §7 hard part (c): torch→JAX conversion per family — weight-norm
folding, GRU layouts, EMA params). The reference stores trainer dicts
(``{'state_dict': ...}``, ``pl_utils.py:743``) or bare state dicts; both
load. Output is an orbax checkpoint directory loadable with
``restore_params(out_dir)``.
"""

from __future__ import annotations

import argparse
import os
from typing import Any, Mapping

import numpy as np


def load_torch_state_dict(path: str, prefix: str | None = None
                          ) -> dict[str, np.ndarray]:
    """torch ckpt → {name: np.ndarray}. Handles pl-trainer wrappers and EMA
    ('model_ema.'-prefixed) entries; ``prefix`` filters+strips (e.g.
    'model.' for NeuralSeq tasks, ckpt_utils.load_ckpt behavior)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("state_dict", "model", "generator"):
        if isinstance(raw, dict) and key in raw and isinstance(raw[key], dict):
            raw = raw[key]
            break
    sd = {}
    for k, v in raw.items():
        if not hasattr(v, "numpy"):
            continue
        if prefix:
            if not k.startswith(prefix):
                continue
            k = k[len(prefix):]
        sd[k] = v.numpy()
    return sd


def convert(family: str, sd: Mapping[str, np.ndarray], cfg: Any) -> dict:
    from audiogpt_tpu.utils import torch_import as ti

    table = {
        "hifigan": ti.convert_hifigan,
        "bigvgan": ti.convert_bigvgan,
        "whisper": ti.convert_whisper,
        "fastspeech2": ti.convert_fastspeech2,
        "ldm_unet": ti.convert_ldm_unet,
        "vae": ti.convert_vae,
        "bert": ti.convert_bert,
        "clap_text": ti.convert_clap_text,
        "diffnet": ti.convert_diffnet,
        "cnn14": ti.convert_cnn14,
        "pwg": ti.convert_pwg,
        "caption": ti.convert_caption,
        "pvt": ti.convert_pvt,
        "lassnet": ti.convert_lassnet,
        "tsd": ti.convert_tsd,
        "binaural": ti.convert_binaural,
        "clip_vision": ti.convert_clip_vision,
        "clip_text_tower": ti.convert_clip_text_tower,
        "diffsinger": ti.convert_diffsinger,
        "htsat": ti.convert_htsat,
        "t5": ti.convert_t5,
        "clip_text_hf": ti.convert_clip_text_hf,
        "blip": ti.convert_blip,
        "gpt2": ti.convert_gpt2,
    }
    if family not in table:
        raise KeyError(f"unknown family {family!r}; have {sorted(table)}")
    return table[family](sd, cfg)


def default_config(family: str) -> Any:
    if family in ("hifigan",):
        from audiogpt_tpu.models.vocoder import HifiGANConfig

        return HifiGANConfig()
    if family == "bigvgan":
        from audiogpt_tpu.models.vocoder import BigVGANConfig

        return BigVGANConfig()
    if family == "whisper":
        from audiogpt_tpu.models.asr.whisper import WhisperConfig

        return WhisperConfig()
    if family == "fastspeech2":
        from audiogpt_tpu.models.tts.fastspeech2 import FastSpeech2Config

        return FastSpeech2Config()
    if family == "ldm_unet":
        from audiogpt_tpu.models.diffusion import UNetConfig

        return UNetConfig()
    if family == "vae":
        from audiogpt_tpu.models.diffusion import VAEConfig

        return VAEConfig()
    if family in ("bert", "clap_text"):
        from audiogpt_tpu.models.textenc import CLAPTextConfig
        from audiogpt_tpu.models.textenc.bert import BertConfig

        return CLAPTextConfig() if family == "clap_text" else BertConfig()
    if family == "diffnet":
        from audiogpt_tpu.models.svs.diffsinger import DiffNetConfig

        return DiffNetConfig()
    if family == "t5":
        from audiogpt_tpu.models.textenc.t5 import T5Config

        return T5Config()
    if family == "cnn14":
        from audiogpt_tpu.models.caption.cnn14 import Cnn14Config

        return Cnn14Config()
    if family == "pwg":
        from audiogpt_tpu.models.vocoder.pwg import PWGConfig

        return PWGConfig(upsample="conv_in")
    if family == "caption":
        from audiogpt_tpu.models.caption.captioner import CaptionConfig

        return CaptionConfig()
    if family == "pvt":
        from audiogpt_tpu.models.sed.pvt import PVTConfig

        return PVTConfig()
    if family == "lassnet":
        from audiogpt_tpu.models.extraction.lassnet import LASSNetConfig

        return LASSNetConfig()
    if family == "tsd":
        from audiogpt_tpu.models.sed.tsd import TSDConfig

        return TSDConfig()
    if family == "binaural":
        from audiogpt_tpu.models.binaural import BinauralConfig

        return BinauralConfig()
    if family in ("clip_vision", "clip_text_tower"):
        from audiogpt_tpu.models.textenc.clip import (
            CLIPTextConfig, CLIPVisionConfig,
        )

        return (CLIPVisionConfig() if family == "clip_vision"
                else CLIPTextConfig())
    if family == "blip":
        from audiogpt_tpu.models.caption.blip import BlipConfig

        return BlipConfig()
    if family == "diffsinger":
        from audiogpt_tpu.models.svs.diffsinger import DiffSingerConfig

        return DiffSingerConfig()
    if family == "gpt2":
        from audiogpt_tpu.models.textenc.gpt2 import GPT2Config

        return GPT2Config()
    raise KeyError(family)


def save_params(params: dict, out_dir: str) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(out_dir), params, force=True)
    ckptr.wait_until_finished()


def restore_params(out_dir: str) -> dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(out_dir))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--prefix", default=None,
                    help="state-dict key prefix to filter+strip (e.g. 'model.')")
    args = ap.parse_args(argv)

    sd = load_torch_state_dict(args.ckpt, args.prefix)
    params = convert(args.family, sd, default_config(args.family))
    save_params({"params": params} if "params" not in params else params,
                args.out)
    n = sum(np.asarray(x).size for x in
            __import__("jax").tree.leaves(params))
    print(f"| imported {args.family}: {len(sd)} tensors -> {args.out} "
          f"({n/1e6:.1f} M params)")


if __name__ == "__main__":
    main()
