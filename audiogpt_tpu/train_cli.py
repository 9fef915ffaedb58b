"""Training entry point — the reference's ``python tasks/run.py --config
egs/... --exp_name ...`` convention (``BaseTask.start``,
``NeuralSeq/tasks/base_task.py:221``), driven by the yaml-inheritance Config.

    python -m audiogpt_tpu.train_cli --config configs/tts/fs2.yaml \
        --exp_name exp/fs2_lj --hparams "optim.lr=1.0,max_updates=100000"

The resolved config persists to ``<exp_name>/config.yaml`` (hparams.py:109
behavior) and the work dir holds checkpoints + metrics.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Any

from audiogpt_tpu.config import Config, load_config


def _fill(dc_cls, data: dict) -> Any:
    """Build a (nested) dataclass from a plain dict, keeping defaults for
    missing keys and descending into dataclass-typed fields."""
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(dc_cls)}
    for k, v in data.items():
        if k not in fields:
            continue
        f = fields[k]
        default = getattr(dc_cls, k, f.default)
        if dataclasses.is_dataclass(f.default) and isinstance(v, dict):
            kwargs[k] = _fill(type(f.default), v)
        elif isinstance(v, list):
            kwargs[k] = tuple(tuple(x) if isinstance(x, list) else x
                              for x in v)
        else:
            kwargs[k] = v
        del default
    return dc_cls(**kwargs)


def _optim_from(cfg: Config):
    from audiogpt_tpu.train.optim import OptimConfig

    return _fill(OptimConfig, dict(cfg.get("optim", {})))


def build_task(cfg: Config):
    """task name → Task instance with model/loss hparams from the config."""
    name = cfg.get("task", "fs2")
    model = dict(cfg.get("model", {}))
    loss = dict(cfg.get("loss", {}))
    optim = _optim_from(cfg)
    if name == "fs2":
        from audiogpt_tpu.models.tts.fastspeech2 import FastSpeech2Config
        from audiogpt_tpu.train.tasks import FS2Task, FS2TaskConfig

        return FS2Task(_fill(FS2TaskConfig, {
            "model": model, "optim": dataclasses.asdict(optim), **loss}))
    if name == "diffsinger":
        from audiogpt_tpu.train.tasks import (
            DiffSingerTask, DiffSingerTaskConfig,
        )

        return DiffSingerTask(_fill(DiffSingerTaskConfig, {
            "model": model, "optim": dataclasses.asdict(optim), **loss}))
    if name == "vocoder_gan":
        from audiogpt_tpu.train.tasks import (
            VocoderGANTask, VocoderGANTaskConfig,
        )

        return VocoderGANTask(_fill(VocoderGANTaskConfig, {
            "gen": model, "segment_frames": cfg.get("segment_frames", 32),
            "optim_gen": dataclasses.asdict(optim),
            "optim_disc": dataclasses.asdict(optim), **loss}))
    if name == "generspeech":
        from audiogpt_tpu.train.tasks import (
            GenerSpeechTask, GenerSpeechTaskConfig,
        )

        return GenerSpeechTask(_fill(GenerSpeechTaskConfig, {
            "model": model, "optim": dataclasses.asdict(optim), **loss}))
    if name in ("portaspeech", "syntaspeech", "ps_adv", "synta_adv"):
        from audiogpt_tpu.train.tasks import (
            PortaSpeechAdvTask, PortaSpeechAdvTaskConfig,
            PortaSpeechTask, PortaSpeechTaskConfig,
        )

        if name in ("syntaspeech", "synta_adv"):
            model.setdefault("use_graph", True)
        ps_kw = {"model": model, "optim": dataclasses.asdict(optim), **loss}
        if name in ("ps_adv", "synta_adv"):
            adv = dict(cfg.get("adv", {}))
            return PortaSpeechAdvTask(_fill(PortaSpeechAdvTaskConfig, {
                "ps": ps_kw, **adv}))
        return PortaSpeechTask(_fill(PortaSpeechTaskConfig, ps_kw))
    if name == "ldm":
        # T2A latent diffusion (ddpm_audio.py:43 as pl.LightningModule)
        from audiogpt_tpu.train.tasks import LDMTask, LDMTaskConfig

        return LDMTask(_fill(LDMTaskConfig, {
            **model, "optim": dataclasses.asdict(optim), **loss}))
    if name == "vae":
        # first-stage AutoencoderKL GAN recipe (ldm/models/autoencoder.py:305)
        from audiogpt_tpu.train.tasks import VAETask, VAETaskConfig

        return VAETask(_fill(VAETaskConfig, {
            **model, "optim_vae": dataclasses.asdict(optim),
            "optim_disc": dataclasses.asdict(optim), **loss}))
    if name == "clap":
        # contrastive audio-text pretraining (open_clap/loss.py:306 semantics)
        from audiogpt_tpu.train.tasks import CLAPTask, CLAPTaskConfig

        return CLAPTask(_fill(CLAPTaskConfig, {
            **model, "optim": dataclasses.asdict(optim), **loss}))
    if name == "sed":
        # AudioSet tagging (audio_infer/pytorch/main.py:377)
        from audiogpt_tpu.train.tasks import SEDTask, SEDTaskConfig

        return SEDTask(_fill(SEDTaskConfig, {
            "model": model, "optim": dataclasses.asdict(optim), **loss}))
    if name == "caption":
        from audiogpt_tpu.train.tasks import CaptionTask, CaptionTaskConfig

        return CaptionTask(_fill(CaptionTaskConfig, {
            "model": model, "optim": dataclasses.asdict(optim), **loss}))
    if name == "separation":
        from audiogpt_tpu.train.tasks import (
            SeparationTask, SeparationTaskConfig,
        )

        return SeparationTask(_fill(SeparationTaskConfig, {
            "model": model, "optim": dataclasses.asdict(optim), **loss}))
    if name == "visinger":
        from audiogpt_tpu.train.tasks import VISingerTask, VISingerTaskConfig

        return VISingerTask(_fill(VISingerTaskConfig, {
            "model": model, "disc": dict(cfg.get("disc", {})),
            "optim_model": dataclasses.asdict(optim),
            "optim_disc": dataclasses.asdict(optim), **loss}))
    if name == "pe":
        from audiogpt_tpu.train.tasks import PETask, PETaskConfig

        return PETask(_fill(PETaskConfig, {
            "model": model, "optim": dataclasses.asdict(optim), **loss}))
    if name == "audio2motion":
        # GeneFace-class variational motion generator (models/face/)
        from audiogpt_tpu.train.tasks import (
            Audio2MotionTask, Audio2MotionTaskConfig,
        )

        return Audio2MotionTask(_fill(Audio2MotionTaskConfig, {
            "model": model, "optim": dataclasses.asdict(optim), **loss}))
    raise ValueError(f"unknown task {name!r}")


def build_loaders(cfg: Config, task_name: str):
    import functools
    import os as _os

    from audiogpt_tpu.data import (
        ArrayDataLoader, BucketSpec, TTSDataLoader, VocoderDataLoader,
        collate_audio_text, collate_mel_image, collate_mixture,
        collate_motion, collate_tagging, collate_tts, load_split,
    )

    d = cfg.get("data", {})
    bin_dir = d.get("binary_dir", "data/bin")
    train_ds = load_split(bin_dir, "train")
    has_valid = _os.path.exists(_os.path.join(bin_dir, "valid.idx"))

    if task_name == "vocoder_gan":
        gen_cfg = cfg.get("model", {})
        import numpy as np

        hop = int(np.prod(tuple(gen_cfg.get("upsample_rates", (8, 8, 2, 2)))))
        loader = VocoderDataLoader(train_ds,
                                   segment_frames=cfg.get("segment_frames", 32),
                                   hop=hop,
                                   batch_size=cfg.get("batch_size", 16))
        return iter(loader), None

    # fixed-shape (non-bucketed) recipes: one static shape per run
    fixed_collates = {
        "ldm": lambda: functools.partial(
            collate_mel_image, width=d.get("width", 624),
            text_len=d.get("text_len", 77)),
        "vae": lambda: functools.partial(
            collate_mel_image, width=d.get("width", 624)),
        "sed": lambda: functools.partial(
            collate_tagging,
            n_samples=int(d.get("sample_rate", 32000)
                          * d.get("clip_seconds", 10.0))),
        "caption": lambda: functools.partial(
            collate_audio_text,
            n_samples=int(d.get("sample_rate", 32000)
                          * d.get("clip_seconds", 10.0)),
            text_len=d.get("text_len", 22), schema="caption"),
        "clap": lambda: functools.partial(
            collate_audio_text,
            n_samples=int(d.get("sample_rate", 16000)
                          * d.get("clip_seconds", 10.0)),
            text_len=d.get("text_len", 77), schema="clap"),
        "separation": lambda: functools.partial(
            collate_mixture,
            n_samples=int(d.get("sample_rate", 8000)
                          * d.get("clip_seconds", 4.0))),
        "audio2motion": lambda: functools.partial(
            collate_motion, mel_len=d.get("mel_len", 512),
            video_len=d.get("mel_len", 512)
            * cfg.get("model", {}).get("fps", 25)
            * cfg.get("model", {}).get("hop", 256)
            // cfg.get("model", {}).get("sample_rate", 16000)),
    }
    if task_name in fixed_collates:
        collate = fixed_collates[task_name]()
        bs = cfg.get("batch_size", 16)
        train = ArrayDataLoader(train_ds, collate, batch_size=bs)

        def val_fn():
            return ArrayDataLoader(load_split(bin_dir, "valid"), collate,
                                   batch_size=bs, shuffle=False).epoch(0)

        return iter(train), (val_fn if has_valid else None)

    # token-budget bucketed TTS/SVS recipes
    spec = BucketSpec.dyadic(d.get("max_len", 2048), d.get("max_batch", 64),
                             min_batch=d.get("min_batch", 8))
    collate_fn = None
    if task_name == "visinger":
        # end-to-end SVS also consumes the waveform + linear spec; the
        # decoder hop is the product of its upsample rates (HifiGANConfig)
        import numpy as np

        dec = cfg.get("model", {}).get("decoder", {})
        hop = int(np.prod(tuple(dec.get("upsample_rates", (8, 8, 2, 2)))))
        collate_fn = functools.partial(collate_tts, wav_hop=hop)
    train = TTSDataLoader(train_ds, max_tokens=d.get("max_tokens", 30000),
                          max_sentences=d.get("max_sentences", 100),
                          spec=spec, collate_fn=collate_fn)

    def val_fn():
        val_ds = load_split(bin_dir, "valid")
        return TTSDataLoader(val_ds, max_tokens=d.get("max_tokens", 30000),
                             max_sentences=d.get("max_sentences", 100),
                             spec=spec, shuffle=False,
                             collate_fn=collate_fn).epoch(0)

    return iter(train), (val_fn if has_valid else None)


def main(argv=None):
    from audiogpt_tpu.train import Trainer, TrainerConfig

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--exp_name", required=True)
    ap.add_argument("--hparams", default="", help='dot overrides "a.b=1,c=2"')
    ap.add_argument("--max_updates", type=int, default=None)
    ap.add_argument("--export", default=None, metavar="DIR",
                    help="after training, write inference params (the EMA "
                         "view when the recipe tracks shadows — the "
                         "reference samples under ema_scope) via "
                         "import_ckpt.save_params; load with app.py --ckpt "
                         "or infer_cli --params")
    args = ap.parse_args(argv)

    cfg = load_config(args.config, overrides=args.hparams)
    cfg.save(os.path.join(args.exp_name, "config.yaml"))

    task = build_task(cfg)
    tcfg = TrainerConfig(
        work_dir=args.exp_name,
        max_updates=args.max_updates or cfg.get("max_updates", 1_000_000),
        val_check_interval=cfg.get("val_check_interval", 2000),
        num_sanity_val_steps=cfg.get("num_sanity_val_steps", 5),
        log_interval=cfg.get("log_interval", 100),
        num_ckpt_keep=cfg.get("num_ckpt_keep", 3),
        seed=cfg.get("seed", 1234))
    trainer = Trainer(task, tcfg)
    train_it, val_fn = build_loaders(cfg, cfg.get("task", "fs2"))
    state = trainer.fit(train_it, val_fn)
    if args.export:
        from audiogpt_tpu.import_ckpt import save_params

        params = trainer.ema_params(state)
        if len(params) == 1:  # single-group recipe: export the bare tree
            params = params[next(iter(params))]
        save_params(params, args.export)
        print(f"| exported inference params -> {args.export}")


if __name__ == "__main__":
    main()
