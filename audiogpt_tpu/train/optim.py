"""Optimizer / LR-schedule factories (optax).

Reference semantics reproduced (SURVEY.md §7.10):
  * Adam + warmup→rsqrt decay — NeuralSeq's ``RSQRTSchedule``
    (``NeuralSeq/modules/commons/common_layers.py``; defaults lr=2.0,
    warmup_updates=8000, hidden_size^-0.5 scaling in the TTS configs),
  * global-norm gradient clipping (``clip_grad_norm``, ``pl_utils.py:1535``),
  * gradient accumulation (``GradientAccumulationScheduler``,
    ``pl_utils.py:257``; here: ``optax.MultiSteps`` inside the one jitted
    update — no Python-side closure juggling),
  * GAN AdamW pair with per-step exponential decay (HiFi-GAN recipe,
    ``modules/hifigan``/config: betas (0.8, 0.99), lr_decay 0.999).
"""

from __future__ import annotations

import dataclasses

import optax


def warmup_rsqrt_schedule(lr: float = 2.0, warmup_steps: int = 8000,
                          hidden_size: int = 256) -> optax.Schedule:
    """lr * d^-0.5 * min(step*warmup^-1.5, step^-0.5) (Transformer/NoamLR —
    the reference's RSQRTSchedule)."""
    scale = lr * hidden_size ** -0.5

    def schedule(step):
        s = step + 1.0
        return scale * (s * warmup_steps ** -1.5).clip(max=(s ** -0.5))

    return schedule


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    optimizer: str = "adam"          # 'adam' | 'adamw'
    lr: float = 2.0
    schedule: str = "rsqrt"          # 'rsqrt' | 'constant' | 'exponential'
    warmup_steps: int = 8000
    hidden_size: int = 256
    beta1: float = 0.9
    beta2: float = 0.98
    weight_decay: float = 0.0
    clip_grad_norm: float = 1.0      # 0 disables
    accumulate_steps: int = 1
    lr_decay: float = 0.999          # exponential schedule (GAN)
    lr_decay_every: int = 1000
    #: weight EMA (reference LitEma, ldm/modules/ema.py via ddpm.py:43
    #: ``use_ema=True``): 0 disables; shadow params live in state["ema"]
    #: and update inside the jitted step (one fused program, no extra
    #: dispatch). ``ema_warmup`` reproduces LitEma's num_updates ramp
    #: ``min(decay, (1 + n) / (10 + n))``.
    ema_decay: float = 0.0
    ema_warmup: bool = True


def make_schedule(cfg: OptimConfig) -> optax.Schedule:
    if cfg.schedule == "rsqrt":
        return warmup_rsqrt_schedule(cfg.lr, cfg.warmup_steps, cfg.hidden_size)
    if cfg.schedule == "exponential":
        return optax.exponential_decay(
            cfg.lr, cfg.lr_decay_every, cfg.lr_decay, staircase=True)
    return optax.constant_schedule(cfg.lr)


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    sched = make_schedule(cfg)
    parts = []
    if cfg.clip_grad_norm and cfg.clip_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(cfg.clip_grad_norm))
    if cfg.optimizer == "adamw":
        parts.append(optax.adamw(sched, b1=cfg.beta1, b2=cfg.beta2,
                                 weight_decay=cfg.weight_decay))
    else:
        parts.append(optax.adam(sched, b1=cfg.beta1, b2=cfg.beta2))
    tx = optax.chain(*parts)
    if cfg.accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate_steps)
    return tx
