"""FLOP accounting + MFU (model flops utilization).

The reference has no utilization accounting at all (SURVEY.md §5 tracing:
wall-clock timers only); for a TPU framework "N evals/s" is meaningless
without the chip-peak denominator. Primary source: XLA's own cost analysis on
the compiled executable (exact for the fused program); fallback: analytic
conv/matmul term sums per model family.

MFU convention: measured flops/s ÷ chip peak **bf16** flops/s (the MXU peak —
f32 convs lower to bf16 MXU passes on TPU, so bf16 peak is the honest
denominator for every program we run).
"""

from __future__ import annotations

from typing import Any

# device_kind substring → peak bf16 FLOP/s (public chip specs)
_PEAK_BF16 = (
    ("v6", 918e12),          # Trillium
    ("trillium", 918e12),
    ("v5p", 459e12),
    ("v5e", 197e12),
    ("v5 lite", 197e12),
    ("v5litepod", 197e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
)


def peak_flops() -> tuple[float, str] | None:
    """Chip peak bf16 FLOP/s for device 0, or None if unrecognized."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, peak in _PEAK_BF16:
        if key in kind:
            return peak, kind
    return None


def xla_flops(jitted_fn, *args, **kwargs) -> float | None:
    """FLOPs of one call from XLA's cost analysis of the compiled program.

    Returns None when the backend/runtime doesn't expose cost analysis (then
    fall back to an analytic count)."""
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def hifigan_flops(cfg: Any, frames: int, batch: int = 1) -> float:
    """Analytic conv flops (2·K·Cin·Cout·T_out per conv) for a HiFi-GAN
    forward (models/vocoder/hifigan.py) — fallback when XLA cost analysis is
    unavailable."""
    total = 0.0
    n_mels = cfg.in_channels
    ch = cfg.upsample_initial_channel
    t = frames
    total += 2 * 7 * n_mels * ch * t                       # conv_pre (k=7)
    for i, (r, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        cin, cout = ch, ch // 2
        t_out = t * r
        total += 2 * k * cin * cout * t_out                # up conv
        for rk, dils in zip(cfg.resblock_kernel_sizes,
                            cfg.resblock_dilation_sizes):
            n_convs = 2 * len(dils) if cfg.resblock == "1" else len(dils)
            total += n_convs * 2 * rk * cout * cout * t_out
        ch, t = cout, t_out
    total += 2 * 7 * ch * 1 * t                            # conv_post
    return float(total * batch)


def mfu(flops_per_call: float | None, wall_s: float) -> float | None:
    """flops/s ÷ chip peak; None when either side is unknown."""
    if not flops_per_call or wall_s <= 0:
        return None
    peak = peak_flops()
    if peak is None:
        return None
    return (flops_per_call / wall_s) / peak[0]
