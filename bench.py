"""Benchmark entry point — prints ONE JSON line for the driver.

Headline metric (BASELINE.md north star): vocoder RTF — wall-clock seconds per
generated audio second on one chip for the HiFi-GAN mel→wav path (every
speech/sing tool funnels through a vocoder). Lower is better; target < 0.05.
``vs_baseline`` is target_rtf / measured_rtf (>1 ⇒ beating the target).

Run additional suites with ``python bench.py --suite all``.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench_vocoder_rtf(frames: int = 1024, iters: int = 20, batch: int = 1):
    import jax
    from audiogpt_tpu.engines.vocoder import VocoderEngine

    eng = VocoderEngine("hifigan", buckets=(frames,))
    mel = np.random.RandomState(0).randn(batch, frames, 80).astype(np.float32)
    # compile + warmup
    eng(mel)
    eng(mel)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = eng(mel)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    audio_sec = batch * frames * eng.hop_size / eng.cfg.sample_rate
    return dt / audio_sec, audio_sec, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="headline")
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    rtf, audio_sec, dt = bench_vocoder_rtf(args.frames, args.iters, args.batch)
    target = 0.05
    print(
        json.dumps(
            {
                "metric": "hifigan_vocoder_rtf",
                "value": round(rtf, 6),
                "unit": "wall_sec_per_audio_sec",
                "vs_baseline": round(target / rtf, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
