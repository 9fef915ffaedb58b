"""Device op profile of an exact benched program via ``jax.profiler``.

Answers "where does the measured wall go?" at per-fusion granularity —
the roofline (`tools/roofline.py`) bounds what the memory system could
give; this tool says what the compiled program actually spends, so gaps
between measured MFU and the bandwidth ceiling get an owner (layout
moves, transposes, dispatch gaps, a dominant fusion...).

Run on the TPU:
  python tools/op_profile.py --suite vocoder [--batch 8] [--bf16]

Prints one JSON line: total device time per iteration and the top-k ops
by device time (name, occurrences, total µs, share).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _device_op_times(logdir: str) -> dict[str, dict[str, tuple[int, float]]]:
    """Parse the trace's XSpace protos: per device-plane LINE, aggregate
    event durations → {line_name: {op_name: (count, total_us)}}. Lines are
    kept separate because planes carry overlapping views (module span vs
    per-op vs async copy) that must not be summed together."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    out: dict[str, dict[str, tuple[int, float]]] = {}
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            name = plane.name.lower()
            if "tpu" not in name and "device" not in name:
                continue
            if "host" in name:
                continue
            metas = {k: v.name for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                agg = out.setdefault(f"{plane.name}/{line.name}", {})
                for ev in line.events:
                    nm = metas.get(ev.metadata_id, "")
                    if not nm:
                        continue
                    dur_us = ev.duration_ps / 1e6
                    c, t = agg.get(nm, (0, 0.0))
                    agg[nm] = (c + 1, t + dur_us)
    return out


def _category(op: str) -> str:
    head = op.split(" = ", 1)[-1]
    if "conv" in head.split("(")[0] or "convolution" in head:
        return "conv"
    if head.startswith("%copy") or "copy-start" in head or "copy-done" in head:
        return "copy/prefetch"
    if head.startswith("%while"):
        return "while(scan)"
    if "transpose" in head.split("(")[0] or "bitcast" in head.split("(")[0]:
        return "layout"
    if "fusion" in head:
        return "fusion(elementwise)"
    if op.startswith("jit_"):
        return "program-span"
    return "other"


def profile_call(fn, iters: int = 10, top_k: int = 12) -> dict:
    """Trace ``fn()`` (host-synced) ``iters`` times; return the aggregate
    device-op profile."""
    import jax

    fn()  # warm (compile outside the trace)
    logdir = tempfile.mkdtemp(prefix="xprof_")
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            fn()
    wall = (time.perf_counter() - t0) / iters
    lines = _device_op_times(logdir)
    # program span: the jit_* entry (whole-module device occupancy)
    span_us = 0.0
    for agg in lines.values():
        for nm, (c, us) in agg.items():
            if nm.startswith("jit_"):
                span_us = max(span_us, us)
    # densest per-op line (ops sum ≤ program span ⇒ not a duplicate view)
    best, best_items = None, []
    for ln, agg in lines.items():
        items = [(nm, c, us) for nm, (c, us) in agg.items()
                 if not nm.startswith("jit_")]
        tot = sum(us for _, _, us in items)
        if items and tot <= span_us * 1.05 and (
                best is None or tot > best[1]):
            best, best_items = (ln, tot), items
    cats: dict[str, float] = {}
    for nm, c, us in best_items:
        cats[_category(nm)] = cats.get(_category(nm), 0.0) + us
    best_items.sort(key=lambda x: -x[2])
    tot = best[1] if best else 0.0
    return {
        "wall_s_per_iter": round(wall, 6),
        "program_span_us_per_iter": round(span_us / iters, 1),
        "ops_line": best[0] if best else None,
        "ops_total_us_per_iter": round(tot / iters, 1),
        "category_us_per_iter": {k: round(v / iters, 1)
                                 for k, v in sorted(cats.items(),
                                                    key=lambda kv: -kv[1])},
        "top_ops": [
            {"op": nm.split(" = ")[0], "kind": _category(nm), "n": c,
             "us_per_iter": round(us / iters, 1),
             "share": round(us / tot, 4) if tot else None}
            for nm, c, us in best_items[:top_k]
        ],
    }


def vocoder(batch: int = 8, frames: int = 1024, bf16: bool = False,
            iters: int = 10):
    import jax.numpy as jnp
    import numpy as np

    from audiogpt_tpu.engines.vocoder import VocoderEngine

    eng = VocoderEngine("hifigan", bf16=bf16)
    mel = jnp.asarray(np.random.RandomState(0).randn(batch, frames, 80)
                      .astype(np.float32) * 0.1)

    def call():
        out = eng._fn(eng._run_params, mel)
        float(out[(0,) * out.ndim])  # host-sync (tunnel: block_until_ready lies)

    r = profile_call(call, iters=iters)
    r["metric"] = (f"hifigan_vocoder_b{batch}"
                   + ("_bf16" if bf16 else "") + "_op_profile")
    print(json.dumps(r))


if __name__ == "__main__":
    import argparse

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/audiogpt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    p = argparse.ArgumentParser()
    p.add_argument("--suite", default="vocoder")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--iters", type=int, default=10)
    a = p.parse_args()
    if a.suite == "vocoder":
        vocoder(batch=a.batch, bf16=a.bf16, iters=a.iters)
