"""Roofline analysis for the tracked MFU metrics (VERDICT r2 weak#6):
state WHAT bounds each program and what its ceiling is, so "MFU 0.26" reads
against a denominator that means something.

Method: lower+compile the exact benched programs, read XLA's cost analysis
(flops + bytes accessed), compute arithmetic intensity AI = flops/bytes, and
the bandwidth-bound utilization ceiling

    mfu_ceiling = min(1, AI / AI_critical),   AI_critical = peak_flops / HBM_BW

A program whose measured MFU approaches its ceiling is roofline-bound — the
next win is reducing BYTES (fusion, bf16 activations, layout), not flops.

Run on the TPU:  python tools/roofline.py [--suite vocoder|ldm|all]
Prints one JSON line per program for BASELINE.md.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

# device_kind substring → HBM GB/s (public chip specs)
_HBM_GBPS = (
    ("v6", 1640.0), ("trillium", 1640.0), ("v5p", 2765.0),
    ("v5e", 819.0), ("v5 lite", 819.0), ("v5litepod", 819.0),
    ("v4", 1228.0), ("v3", 900.0),
)


def hbm_bw() -> float | None:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, bw in _HBM_GBPS:
        if key in kind:
            return bw * 1e9
    return None


def analyze(compiled) -> dict:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    out = {"flops": flops, "bytes": byts}
    if flops and byts:
        from audiogpt_tpu.utils.flops import peak_flops

        out["ai"] = flops / byts
        pk, bw = peak_flops(), hbm_bw()
        if pk and bw:
            ai_crit = pk[0] / bw
            out["ai_critical"] = ai_crit
            out["mfu_ceiling_bw"] = min(1.0, out["ai"] / ai_crit)
    return out


def vocoder(batch: int = 8, frames: int = 1024, bf16: bool = False):
    import jax.numpy as jnp

    from audiogpt_tpu.engines.vocoder import VocoderEngine

    eng = VocoderEngine("hifigan", bf16=bf16)
    mel = jnp.zeros((batch, frames, 80))
    # the EXACT dispatch program the bench times (incl. the f32 I/O casts
    # of the bf16 mode); bf16 AI doubles because parameter + activation
    # byte streams halve while flops stay put
    r = analyze(eng._fn.lower(eng._run_params, mel).compile())
    r["metric"] = (f"hifigan_vocoder_b{batch}"
                   + ("_bf16" if bf16 else "") + "_roofline")
    print(json.dumps(r))


def ldm_train(bf16: bool = False, remat: bool = True):
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiogpt_tpu.models.diffusion import UNetConfig, VAEConfig
    from audiogpt_tpu.train import OptimConfig, Trainer, TrainerConfig
    from audiogpt_tpu.train.tasks import LDMTask, LDMTaskConfig

    task = LDMTask(LDMTaskConfig(
        unet=UNetConfig(use_checkpoint=remat),
        vae=VAEConfig(attn_resolutions=()), scale_factor=0.18215,
        bf16_compute=bf16,
        optim=OptimConfig(optimizer="adamw", lr=1e-4, schedule="constant",
                          clip_grad_norm=1.0, ema_decay=0.9999)))
    rng = np.random.default_rng(0)
    batch = {
        "mels": jnp.asarray(np.tanh(rng.normal(
            size=(16, 80, 624, 1)).astype(np.float32))),
        "text_ids": jnp.asarray(
            rng.integers(3, 1000, (16, 77)).astype(np.int32)),
        "text_mask": jnp.ones((16, 77), jnp.float32),
        "weight": jnp.ones(16, np.float32),
    }
    with tempfile.TemporaryDirectory() as wd:
        trainer = Trainer(task, TrainerConfig(
            work_dir=wd, use_tensorboard=False))
        state = trainer.init_state(jax.random.PRNGKey(0))
        fn = trainer.train_step("unet")
        r = analyze(fn.lower(state, batch, jax.random.PRNGKey(1)).compile())
    r["metric"] = ("ldm_train_b16_roofline"
                   + ("_bf16" if bf16 else "")
                   + ("" if remat else "_noremat"))
    print(json.dumps(r))


def asr_decode(max_tokens: int = 32, batch: int = 1):
    """Whisper e2e transcription roofline (VERDICT r3 next #7): the EXACT
    program behind the 212× RTFx row — log-mel + encoder + prime +
    ``max_tokens``-step KV-cached scan decode as ONE compiled unit
    (``whisper.py _decode_fn``). Also compiles the encoder alone so the
    decode scan's share of flops/bytes can be apportioned: the scan's AI
    says whether per-token decoder-weight streaming (HBM) or the MXU is
    the bound at this batch size."""
    import jax
    import jax.numpy as jnp

    from audiogpt_tpu.engines.asr import ASREngine
    from audiogpt_tpu.models.asr.whisper import WhisperModel, _decode_fn

    eng = ASREngine(max_tokens=max_tokens, temperatures=(0.0,))
    cfg = eng.cfg
    mel = jnp.zeros((batch, 2 * cfg.n_audio_ctx, cfg.n_mels))
    prompt = jnp.tile(jnp.asarray(eng.sot_sequence(), jnp.int32)[None],
                      (batch, 1))
    sup, gte, blanks, nsid = eng._filters
    from audiogpt_tpu.engines.asr import LANG_BASE, N_LANGS

    fn = _decode_fn(eng.model, max_tokens, eng.eot, tuple(sup), gte,
                    tuple(blanks), nsid, lang_range=(LANG_BASE, N_LANGS))
    compiled = fn.lower(eng.params, mel, prompt, jnp.float32(0.0),
                        jax.random.PRNGKey(0)).compile()
    r = analyze(compiled)

    enc = jax.jit(lambda p, m: eng.model.apply(
        p, m, method=WhisperModel.encode))
    r_enc = analyze(enc.lower(eng.params, mel).compile())
    r["metric"] = f"whisper_e2e_decode_b{batch}_t{max_tokens}_roofline"
    r["encoder_flops"] = r_enc.get("flops")
    r["encoder_bytes"] = r_enc.get("bytes")
    if r.get("flops") and r_enc.get("flops"):
        dec_fl = r["flops"] - r_enc["flops"]
        dec_by = r["bytes"] - r_enc["bytes"]
        r["decode_scan_flops_share"] = round(dec_fl / r["flops"], 4)
        r["decode_scan_bytes_share"] = round(dec_by / r["bytes"], 4)
        if dec_by > 0:
            r["decode_scan_ai"] = round(dec_fl / dec_by, 3)
            if "ai_critical" in r:
                r["decode_scan_mfu_ceiling_bw"] = round(
                    min(1.0, (dec_fl / dec_by) / r["ai_critical"]), 4)
    print(json.dumps(r))


if __name__ == "__main__":
    import argparse

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/audiogpt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    p = argparse.ArgumentParser()
    p.add_argument("--suite", default="all")
    a = p.parse_args()
    if a.suite in ("all", "vocoder"):
        vocoder(batch=8)
        vocoder(batch=8, bf16=True)
        vocoder(batch=1)
    if a.suite in ("all", "ldm"):
        ldm_train()
        ldm_train(bf16=True)
        ldm_train(bf16=True, remat=False)
    if a.suite in ("all", "asr"):
        asr_decode(batch=1)
        asr_decode(batch=4)
