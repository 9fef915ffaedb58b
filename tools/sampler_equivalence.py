"""Measure DDIM-100 vs fast-sampler output equivalence at the production T2A
config (VERDICT round-1 item 3: beating the reference's DDIM-100 x3 setting
OR a measured argument that the fast sampler is output-equivalent).

Fast sampler defaults to PLMS-25; pass e.g. ``--sampler dpmpp --steps 12``
to measure DPM-Solver++(2M).

Method: both samplers integrate the same probability-flow ODE over the same
schedule; with identical weights, conditioning, and x_T, an output-equivalent
fast sampler lands near the DDIM-100 reference trajectory. We report, over N
seeds:

  * d_sampler  = L1(mel_ddim100(seed), mel_plms25(seed))   same-seed gap
  * d_seed     = L1(mel_ddim100(seed_i), mel_ddim100(seed_j))  cross-seed
                 scale reference (what "different output" looks like)
  * ratio      = mean d_sampler / mean d_seed  (≪ 1 ⇒ the 4× cheaper PLMS-25
                 reproduces the DDIM-100 output rather than sampling a
                 different point of the distribution)

Weights are randomly initialized + perturbed (zero-init output layers make
an untrained UNet condition-independent — CLAUDE.md); the comparison is a
property of the SAMPLERS on a fixed eps-network, not of audio quality.

Run on the TPU:  python tools/sampler_equivalence.py [n_seeds]
Prints one JSON line for BASELINE.md.

``--clap`` adds the REFERENCE'S OWN acceptance metric (VERDICT r2 weak#4):
the reference picks winners by CLAP score (``select_best_audio``,
``audio-chatgpt.py:185-199``), so equivalence is also measured where it
matters — per-candidate CLAP scores and best-of-3 winner agreement across
samplers, against the cross-seed score spread as the scale reference.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import jax


def clap_equivalence(n_seeds: int = 3, sampler: str = "dpmpp",
                     steps: int = 12, n_candidates: int = 3,
                     scorer_dir: str | None = None,
                     prompts=("a dog barking",
                              "rain falling on a tin roof",
                              "a siren passing by",
                              "birds chirping in a forest",
                              "a crowd applauding in a hall")):
    """Best-of-n CLAP-score equivalence: DDIM-100 vs the fast sampler on
    identical weights/seeds, scored by the in-repo CLAPScorer. With
    ``scorer_dir`` (output of ``tools/train_tiny_clap.py``) the scorer is a
    TRAINED CLAP whose held-out retrieval beats chance — the shape of the
    reference's own acceptance metric (``select_best_audio``,
    audio-chatgpt.py:185-199, trained CLAP). Without it, random perturbed
    weights: still a valid sampler-vs-sampler consistency statistic on a
    fixed scoring function, but rankings are non-semantic (state which one
    in BASELINE.md). Reports per-candidate score deltas vs cross-seed
    spread + winner agreement."""
    jax.config.update("jax_compilation_cache_dir", "/tmp/audiogpt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import warnings

    import jax.numpy as jnp
    import numpy as np

    from audiogpt_tpu.engines.t2a import T2AConfig, T2AEngine
    from audiogpt_tpu.engines.vocoder import VocoderEngine
    from audiogpt_tpu.models.textenc.clap import CLAPScorer

    warnings.filterwarnings("ignore", message=r"\[WordPieceTokenizer\].*")
    voc = VocoderEngine("bigvgan", buckets=(624,))
    scorer_kind = "random-perturbed"
    if scorer_dir:
        from audiogpt_tpu.import_ckpt import restore_params
        from audiogpt_tpu.models.textenc.bert import BertConfig
        from audiogpt_tpu.models.textenc.clap import CLAPTextConfig

        with open(f"{scorer_dir}/meta.json") as f:
            meta = json.load(f)
        saved = restore_params(f"{scorer_dir}/params")
        audio_cfg = None
        if meta.get("cnn14_channels"):
            from audiogpt_tpu.models.caption.cnn14 import Cnn14Config

            audio_cfg = Cnn14Config(channels=tuple(meta["cnn14_channels"]))
        # saved towers are full flax variable dicts ({"params": ...} plus
        # batch_stats for the Cnn14 audio backbone)
        scorer = CLAPScorer(
            text_cfg=CLAPTextConfig(bert=BertConfig(**meta["bert"]),
                                    d_proj=meta["d_proj"],
                                    max_length=meta["max_length"]),
            text_params=saved["text"],
            audio_params=saved["audio"], audio_cfg=audio_cfg,
            sample_rate=meta.get("sample_rate", 16000))
        scorer_kind = (f"trained (holdout retrieval "
                       f"{meta.get('holdout_retrieval_acc')})")
    else:
        scorer = CLAPScorer(sample_rate=16000)
    eng = T2AEngine(T2AConfig(), vocoder=voc, scorer=scorer)

    def perturb(params, key):
        leaves, treedef = jax.tree.flatten(params)
        rngs = jax.random.split(jax.random.PRNGKey(key), len(leaves))
        return jax.tree.unflatten(treedef, [
            l + 0.02 * jax.random.normal(r, l.shape, l.dtype)
            if l.dtype == jnp.float32 else l
            for l, r in zip(leaves, rngs)])

    eng.params = perturb(eng.params, 7)
    if not scorer_dir:  # never perturb a trained scorer
        scorer.text_params = perturb(scorer.text_params, 8)
        scorer.audio_params = perturb(scorer.audio_params, 9)

    # scores[sampler_name][prompt][seed] = [n_candidates] CLAP similarities
    scores = {"ddim": {}, sampler: {}}
    agree = total = 0
    for prompt in prompts:
        for name, st in (("ddim", 100), (sampler, steps)):
            rows = []
            for s in range(n_seeds):
                _, wavs = eng.txt2audio(prompt, n_samples=n_candidates,
                                        ddim_steps=st, seed=s, sampler=name)
                rows.append(np.asarray(scorer.score(prompt, wavs)))
            scores[name][prompt] = rows
        for s in range(n_seeds):
            a = scores["ddim"][prompt][s]
            b = scores[sampler][prompt][s]
            agree += int(a.argmax() == b.argmax())
            total += 1
        print(f"prompt done: {prompt}", file=sys.stderr, flush=True)

    import numpy as np
    same = float(np.mean([np.abs(scores["ddim"][p][s] - scores[sampler][p][s])
                          for p in prompts for s in range(n_seeds)]))
    cross = float(np.mean([np.abs(scores["ddim"][p][i] - scores["ddim"][p][j])
                           for p in prompts
                           for i in range(n_seeds)
                           for j in range(i + 1, n_seeds)]))
    print(json.dumps({
        "metric": f"t2a_{sampler}{steps}_vs_ddim100_clap_score",
        "scorer": scorer_kind,
        "same_seed_score_delta": round(same, 5),
        "cross_seed_score_spread": round(cross, 5),
        "ratio": round(same / max(cross, 1e-9), 4),
        "winner_agreement": round(agree / max(total, 1), 4),
        "n_seeds": n_seeds, "n_prompts": len(prompts),
        "n_candidates": n_candidates,
    }))


def main(n_seeds: int = 3, sampler: str = "plms", steps: int = 25):
    jax.config.update("jax_compilation_cache_dir", "/tmp/audiogpt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from audiogpt_tpu.engines.t2a import T2AConfig, T2AEngine

    eng = T2AEngine(T2AConfig())
    # perturb every zero-init output layer so the eps-net responds to input
    leaves, treedef = jax.tree.flatten(eng.params)
    rngs = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [l + 0.02 * jax.random.normal(r, l.shape, l.dtype)
              if l.dtype == jnp.float32 else l
              for l, r in zip(leaves, rngs)]
    eng.params = jax.tree.unflatten(treedef, leaves)

    mels_d, mels_p = [], []
    for s in range(n_seeds):
        mels_d.append(np.asarray(
            eng.txt2audio("a dog barking", n_samples=1, ddim_steps=100,
                          seed=s, sampler="ddim")))
        mels_p.append(np.asarray(
            eng.txt2audio("a dog barking", n_samples=1, ddim_steps=steps,
                          seed=s, sampler=sampler)))
        print(f"seed {s} done", file=sys.stderr, flush=True)

    d_sampler = float(np.mean([np.abs(a - b).mean()
                               for a, b in zip(mels_d, mels_p)]))
    d_seed = float(np.mean([np.abs(mels_d[i] - mels_d[j]).mean()
                            for i in range(n_seeds)
                            for j in range(i + 1, n_seeds)]))
    print(json.dumps({
        "metric": f"t2a_{sampler}{steps}_vs_ddim100_mel_l1",
        "same_seed_gap": round(d_sampler, 5),
        "cross_seed_scale": round(d_seed, 5),
        "ratio": round(d_sampler / max(d_seed, 1e-9), 4),
        "n_seeds": n_seeds,
    }))


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("n_seeds", nargs="?", type=int, default=3)
    # default sampler/steps differ by mode: mel-L1 documents the PLMS-25
    # fast path, --clap documents the production DPM++12 row (BASELINE.md)
    p.add_argument("--sampler", default=None)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--clap", action="store_true",
                   help="CLAP-score equivalence (the reference's acceptance "
                        "metric) instead of mel L1")
    p.add_argument("--scorer", default=None, metavar="DIR",
                   help="trained tiny-CLAP dir from tools/train_tiny_clap.py"
                        " (otherwise random perturbed weights)")
    a = p.parse_args()
    if a.clap:
        clap_equivalence(a.n_seeds, a.sampler or "dpmpp", a.steps or 12,
                         scorer_dir=a.scorer)
    else:
        main(a.n_seeds, a.sampler or "plms", a.steps or 25)
