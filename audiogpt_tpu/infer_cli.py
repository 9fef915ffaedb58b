"""One-shot inference CLI — the reference's per-model ``__main__`` demos
(``NeuralSeq/inference/svs/ds_e2e.py:50``, ``inference/tts/*.py``) as one
entry point over the engine registry:

    python -m audiogpt_tpu.infer_cli --engine tts --text "here we go" \\
        --out out.wav
    python -m audiogpt_tpu.infer_cli --engine svs \\
        --text "xiao jiu wo" --notes "C#4/Db4 | F#4/Gb4 | G#4/Ab4" \\
        --notes_duration "0.4 | 0.37 | 0.24" --out sing.wav
    python -m audiogpt_tpu.infer_cli --engine t2a --text "a dog barks" \\
        --params ckpt/t2a --out dog.wav
    python -m audiogpt_tpu.infer_cli --engine asr --in speech.wav
    python -m audiogpt_tpu.infer_cli --engine enhance --in noisy.wav --out c.wav

``--params`` loads an orbax checkpoint directory produced by
``import_ckpt`` / the trainer. Engines come from the lazy app factories, so
only the requested one is built.
"""

from __future__ import annotations

import argparse
import sys


def _load_params(path: str):
    # same loader as app.py --ckpt (ADVICE r1: a target-less raw orbax
    # restore can yield a differently-typed tree for save_params output)
    from audiogpt_tpu.import_ckpt import restore_params

    return restore_params(path)


def main(argv=None):
    from audiogpt_tpu.app import ALL_ENGINES, build_engines
    from audiogpt_tpu.utils.audio_io import load_wav, save_wav

    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", required=True,
                    help=f"one of {', '.join(ALL_ENGINES)}")
    ap.add_argument("--text", default=None)
    ap.add_argument("--notes", default=None)
    ap.add_argument("--notes_duration", default=None)
    ap.add_argument("--in", dest="in_path", default=None, help="input wav")
    ap.add_argument("--out", default="out.wav")
    ap.add_argument("--params", default=None,
                    help="orbax checkpoint dir (import_ckpt / trainer output)")
    args = ap.parse_args(argv)

    eng = build_engines([args.engine])[args.engine]
    if args.params:
        eng.params = _load_params(args.params)

    name = args.engine
    if name in ("svs", "visinger"):
        wav = eng.synthesize(args.text, args.notes, args.notes_duration)
        save_wav(wav, args.out, eng.sample_rate)
    elif name in ("tts", "tts_portaspeech", "syntaspeech", "tts_ood"):
        wav = eng(args.text)
        save_wav(wav, args.out, eng.sample_rate)
    elif name == "t2a":
        res = eng.txt2audio(args.text, n_samples=1, ddim_steps=25,
                            sampler="plms")
        mels = res[0] if isinstance(res, tuple) else res
        if isinstance(res, tuple):
            save_wav(res[1][0], args.out, eng.cfg.sample_rate)
        else:
            import numpy as np

            np.save(args.out.replace(".wav", ".npy"), mels[0])
            print(f"| no vocoder attached; wrote mel to "
                  f"{args.out.replace('.wav', '.npy')}")
    elif name in ("asr", "caption"):
        wav, sr = load_wav(args.in_path)
        target = 16000 if name == "asr" else 32000
        if sr != target:
            import jax.numpy as jnp

            from audiogpt_tpu.dsp.resample import resample

            import numpy as np

            wav = np.asarray(resample(jnp.asarray(wav), sr, target))
        print(eng.transcribe(wav) if name == "asr" else eng.caption(wav))
        return 0
    elif name in ("enhance", "separate"):
        wav, sr = load_wav(args.in_path)
        import numpy as np

        out = np.atleast_2d(eng.separate(wav))
        for i, stem in enumerate(out):
            path = args.out if out.shape[0] == 1 else \
                args.out.replace(".wav", f"_{i}.wav")
            save_wav(stem, path, sr)
            print(f"| wrote {path}")
        return 0
    else:
        print(f"engine {name!r} has no CLI mapping yet; use the python API",
              file=sys.stderr)
        return 2
    print(f"| wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
