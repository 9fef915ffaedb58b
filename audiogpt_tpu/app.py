"""Application assembly: build the engine set and launch the chat app.

The reference's ``ConversationBot.__init__`` eagerly loads all 14 models and
pins them to cuda:0/cuda:1/cpu by hand (``audio-chatgpt.py:1055-1072``).
Here engines are constructed per requested capability (SPMD placement is
JAX's job), with checkpoint restore when a store path is supplied and random
init otherwise (smoke/demo mode).

CLI:  python -m audiogpt_tpu.serve --engines tts,enhance --port 7860
"""

from __future__ import annotations

import argparse
from typing import Any, Callable, Mapping

#: capability name → zero-arg factory. Lazy so `--engines tts` doesn't build
#: the diffusion stack. Extend via register_engine().
_FACTORIES: dict[str, Callable[[], Any]] = {}


def register_engine(name: str):
    def deco(fn):
        _FACTORIES[name] = fn
        return fn

    return deco


@register_engine("tts")
def _tts():
    from audiogpt_tpu.engines.tts import TTSEngine

    return TTSEngine()


@register_engine("tts_portaspeech")
def _tts_portaspeech():
    # PortaSpeech rebuild (the reference's intended TTS backbone, whose
    # module is missing upstream); `tts` stays the FS2 default.
    from audiogpt_tpu.engines.tts import PortaSpeechTTSEngine

    return PortaSpeechTTSEngine()


@register_engine("syntaspeech")
def _syntaspeech():
    from audiogpt_tpu.engines.tts import PortaSpeechTTSEngine
    from audiogpt_tpu.models.tts import PortaSpeechConfig

    return PortaSpeechTTSEngine(cfg=PortaSpeechConfig(use_graph=True))


@register_engine("tts_ood")
def _tts_ood():
    from audiogpt_tpu.engines.tts_ood import StyleTransferEngine

    return StyleTransferEngine()


@register_engine("svs")
def _svs():
    from audiogpt_tpu.engines.svs import SVSEngine
    from audiogpt_tpu.engines.vocoder import VocoderEngine

    return SVSEngine(vocoder=VocoderEngine("hifigan"))


@register_engine("visinger")
def _visinger():
    from audiogpt_tpu.engines.svs import VISingerEngine

    return VISingerEngine()


@register_engine("asr")
def _asr():
    from audiogpt_tpu.engines.asr import ASREngine

    return ASREngine()


@register_engine("t2a")
def _t2a():
    from audiogpt_tpu.engines.t2a import T2AEngine
    from audiogpt_tpu.engines.vocoder import VocoderEngine
    from audiogpt_tpu.models.textenc.clap import CLAPScorer

    # buckets = the two diffusion canvases (10 s gen + inpaint) so the
    # fused sampler+VAE+vocoder program engages (t2a._sample_vocode_fn)
    return T2AEngine(vocoder=VocoderEngine("bigvgan", buckets=(624, 848)),
                     scorer=CLAPScorer(sample_rate=16000))


@register_engine("i2a")
def _i2a():
    from audiogpt_tpu.engines.i2a import I2AEngine

    return I2AEngine(_FACTORIES["t2a"]())


@register_engine("t2i")
def _t2i():
    from audiogpt_tpu.engines.t2i import T2IEngine

    return T2IEngine()


@register_engine("caption")
def _caption():
    from audiogpt_tpu.engines.analysis import CaptionEngine

    return CaptionEngine()


@register_engine("i2t")
def _i2t():
    from audiogpt_tpu.engines.analysis import ImageCaptionEngine

    return ImageCaptionEngine()


@register_engine("sed")
def _sed():
    from audiogpt_tpu.engines.analysis import SEDEngine

    return SEDEngine()


@register_engine("tsd")
def _tsd():
    from audiogpt_tpu.engines.analysis import TSDEngine

    return TSDEngine()


@register_engine("extraction")
def _extraction():
    from audiogpt_tpu.engines.transform import ExtractionEngine

    return ExtractionEngine()


@register_engine("enhance")
def _enhance():
    from audiogpt_tpu.engines.transform import SeparationEngine
    from audiogpt_tpu.models.separation.convtasnet import ConvTasNetConfig

    return SeparationEngine(ConvTasNetConfig(n_src=1))


@register_engine("separate")
def _separate():
    from audiogpt_tpu.engines.transform import SeparationEngine
    from audiogpt_tpu.models.separation.convtasnet import ConvTasNetConfig

    return SeparationEngine(ConvTasNetConfig(n_src=2))


@register_engine("binaural")
def _binaural():
    from audiogpt_tpu.engines.transform import BinauralEngine

    return BinauralEngine()


@register_engine("geneface")
def _geneface():
    from audiogpt_tpu.engines.face import GeneFaceEngine

    return GeneFaceEngine()


ALL_ENGINES = tuple(sorted(_FACTORIES))


def build_engines(names: Mapping[str, Any] | list[str] | str = "all"
                  ) -> dict[str, Any]:
    """Build engines by capability name. ``names`` may be 'all', a list, or a
    mapping name→already-constructed engine (passed through)."""
    if isinstance(names, str):
        names = list(ALL_ENGINES) if names == "all" else \
            [n.strip() for n in names.split(",") if n.strip()]
    if isinstance(names, Mapping):
        return dict(names)
    out: dict[str, Any] = {}
    for n in names:
        if n not in _FACTORIES:
            raise KeyError(f"unknown engine {n!r}; have {ALL_ENGINES}")
        out[n] = _FACTORIES[n]()
    return out


def load_engine_ckpts(engines: Mapping[str, Any], specs: list[str]) -> None:
    """Apply ``ENGINE=ORBAX_DIR`` checkpoint specs (import_ckpt / trainer
    output) to constructed engines. The special name ``t2i_refiner`` builds
    the MagicPrompt GPT-2 prompt refiner (``audio-chatgpt.py:112-125``) from
    a ``gpt2``-family params dir whose vocab files sit alongside it."""
    for spec in specs:
        name, _, path = spec.partition("=")
        from audiogpt_tpu.import_ckpt import restore_params

        if name == "t2i_refiner":
            if "t2i" not in engines:
                raise SystemExit(f"--ckpt {spec}: t2i engine not enabled")
            from audiogpt_tpu.models.textenc.gpt2 import MagicPromptRefiner
            from audiogpt_tpu.text.bpe import load_bpe_dir

            engines["t2i"].text_refiner = MagicPromptRefiner(
                params=restore_params(path), codec=load_bpe_dir(path))
            print(f"| loaded t2i prompt refiner from {path}", flush=True)
            continue
        if name not in engines:
            raise SystemExit(f"--ckpt {spec}: engine {name!r} not enabled")
        engines[name].params = restore_params(path)
        print(f"| loaded {name} params from {path}", flush=True)


def load_engine_vocabs(engines: Mapping[str, Any], specs: list[str]) -> None:
    """Apply ``ENGINE=VOCAB_PATH`` specs. Dispatch by artifact type:
    ``set_vocab`` when the engine has one (asr → whisper BPE dir/file),
    else ``.txt`` → BERT WordPiece vocab (CLAP/BLIP/LASSNet towers),
    ``.gz`` → CLIP merges data, anything else → GPT-2-family BPE dir."""
    for spec in specs:
        name, _, path = spec.partition("=")
        if name not in engines:
            raise SystemExit(f"--vocab {spec}: engine {name!r} not enabled")
        eng = engines[name]
        if hasattr(eng, "set_vocab"):
            eng.set_vocab(path)
        elif hasattr(eng, "tokenizer"):
            if path.endswith(".txt"):
                from audiogpt_tpu.models.textenc.clap import WordPieceTokenizer

                eng.tokenizer = WordPieceTokenizer(path)
            elif path.endswith(".gz"):
                from audiogpt_tpu.text.bpe import ClipTokenizer

                eng.tokenizer = ClipTokenizer(path)
            else:
                from audiogpt_tpu.text.bpe import load_bpe_dir

                eng.tokenizer = load_bpe_dir(path)
        else:
            raise SystemExit(f"--vocab {spec}: engine {name!r} takes no vocab")
        # propagate into an attached CLAP scorer (t2a best-of-n ranking —
        # the reference's acceptance metric, audio-chatgpt.py:185-199 —
        # tokenizes through scorer.tokenizer, not the engine's)
        scorer = getattr(eng, "scorer", None)
        if (scorer is not None and hasattr(scorer, "tokenizer")
                and hasattr(eng, "tokenizer")):
            scorer.tokenizer = eng.tokenizer
        print(f"| loaded {name} vocab from {path}", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--engines", default="enhance",
                    help=f"comma list or 'all' of {ALL_ENGINES}")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--media-root", default=".")
    ap.add_argument("--llm-base-url", default=None,
                    help="OpenAI-compatible endpoint; scripted echo otherwise")
    ap.add_argument("--llm-model", default="gpt-3.5-turbo")
    ap.add_argument("--llm-api-key", default=None)
    ap.add_argument("--warmup", action="store_true",
                    help="AOT-compile engine buckets before accepting traffic")
    ap.add_argument("--compile-cache", default=None, metavar="DIR",
                    help="persistent XLA compilation cache (large models "
                         "compile in minutes cold; cached startups are "
                         "seconds)")
    ap.add_argument("--microbatch", type=float, default=None, metavar="MS",
                    help="enable cross-request micro-batching for the tts "
                         "and asr engines with the given linger window in "
                         "ms. Coalescing happens when multiple sessions "
                         "(AppServers) share engine objects — within ONE "
                         "chat conversation the agent turn is serialized, "
                         "so requests reach the batcher one at a time and "
                         "the flag only adds the linger window")
    ap.add_argument("--ckpt", action="append", default=[],
                    metavar="ENGINE=DIR",
                    help="load an orbax params dir (import_ckpt / trainer "
                         "output) into an engine, e.g. --ckpt tts=ckpt/fs2 "
                         "(repeatable)")
    ap.add_argument("--asr-fast", action="store_true",
                    help="single-pass ASR decode (temperatures=(0.0,)): "
                         "skips whisper's temperature-fallback ladder. Use "
                         "for demos on random/untrained weights, where "
                         "every decode fails the trained-model logprob bar "
                         "by construction and the default ladder pays all "
                         "6 rungs per speech turn")
    ap.add_argument("--vocab", action="append", default=[],
                    metavar="ENGINE=PATH",
                    help="wire a tokenizer vocab into an engine: whisper "
                         "BPE dir/tiktoken file for asr, BERT vocab.txt "
                         "for t2a/tsd/extraction/i2t towers, CLIP merges "
                         ".gz for t2i (t2i already bundles one) "
                         "(repeatable)")
    args = ap.parse_args(argv)

    if args.compile_cache:
        import jax

        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from audiogpt_tpu.serving import AppServer, make_server

    if args.llm_base_url:
        from audiogpt_tpu.agent.llm import OpenAICompatLLM

        llm = OpenAICompatLLM(base_url=args.llm_base_url,
                              model=args.llm_model,
                              api_key=args.llm_api_key or "")
    else:
        from audiogpt_tpu.agent.llm import ScriptedLLM

        llm = ScriptedLLM([])  # echo/demo mode: always answers directly
    engines = build_engines(args.engines)
    if args.asr_fast and "asr" in engines:
        engines["asr"].temperatures = (0.0,)
    load_engine_ckpts(engines, args.ckpt)
    load_engine_vocabs(engines, args.vocab)
    if args.microbatch is not None:
        from audiogpt_tpu.serving.batcher import BatchedASR, BatchedTTS

        if "tts" in engines:
            engines["tts"] = BatchedTTS(engines["tts"],
                                        window_ms=args.microbatch)
        if "asr" in engines:
            engines["asr"] = BatchedASR(engines["asr"],
                                        window_ms=args.microbatch)
    asr_fn = tts_fn = None
    if "asr" in engines:
        from audiogpt_tpu.utils.audio_io import load_wav

        def asr_fn(path):
            wav, _ = load_wav(path, sr=16000)
            return engines["asr"].transcribe(wav)
    if "tts" in engines:
        from audiogpt_tpu.agent.tools import new_media_path
        from audiogpt_tpu.utils.audio_io import save_wav

        def tts_fn(text):
            out = new_media_path("audio", root=args.media_root)
            save_wav(engines["tts"](text), out, engines["tts"].sample_rate)
            return out
    if args.warmup:
        for name, eng in engines.items():
            if hasattr(eng, "warmup"):
                print(f"| warmup: {name}", flush=True)
                eng.warmup()
    app = AppServer(llm, engines, media_root=args.media_root,
                    asr=asr_fn, tts=tts_fn)
    httpd = make_server(app, args.host, args.port)
    print(f"| serving {sorted(app.engines)} on http://{args.host}:{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
