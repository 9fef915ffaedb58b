"""Golden prompt → artifact acceptance tests.

The reference's QA is a manual checklist of prompt/artifact pairs
(``assets/README.md`` — SURVEY.md §4.3). This automates it: each prompt runs
through the agent with a scripted LLM choosing the right tool (the LLM's
choice isn't under test — the tool chain is), and the produced artifact is
checked for type/shape/sample-rate. Engines are tiny random-weight configs —
the contract under test is the end-to-end plumbing, not audio quality.
"""

import os

import numpy as np
import pytest

from audiogpt_tpu.agent.agent import ConversationAgent
from audiogpt_tpu.agent.llm import ScriptedLLM
from audiogpt_tpu.agent.toolset import build_toolset
from audiogpt_tpu.utils.audio_io import load_wav, save_wav


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """Tiny engines + media root + sample input audio."""
    from audiogpt_tpu.engines.svs import SVSEngine
    from audiogpt_tpu.engines.transform import SeparationEngine
    from audiogpt_tpu.engines.tts import TTSEngine
    from audiogpt_tpu.engines.vocoder import VocoderEngine
    from audiogpt_tpu.models.separation.convtasnet import ConvTasNetConfig
    from audiogpt_tpu.models.svs.diffsinger import DiffNetConfig, DiffSingerConfig
    from audiogpt_tpu.models.tts.fastspeech2 import FastSpeech2Config
    from audiogpt_tpu.models.vocoder.hifigan import HifiGANConfig

    root = str(tmp_path_factory.mktemp("golden"))
    voc_cfg = HifiGANConfig(in_channels=20, upsample_rates=(4, 4),
                            upsample_kernel_sizes=(8, 8),
                            upsample_initial_channel=16,
                            resblock_kernel_sizes=(3,),
                            resblock_dilation_sizes=((1, 3),),
                            sample_rate=22050)
    vocoder = VocoderEngine("hifigan", cfg=voc_cfg, buckets=(64, 256))
    fs2 = FastSpeech2Config(vocab_size=90, hidden_size=16, enc_layers=1,
                            dec_layers=1, num_heads=2, enc_ffn_kernel_size=3,
                            dec_ffn_kernel_size=3, n_mels=20,
                            dur_predictor_layers=1, predictor_layers=1,
                            predictor_hidden=8, max_frames=256)
    svs_cfg = DiffSingerConfig(
        fs2=FastSpeech2Config(vocab_size=90, hidden_size=16, enc_layers=1,
                              dec_layers=1, num_heads=2,
                              enc_ffn_kernel_size=3, dec_ffn_kernel_size=3,
                              n_mels=20, dur_predictor_layers=1,
                              predictor_layers=1, predictor_hidden=8,
                              max_frames=256, use_midi=True, rel_pos=True,
                              use_pitch_embed=False),
        net=DiffNetConfig(mel_bins=20, residual_layers=2,
                          residual_channels=8, encoder_hidden=16),
        timesteps=20, K_step=20, spec_min=(-6.0,) * 20, spec_max=(1.5,) * 20)
    engines = {
        "tts": TTSEngine(fs2, vocoder=vocoder),
        "svs": SVSEngine(svs_cfg, vocoder=vocoder, pndm_speedup=5),
        "enhance": SeparationEngine(ConvTasNetConfig(
            n_src=1, enc_dim=32, bottleneck=8, hidden=16, skip=8,
            n_blocks=2, n_repeats=1)),
    }
    src = os.path.join(root, "upload.wav")
    sr = 16000
    t = np.arange(sr) / sr
    save_wav((0.2 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), src, sr)
    return root, engines, src


def _run(world, tool_name, tool_input, final="Done."):
    root, engines, _ = world
    reg = build_toolset(engines, root=root, mode="text")
    llm = ScriptedLLM([
        f"Thought: Do I need to use a tool? Yes\nAction: {tool_name}\n"
        f"Action Input: {tool_input}",
        f"Thought: Do I need to use a tool? No\nAI: {final}",
    ])
    agent = ConversationAgent(llm, reg)
    return agent.run_text(tool_input)


class TestGoldenPrompts:
    def test_tts_here_we_go(self, world):
        """assets/README.md: Generate a speech with text 'here we go'."""
        root, _, _ = world
        res = _run(world, "Synthesize Speech Given the User Input Text",
                   "here we go")
        path = res.steps[0][2]
        wav, sr = load_wav(os.path.join(root, path))
        assert sr == 22050 and len(wav) > 256
        assert np.isfinite(wav).all()

    def test_t2s_xiao_jiu_wo(self, world):
        """assets/README.md Text-To-Sing score (prefix; pinyin form)."""
        root, _, _ = world
        score = ("xiao jiu wo, C#4/Db4 | F#4/Gb4 | G#4/Ab4, "
                 "0.4071 | 0.3761 | 0.2421")
        res = _run(world,
                   "Generate Singing Voice From User Input Text, Note and "
                   "Duration Sequence", score)
        path = res.steps[0][2]
        wav, sr = load_wav(os.path.join(root, path))
        assert sr == 22050 and len(wav) > 0

    def test_enhance_uploaded(self, world):
        root, _, src = world
        res = _run(world, "Speech Enhancement In Single-Channel", src)
        wav, sr = load_wav(os.path.join(root, res.steps[0][2]))
        assert sr == 16000 and len(wav) == 16000

    def test_upload_then_reference_by_memory(self, world):
        """run_image_or_audio parity: uploads inject Human/AI turns so later
        prompts can reference the file (audio-chatgpt.py:1261-1264)."""
        root, engines, src = world
        reg = build_toolset(engines, root=root, mode="text")
        llm = ScriptedLLM([
            "Thought: Do I need to use a tool? Yes\n"
            f"Action: Speech Enhancement In Single-Channel\nAction Input: {src}",
            "Thought: Do I need to use a tool? No\nAI: Cleaned it up.",
        ])
        agent = ConversationAgent(llm, reg)
        agent.ingest_audio(src, describe=lambda p: "a sine tone")
        assert "a sine tone" in agent.history
        res = agent.run_text("clean up the audio I just uploaded")
        assert res.steps and res.response == "Cleaned it up."
