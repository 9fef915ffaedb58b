"""Agent-loop tests with a scripted fake LLM (no network)."""

import numpy as np
import pytest

from audiogpt_tpu.agent import (
    AgentResult,
    ConversationAgent,
    ScriptedLLM,
    Tool,
    ToolRegistry,
)
from audiogpt_tpu.agent.agent import cut_dialogue_history
from audiogpt_tpu.agent.tools import merge_audio, new_media_path


def _tools(tmp_path):
    calls = []

    def t2a(text):
        calls.append(("t2a", text))
        return "audio/deadbeef.wav"

    def asr(path):
        calls.append(("asr", path))
        return "hello there"

    reg = ToolRegistry([
        Tool("Generate Audio From User Input Text",
             "Input: a text description. Output: generated audio file path.", t2a),
        Tool("Transcribe Speech", "Input: an audio path. Output: the text.", asr,
             media_kind="text"),
    ])
    return reg, calls


class TestReActLoop:
    def test_tool_call_then_answer(self, tmp_path):
        reg, calls = _tools(tmp_path)
        llm = ScriptedLLM([
            "Thought: Do I need to use a tool? Yes\n"
            "Action: Generate Audio From User Input Text\n"
            "Action Input: a dog barking",
            "Thought: Do I need to use a tool? No\n"
            "AI: Generated audio/deadbeef.wav for you.",
        ])
        agent = ConversationAgent(llm, reg)
        result = agent.run_text("make me a dog bark sound")
        assert calls == [("t2a", "a dog barking")]
        assert result.steps[0][0] == "Generate Audio From User Input Text"
        assert result.steps[0][2] == "audio/deadbeef.wav"
        assert result.last_file == "audio/deadbeef.wav"
        assert "audio/deadbeef.wav" in result.response
        # observation fed back into the next prompt
        assert "Observation: audio/deadbeef.wav" in llm.prompts[1]

    def test_direct_answer_no_tool(self, tmp_path):
        reg, calls = _tools(tmp_path)
        llm = ScriptedLLM([
            "Thought: Do I need to use a tool? No\nAI: Just chatting!",
        ])
        agent = ConversationAgent(llm, reg)
        result = agent.run_text("hi")
        assert result.response == "Just chatting!"
        assert calls == [] and result.steps == []
        assert "Human: hi" in agent.history

    def test_unknown_tool_treated_as_answer(self, tmp_path):
        reg, _ = _tools(tmp_path)
        llm = ScriptedLLM([
            "Thought: Do I need to use a tool? Yes\n"
            "Action: Nonexistent Tool\nAction Input: x",
        ])
        agent = ConversationAgent(llm, reg)
        result = agent.run_text("do something")
        assert result.steps == []  # fell through to final-answer path

    def test_tool_error_becomes_observation(self, tmp_path):
        def boom(_):
            raise RuntimeError("kaput")

        reg = ToolRegistry([Tool("Boom", "explodes", boom)])
        llm = ScriptedLLM([
            "Thought: Do I need to use a tool? Yes\nAction: Boom\nAction Input: x",
            "Thought: Do I need to use a tool? No\nAI: tool failed.",
        ])
        agent = ConversationAgent(llm, reg)
        result = agent.run_text("go")
        assert "Tool error: kaput" in result.steps[0][2]

    def test_step_limit(self, tmp_path):
        reg, _ = _tools(tmp_path)
        llm = ScriptedLLM([
            "Thought: Do I need to use a tool? Yes\n"
            "Action: Generate Audio From User Input Text\nAction Input: x"
        ] * 99)
        agent = ConversationAgent(llm, reg, max_steps=3)
        result = agent.run_text("loop forever")
        assert len(result.steps) == 3


class TestHistory:
    def test_truncation(self):
        hist = "\n".join(f"line {i} with some words here" for i in range(200))
        out = cut_dialogue_history(hist, keep_last_n_words=50)
        assert len(out.split()) <= 56
        assert out.split("\n")[-1] == "line 199 with some words here"

    def test_short_history_untouched(self):
        assert cut_dialogue_history("short", 500) == "short"


class TestSpeechLoop:
    def test_asr_agent_tts_merge(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from audiogpt_tpu.utils.audio_io import save_wav

        reg, _ = _tools(tmp_path)
        gen_path = new_media_path("audio")
        save_wav(np.zeros(1600, np.float32), gen_path, 16000)
        llm = ScriptedLLM([
            "Thought: Do I need to use a tool? Yes\n"
            "Action: Generate Audio From User Input Text\nAction Input: a bark",
            "Thought: Do I need to use a tool? No\nAI: Done, see audio.",
        ])
        # make the scripted tool return the real file
        reg.get("Generate Audio From User Input Text").fn = lambda t: gen_path

        agent = ConversationAgent(llm, reg)
        speech_path = new_media_path("audio")
        save_wav(np.ones(800, np.float32) * 0.1, speech_path, 16000)

        def fake_tts(text):
            return speech_path

        def fake_asr(path):
            return "make a bark"

        resp, out = agent.speech("in.wav", fake_asr, fake_tts, merge=merge_audio)
        assert resp == "Done, see audio."
        from audiogpt_tpu.utils.audio_io import load_wav

        wav, sr = load_wav(out)
        assert len(wav) == 800 + 1600  # merged speech + generated


class TestMediaPaths:
    def test_new_media_path_convention(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        p = new_media_path("audio")
        assert p.startswith("audio/") and p.endswith(".wav")
        assert len(p.split("/")[1].split(".")[0]) == 8
