"""Provider-agnostic LLM client for the agent loop.

The reference hard-wires ``langchain.llms.OpenAI`` (``audio-chatgpt.py:1052``).
Here the agent takes any ``LLMClient``; :class:`ScriptedLLM` provides the
fake backend the test pyramid needs (SURVEY.md §4 implication (e)), and
:class:`OpenAICompatLLM` speaks the /v1/completions wire format to any
compatible endpoint when network + key are available.
"""

from __future__ import annotations

import json
from typing import Iterable, Protocol


class LLMClient(Protocol):
    def complete(self, prompt: str, stop: list[str] | None = None) -> str: ...


class ScriptedLLM:
    """Replays a fixed list of completions (and records the prompts)."""

    def __init__(self, responses: Iterable[str]):
        self._responses = list(responses)
        self._i = 0
        self.prompts: list[str] = []

    def complete(self, prompt: str, stop: list[str] | None = None) -> str:
        self.prompts.append(prompt)
        if self._i >= len(self._responses):
            return "Thought: Do I need to use a tool? No\nAI: I'm done."
        out = self._responses[self._i]
        self._i += 1
        if stop:
            for s in stop:
                idx = out.find(s)
                if idx >= 0:
                    out = out[:idx]
        return out


class OpenAICompatLLM:
    """Minimal /v1/chat/completions client (urllib; no SDK dependency)."""

    def __init__(self, base_url: str, api_key: str = "", model: str = "gpt-3.5-turbo",
                 temperature: float = 0.0, timeout: float = 60.0):
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.model = model
        self.temperature = temperature
        self.timeout = timeout

    def complete(self, prompt: str, stop: list[str] | None = None) -> str:
        import urllib.request

        body = json.dumps({
            "model": self.model,
            "messages": [{"role": "user", "content": prompt}],
            "temperature": self.temperature,
            "stop": stop or None,
        }).encode()
        req = urllib.request.Request(
            f"{self.base_url}/v1/chat/completions",
            data=body,
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.api_key}",
            },
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            data = json.loads(resp.read())
        return data["choices"][0]["message"]["content"]
