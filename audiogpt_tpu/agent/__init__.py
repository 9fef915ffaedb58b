from audiogpt_tpu.agent.tools import Tool, ToolRegistry, new_media_path  # noqa: F401
from audiogpt_tpu.agent.llm import LLMClient, ScriptedLLM, OpenAICompatLLM  # noqa: F401
from audiogpt_tpu.agent.agent import ConversationAgent, AgentResult  # noqa: F401
