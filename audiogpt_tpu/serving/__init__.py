"""Serving layer: HTTP API + single-page chat UI.

Replaces the reference's Gradio Blocks app (``audio-chatgpt.py:1376-1442``)
with a dependency-free stdlib server (SURVEY.md §7.9 'Gradio (or
equivalent) UI last').
"""

from audiogpt_tpu.serving.server import AppServer, make_server

__all__ = ["AppServer", "make_server"]
