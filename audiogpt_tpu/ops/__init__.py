"""Shared compute ops: attention (SDPA + Pallas flash), convs, RNNs."""

from audiogpt_tpu.ops.attention import KVCache, attention
from audiogpt_tpu.ops.flash_attention import flash_attention

__all__ = ["KVCache", "attention", "flash_attention"]
