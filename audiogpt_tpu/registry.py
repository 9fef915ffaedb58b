"""Named registries for models / vocoders / engines / tools.

Generalizes the reference's vocoder registry pattern
(``NeuralSeq/vocoders/base_vocoder.py:5-19``) to every pluggable family in the
framework, replacing the LDM world's string-target reflection
(``instantiate_from_config``, ``audio-chatgpt.py:148-149``) with explicit
registration.
"""

from __future__ import annotations

from typing import Callable, Dict, Generic, Iterator, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):
    def __init__(self, kind: str):
        self.kind = kind
        self._items: Dict[str, T] = {}

    def register(self, name: str | None = None) -> Callable[[T], T]:
        def deco(obj: T) -> T:
            key = name or getattr(obj, "__name__", str(obj))
            key = key.lower()
            if key in self._items and self._items[key] is not obj:
                raise KeyError(f"{self.kind} '{key}' already registered")
            self._items[key] = obj
            return obj

        return deco

    def get(self, name: str) -> T:
        key = name.lower()
        if key not in self._items:
            raise KeyError(
                f"unknown {self.kind} '{name}'; have {sorted(self._items)}"
            )
        return self._items[key]

    def __contains__(self, name: str) -> bool:
        return name.lower() in self._items

    def __iter__(self) -> Iterator[str]:
        return iter(self._items)

    def names(self) -> list[str]:
        return sorted(self._items)


MODELS: Registry = Registry("model")
VOCODERS: Registry = Registry("vocoder")
ENGINES: Registry = Registry("engine")
TOOLS: Registry = Registry("tool")
TASKS: Registry = Registry("task")
TEXT_PROCESSORS: Registry = Registry("text_processor")
