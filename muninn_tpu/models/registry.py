"""Unified model registry.

The reference keeps a static 16-slot registry of loaded GGUF models
typed EMBED/CHAT, addressed by name, with pointer-passing through a
``muninn_models`` virtual table (``src/llama_common.c:60-119``,
``src/llama_embed.c:209-240``). Here models are plain Python objects
registered by name; the VT pointer dance is unnecessary.
"""

from __future__ import annotations

import enum


class ModelType(enum.Enum):
    EMBED = "embed"
    CHAT = "chat"


class ModelRegistry:
    MAX_MODELS = 64  # reference caps at 16 (g_models[16])

    def __init__(self):
        self._models: dict[str, object] = {}

    def add(self, name: str, model) -> None:
        if name in self._models:
            raise ValueError(f"model {name!r} already registered")
        if len(self._models) >= self.MAX_MODELS:
            raise RuntimeError("model registry full")
        self._models[name] = model

    def find(self, name: str):
        m = self._models.get(name)
        if m is None:
            raise KeyError(f"no model named {name!r}")
        return m

    def find_type(self, name: str, type_: ModelType):
        m = self.find(name)
        if m.model_type is not type_:
            raise TypeError(
                f"model {name!r} is {m.model_type.value}, expected {type_.value}"
            )
        return m

    def remove(self, name: str) -> None:
        self._models.pop(name, None)

    def names(self, type_: ModelType | None = None) -> list[str]:
        """The ``muninn_models`` / ``muninn_chat_models`` VT listing."""
        return [
            n for n, m in self._models.items()
            if type_ is None or m.model_type is type_
        ]


registry = ModelRegistry()
