"""Tutorial notebook source for llm_chat.ipynb."""

# %% [markdown]
# ## 1. Load a chat model
#
# The echo backend is deterministic; `path=` loads a real Flax causal
# LM with token-level grammar enforcement on the device.

# %%
import json

from muninn_tpu.models.chat import chat, load_chat_model, strip_think_block
from muninn_tpu.text.grammar import GRAMMAR_NER

model = load_chat_model("assistant")
type(model).__name__

# %% [markdown]
# ## 2. Plain generation

# %%
out = chat("assistant", "Name three graph algorithms.")
out[:80]

# %% [markdown]
# ## 3. System prompts and token budgets

# %%
out = chat("assistant", "Summarize HNSW in one line.",
           system_prompt="You are a terse systems engineer.",
           max_tokens=64)
out[:80]

# %% [markdown]
# ## 4. Think-block stripping
#
# Reasoning models wrap chain-of-thought in `<think>` blocks; the
# helper strips them (truncated blocks strip to empty, like the
# reference).

# %%
raw = "<think>chain of thought...</think>The answer is 42."
strip_think_block(raw)

# %% [markdown]
# ## 5. Grammar-constrained JSON
#
# The output is guaranteed parseable and shaped like the grammar.

# %%
out = chat("assistant", "Ada Lovelace met Charles Babbage in London.",
           system_prompt="Extract the entities as JSON.",
           grammar=GRAMMAR_NER)
obj = json.loads(out)
assert "entities" in obj or isinstance(obj, list)
obj

# %% [markdown]
# ## 6. Batched generation
#
# One decode pass advances every prompt together — the TPU batch axis
# replacing the reference's ≤8-sequence packing.

# %%
prompts = [f"Define term {t}" for t in ("HNSW", "CSR", "SGNS", "MXU")]
outs = model.generate_batch(prompts, max_tokens=32)
for p, o in zip(prompts, outs):
    print(f"{p!r} -> {o[:50]!r}")

# %% [markdown]
# ## 7. Determinism
#
# Greedy decode: identical prompts produce identical outputs.

# %%
assert outs == model.generate_batch(prompts, max_tokens=32)
True

# %% [markdown]
# ## 8. Summary

# %%
{"json": obj, "batch_n": len(outs)}
