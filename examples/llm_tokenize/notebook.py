"""Tutorial notebook source for llm_tokenize.ipynb."""

# %% [markdown]
# ## 1. A model with a tokenizer

# %%
from muninn_tpu.models.embed import load_embed_model
from muninn_tpu.models.registry import registry
from muninn_tpu.text import token_count, tokenize, tokenize_text

load_embed_model("tok-demo", dim=32)
m = registry.find("tok-demo")
type(m).__name__

# %% [markdown]
# ## 2. Token ids

# %%
ids = tokenize(m, "Hello tokenized world")
ids

# %% [markdown]
# ## 3. Token pieces

# %%
pieces = tokenize_text(m, "Hello tokenized world")
pieces

# %% [markdown]
# ## 4. Ids and pieces align, and are stable

# %%
assert len(ids) == len(pieces)
assert ids == tokenize(m, "Hello tokenized world")
True

# %% [markdown]
# ## 5. Counting a document

# %%
DOC = (
    "Tokenization splits text into model units. Counting tokens before "
    "sending a prompt keeps requests inside the context window."
)
n = token_count(m, DOC)
n

# %% [markdown]
# ## 6. Budget truncation
#
# Keep whole tokens up to a budget — the pattern for prompt packing.

# %%
budget = 12
kept = " ".join(tokenize_text(m, DOC)[:budget])
kept

# %% [markdown]
# ## 7. The truncated text re-tokenizes within budget

# %%
assert token_count(m, kept) <= budget + 1
True

# %% [markdown]
# ## 8. Summary

# %%
{"n_tokens": n, "ids": ids}
