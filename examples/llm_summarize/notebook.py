"""Tutorial notebook source for llm_summarize.ipynb."""

# %% [markdown]
# ## 1. Load a writer model

# %%
from muninn_tpu import Graph
from muninn_tpu.models.chat import load_chat_model
from muninn_tpu.text import label_groups, summarize

load_chat_model("writer")

DOCS = [
    "Hierarchical Navigable Small World graphs build a layered proximity "
    "graph where upper layers provide long-range shortcuts and the bottom "
    "layer holds every point, giving logarithmic search complexity.",
    "Compressed sparse row storage keeps a graph's edges in two flat "
    "arrays, offsets per node and concatenated neighbor lists, which is "
    "the layout every vectorized graph kernel in this engine consumes.",
]
len(DOCS)

# %% [markdown]
# ## 2. Summarize each document

# %%
summaries = [summarize("writer", d, max_words=12) for d in DOCS]
for s in summaries:
    print(s[:90])

# %% [markdown]
# ## 3. A follow graph to label

# %%
FOLLOWS = [
    ("alice", "bob"), ("bob", "carol"), ("carol", "alice"),
    ("Dataworks Dana", "alice"),
    ("gil", "hana"), ("hana", "ivan"), ("ivan", "gil"),
]
g = Graph.from_edges(*zip(*FOLLOWS))
g.num_nodes

# %% [markdown]
# ## 4. Find the communities

# %%
labels, q = g.leiden(seed=0)
groups: dict = {}
for node, comm in labels.items():
    groups.setdefault(comm, []).append(node)
sorted(sorted(m) for m in groups.values())

# %% [markdown]
# ## 5. Label them
#
# `label_groups` is the reference's `muninn_label_groups` TVF: one
# short name per group of members.

# %%
rows = label_groups("writer", groups, min_group_size=2)
for gid, label, n in rows:
    print(f"community {gid}: {label!r} ({n} members)")

# %% [markdown]
# ## 6. Group-size filtering

# %%
big_only = label_groups("writer", groups, min_group_size=4)
len(rows), len(big_only)

# %% [markdown]
# ## 7. Verify

# %%
assert rows, "expected at least one labeled group"
True

# %% [markdown]
# ## 8. Summary

# %%
{"n_groups": len(rows), "n_summaries": len(summaries)}
