"""Tutorial notebook source (jupytext percent format) — rendered and
EXECUTED by examples/make_notebooks.py into semantic_search.ipynb."""

# %% [markdown]
# ## 1. Setup
#
# Everything runs on the deterministic hash embedding backend (no
# model files); pass `path=` to `load_embed_model` for a real encoder.

# %%
import numpy as np

from muninn_tpu.index.flat import FlatIndex
from muninn_tpu.index.hnsw import HnswIndex
from muninn_tpu.io.checkpoint import load_flat, save_flat
from muninn_tpu.models.embed import embed, load_embed_model

load_embed_model("demo", dim=64)

# %% [markdown]
# ## 2. A corpus and some queries
#
# Six topics, two phrasings each — semantic search should match the
# *meaning*, not the exact words.

# %%
DOCS = [
    "The cat sat on the mat",
    "A feline rested on the rug",
    "Stock markets rallied on Friday",
    "Equities surged at the end of the week",
    "How to bake sourdough bread",
    "A beginner's guide to fermenting dough",
    "NASA launched a probe toward Europa",
    "The spacecraft will study Jupiter's icy moon",
    "Best hiking trails in the Alps",
    "Mountain routes for summer trekking",
    "Python decorators explained simply",
    "Understanding closures and wrappers in Python",
]
QUERIES = [
    "kitty lying on a carpet",
    "share prices went up",
    "making bread at home",
    "mission to an icy moon",
]
len(DOCS), len(QUERIES)

# %% [markdown]
# ## 3. Embed and build the exact index
#
# `FlatIndex` is exact (recall 1.0) and the fastest engine on TPU up
# to ~1M vectors. Embeddings are L2-normalized, so `cosine` distances
# are `1 − cos`.

# %%
vecs = embed("demo", DOCS)
flat = FlatIndex(64, "cosine")
flat.insert(np.arange(len(DOCS)), vecs)
len(flat)

# %% [markdown]
# ## 4. Query
#
# One batched `search` call — the engine's whole design is the batch
# axis.

# %%
qvecs = embed("demo", QUERIES)
exact_ids, exact_d = flat.search(qvecs, k=3)
for q, row in zip(QUERIES, np.asarray(exact_ids)):
    print(f"{q!r:38} -> {DOCS[row[0]]!r}")

# %% [markdown]
# ## 5. The approximate engine, same API
#
# `HnswIndex` trades a little recall for incremental-churn support and
# huge-N scaling. Measure its recall against the exact engine:

# %%
hnsw = HnswIndex(64, "cosine", m=8, ef_construction=64)
hnsw.insert(np.arange(len(DOCS)), vecs)
hnsw_ids, _ = hnsw.search(qvecs, k=3, ef_search=32)
hits = sum(
    len(set(map(int, a)) & set(map(int, b))) / 3
    for a, b in zip(np.asarray(hnsw_ids), np.asarray(exact_ids))
)
recall = hits / len(QUERIES)
print(f"recall@3 of hnsw vs exact: {recall:.2f}")

# %% [markdown]
# ## 6. Mutation
#
# Deletes are soft: results never contain deleted ids.

# %%
top0 = int(np.asarray(exact_ids)[0, 0])
flat.delete([top0])
ids2, _ = flat.search(qvecs[:1], k=1)
print("after deleting the top hit, new top:",
      DOCS[int(np.asarray(ids2)[0, 0])])

# %% [markdown]
# ## 7. Persistence round-trip
#
# Checkpoints are plain directories (npz + manifest); a reloaded index
# returns identical results.

# %%
import tempfile

with tempfile.TemporaryDirectory() as td:
    save_flat(flat, td)
    flat2 = load_flat(td)
    ids3, _ = flat2.search(qvecs[:1], k=1)
same = int(np.asarray(ids3)[0, 0]) == int(np.asarray(ids2)[0, 0])
print("reloaded index agrees:", same)

# %% [markdown]
# ## 8. Inspect the index state

# %%
{"rows": len(flat2), "dim": flat2.dim, "recall_hnsw_vs_exact": recall,
 "reload_ok": same}
