"""Tutorial notebook source for text_embeddings.ipynb."""

# %% [markdown]
# ## 1. Load an embedding model
#
# The hash backend is deterministic and file-free; `path=` loads a
# real Flax encoder with the same API.

# %%
import numpy as np

from muninn_tpu import Graph
from muninn_tpu.index.flat import FlatIndex
from muninn_tpu.models.embed import embed, load_embed_model, model_dim
from muninn_tpu.models.registry import registry

load_embed_model("enc", dim=64)
model_dim("enc")

# %% [markdown]
# ## 2. Tokenize
#
# The tokenizer surface works on any registered model.

# %%
from muninn_tpu.text import token_count, tokenize_text

TEXTS = [
    "The weather is sunny today",
    "Clear skies and sunshine expected",
    "The bank raised interest rates",
    "Central banks tightened policy",
    "Pasta needs salted boiling water",
    "Boil noodles in well-salted water",
]
TOPIC = ["weather", "weather", "finance", "finance", "cooking", "cooking"]
m = registry.find("enc")
print("tokens:", tokenize_text(m, TEXTS[0]))
print("token_count:", token_count(m, TEXTS[0]))

# %% [markdown]
# ## 3. Embed
#
# L2-normalized float32 — cosine similarity is a dot product.

# %%
vecs = embed("enc", TEXTS)
vecs.shape, np.round(np.linalg.norm(vecs, axis=1), 3)

# %% [markdown]
# ## 4. Inspect the similarity structure

# %%
sims = vecs @ vecs.T
for i, row in enumerate(sims):
    print(" ".join(f"{v:5.2f}" for v in row), "|", TEXTS[i][:30])

# %% [markdown]
# ## 5. Build a kNN graph in embedding space

# %%
idx = FlatIndex(64, "cosine")
idx.insert(np.arange(len(TEXTS)), vecs)
ids, dists = idx.search(vecs, k=3)
src, dst, w = [], [], []
for i, (row, drow) in enumerate(zip(np.asarray(ids), np.asarray(dists))):
    for j, d in zip(row, drow):
        if int(j) != i:
            src.append(i), dst.append(int(j)), w.append(1.0 - float(d))
len(src)

# %% [markdown]
# ## 6. Cluster with Leiden

# %%
g = Graph.from_edges(src, dst, w)
labels, q = g.leiden(seed=0)
clusters: dict = {}
for n, c in labels.items():
    clusters.setdefault(c, []).append(TOPIC[int(n)])
sorted(tuple(sorted(mm)) for mm in clusters.values())

# %% [markdown]
# ## 7. Check against the known topics

# %%
pure = all(len(set(members)) == 1 for members in clusters.values())
print(f"Q={q:.2f}; clusters align with topics: {pure}")
assert len(clusters) >= 2   # structure found (purity depends on backend)

# %% [markdown]
# ## 8. Summary

# %%
{"pure": pure, "n_clusters": len(clusters), "modularity": round(float(q), 3)}
