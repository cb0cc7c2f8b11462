"""Tutorial notebook source for movie_recommendations.ipynb."""

# %% [markdown]
# ## 1. A user–movie bipartite graph
#
# Two taste clusters (sci-fi, romance) plus one cross-over user.

# %%
import numpy as np

from muninn_tpu import Graph, node2vec_train
from muninn_tpu.index.flat import FlatIndex

LIKES = [
    ("u1", "matrix"), ("u1", "inception"),
    ("u2", "matrix"), ("u2", "interstellar"),
    ("u3", "inception"), ("u3", "interstellar"), ("u3", "bladerunner"),
    ("u4", "bladerunner"), ("u4", "matrix"),
    ("u5", "notebook"), ("u5", "titanic"), ("u5", "ghost"),
    ("u6", "titanic"), ("u6", "ghost"), ("u6", "inception"),
    ("u7", "notebook"), ("u7", "ghost"),
]
MOVIES = {mv for _, mv in LIKES}
g = Graph.from_edges(*zip(*LIKES))
g.num_nodes

# %% [markdown]
# ## 2. Train Node2Vec into a vector index
#
# Embeddings land in the index with rowids 1..V (the reference's
# `rowid = i + 1` contract).

# %%
idx = FlatIndex(32, "cosine")
ids, emb = node2vec_train(
    g, dim=32, num_walks=10, walk_length=16, window=4,
    epochs=8, seed=0, output_index=idx,
)
emb.shape, len(idx)

# %% [markdown]
# ## 3. A nearest-neighbor helper

# %%
node_row = {n: i for i, n in enumerate(ids)}
seen: dict = {}
for u, mv in LIKES:
    seen.setdefault(u, set()).add(mv)

def nearest(node, k=6):
    got, _ = idx.search(emb[node_row[node]], k=k + 1)
    names = [ids[int(i) - 1] for i in np.asarray(got) if int(i) >= 1]
    return [n for n in names if n != node]

nearest("matrix", k=4)

# %% [markdown]
# ## 4. Similar movies
#
# Co-liked movies embed near each other.

# %%
sim = [n for n in nearest("matrix") if n in MOVIES][:3]
print("like 'matrix'? also try:", sim)

# %% [markdown]
# ## 5. Per-user recommendations
#
# A user's neighbors in embedding space are movies their taste-alikes
# liked; filter out what they've already seen.

# %%
recs = {}
for u in ("u1", "u5", "u6"):
    cand = [n for n in nearest(u, k=10)
            if n in MOVIES and n not in seen[u]][:2]
    recs[u] = cand
    print(f"{u} (liked {sorted(seen[u])}): recommend {cand}")

# %% [markdown]
# ## 6. The cross-over user
#
# u6 likes both romance and one sci-fi film — recommendations can pull
# from either cluster.

# %%
recs["u6"]

# %% [markdown]
# ## 7. Sanity: embeddings are unit-norm

# %%
assert np.allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)
True

# %% [markdown]
# ## 8. Summary

# %%
{"similar_to_matrix": sim, "recs": recs}
