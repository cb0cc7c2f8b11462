"""Tutorial notebook source for research_papers.ipynb."""

# %% [markdown]
# ## 1. A citation graph
#
# Edges run citing → cited: two research lineages plus one bridging
# survey.

# %%
import numpy as np

from muninn_tpu import Graph, node2vec_train, select
from muninn_tpu.index.flat import FlatIndex

CITATIONS = [
    ("backprop", "perceptron"), ("cnn", "backprop"), ("lstm", "backprop"),
    ("attention", "lstm"), ("transformer", "attention"),
    ("transformer", "cnn"), ("bert", "transformer"), ("gpt", "transformer"),
    ("system_r", "relational_model"), ("postgres", "system_r"),
    ("column_store", "system_r"), ("vector_db", "column_store"),
    ("survey", "bert"), ("survey", "vector_db"),
]
src, dst = zip(*CITATIONS)
g = Graph.from_edges(src, dst)
g.num_nodes, g.num_edges

# %% [markdown]
# ## 2. Influence via PageRank
#
# Rank flows along citations, so mass accumulates at the foundations.

# %%
influence = g.pagerank(iterations=30)
top = sorted(influence, key=influence.get, reverse=True)[:4]
[(p, round(influence[p], 3)) for p in top]

# %% [markdown]
# ## 3. Lineage selectors: what does X build on?
#
# With citing → cited edges, descendants (`X+`) are X's intellectual
# foundations.

# %%
foundations = sorted(
    n for n, _, _ in select(g, "transformer+") if n != "transformer"
)
foundations

# %% [markdown]
# ## 4. ...and what did X enable?

# %%
enabled = sorted(n for n, _, _ in select(g, "+attention") if n != "attention")
enabled

# %% [markdown]
# ## 5. Closure and complement

# %%
neighborhood = len(list(select(g, "@survey")))
fringe = sorted(n for n, _, _ in select(g, "not survey+"))
print("papers in survey's neighborhood:", neighborhood)
print("not in survey's bibliography:", fringe)

# %% [markdown]
# ## 6. Structural similarity via Node2Vec
#
# Co-citation patterns: train on the undirected graph, search the
# embedding index.

# %%
idx = FlatIndex(32, "cosine")
undirected = Graph.from_edges(src + dst, dst + src)
ids, emb = node2vec_train(undirected, dim=32, num_walks=12,
                          walk_length=12, epochs=8, seed=0,
                          output_index=idx)
row = {n: i for i, n in enumerate(ids)}
len(ids)

# %% [markdown]
# ## 7. Who is structurally similar to BERT?

# %%
got, _ = idx.search(emb[row["bert"]], k=4)
similar = [ids[int(i) - 1] for i in np.asarray(got)
           if int(i) >= 1 and ids[int(i) - 1] != "bert"][:3]
similar

# %% [markdown]
# ## 8. Summary

# %%
{"top": top, "foundations": foundations, "enabled": enabled,
 "similar_to_bert": similar}
