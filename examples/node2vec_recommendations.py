"""Node2Vec embeddings -> vector index -> similar-node recommendations
(reference: examples/movie_recommendations + node2vec)."""
import numpy as np
from muninn_tpu import Graph, node2vec_train
from muninn_tpu.index.flat import FlatIndex

# bipartite-ish taste graph: users <-> movies they liked
likes = [
    ("u1", "matrix"), ("u1", "inception"), ("u2", "matrix"),
    ("u2", "interstellar"), ("u3", "inception"), ("u3", "interstellar"),
    ("u4", "notebook"), ("u4", "titanic"), ("u5", "notebook"),
    ("u5", "titanic"), ("u5", "ghost"),
]
g = Graph.from_edges(*zip(*likes))
idx = FlatIndex(32, "cosine")
ids, emb = node2vec_train(g, dim=32, num_walks=8, walk_length=12,
                          epochs=6, seed=0, output_index=idx)
row = {n: i for i, n in enumerate(ids)}
got, _ = idx.search(emb[row["matrix"]], k=4)
print("similar to 'matrix':", [ids[i - 1] for i in got if i - 1 != row["matrix"]])
