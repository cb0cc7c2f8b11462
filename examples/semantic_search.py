"""Semantic search: embed -> index -> KNN (reference: examples/semantic_search)."""
import numpy as np
from muninn_tpu.models.embed import load_embed_model, embed
from muninn_tpu.index.flat import FlatIndex

docs = [
    "The cat sat on the mat",
    "A feline rested on the rug",
    "Stock markets rallied on Friday",
    "Equities surged at the end of the week",
    "How to bake sourdough bread",
]

load_embed_model("demo", dim=64)          # deterministic hash backend;
vecs = embed("demo", docs)                # pass path= for a real encoder
idx = FlatIndex(64, "cosine")
idx.insert(np.arange(len(docs)), vecs)

q = embed("demo", ["kitty lying on a carpet"])
ids, dists = idx.search(q[0], k=3)
for i, d in zip(ids, dists):
    print(f"{d:.3f}  {docs[i]}")
