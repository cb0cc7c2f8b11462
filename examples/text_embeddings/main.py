"""Tokenize -> embed -> similarity -> cluster, all on the engine."""

import numpy as np

from muninn_tpu import Graph
from muninn_tpu.index.flat import FlatIndex
from muninn_tpu.models.embed import embed, load_embed_model, model_dim
from muninn_tpu.models.registry import registry
from muninn_tpu.text import token_count, tokenize_text

TEXTS = [
    "The weather is sunny today",        # weather
    "Clear skies and sunshine expected",  # weather
    "The bank raised interest rates",     # finance
    "Central banks tightened policy",     # finance
    "Pasta needs salted boiling water",   # cooking
    "Boil noodles in well-salted water",  # cooking
]
TOPIC = ["weather", "weather", "finance", "finance", "cooking", "cooking"]


def main() -> dict:
    load_embed_model("enc", dim=64)  # hash backend; path= for a real encoder
    print("model dim:", model_dim("enc"))

    m = registry.find("enc")
    print("tokens:", tokenize_text(m, TEXTS[0]))
    print("token_count:", token_count(m, TEXTS[0]))

    vecs = embed("enc", TEXTS)  # [6, 64], L2-normalized
    print("embeddings:", vecs.shape, "norms:",
          np.round(np.linalg.norm(vecs, axis=1), 3))

    sims = vecs @ vecs.T
    print("\nsimilarity matrix (cosine):")
    for i, row in enumerate(sims):
        print(" ", " ".join(f"{v:5.2f}" for v in row), "|", TEXTS[i][:30])

    # cluster in embedding space: kNN graph -> Leiden
    idx = FlatIndex(64, "cosine")
    idx.insert(np.arange(len(TEXTS)), vecs)
    ids, dists = idx.search(vecs, k=3)
    src, dst, w = [], [], []
    for i, (row, drow) in enumerate(zip(np.asarray(ids), np.asarray(dists))):
        for j, d in zip(row, drow):
            if int(j) != i:
                src.append(i), dst.append(int(j)), w.append(1.0 - float(d))
    g = Graph.from_edges(src, dst, w)
    labels, q = g.leiden(seed=0)
    clusters: dict = {}
    for n, c in labels.items():
        clusters.setdefault(c, []).append(TOPIC[int(n)])
    pure = all(len(set(members)) == 1 for members in clusters.values())
    print(f"\nleiden clusters (Q={q:.2f}):",
          sorted(tuple(sorted(m)) for m in clusters.values()))
    print("clusters align with topics:", pure)
    return {"pure": pure, "n_clusters": len(clusters)}


if __name__ == "__main__":
    main()
