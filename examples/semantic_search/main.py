"""Semantic search end-to-end: embed -> index -> query -> mutate -> persist."""

import tempfile

import numpy as np

from muninn_tpu import Graph  # noqa: F401  (package smoke)
from muninn_tpu.index.flat import FlatIndex
from muninn_tpu.index.hnsw import HnswIndex
from muninn_tpu.io.checkpoint import load_flat, save_flat
from muninn_tpu.models.embed import embed, load_embed_model

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


def main() -> dict:
    load_embed_model("demo", dim=64)  # hash backend; path= for a real encoder
    vecs = embed("demo", DOCS)

    # exact engine: the TPU-first primary path
    flat = FlatIndex(64, "cosine")
    flat.insert(np.arange(len(DOCS)), vecs)

    print("== exact (FlatIndex) ==")
    qvecs = embed("demo", QUERIES)
    exact_ids, _ = flat.search(qvecs, k=3)
    for q, row in zip(QUERIES, np.asarray(exact_ids)):
        print(f"  {q!r:38} -> {DOCS[row[0]]!r}")

    # approximate engine: same API, incremental-churn capable
    hnsw = HnswIndex(64, "cosine", m=8, ef_construction=64)
    hnsw.insert(np.arange(len(DOCS)), vecs)
    hnsw_ids, _ = hnsw.search(qvecs, k=3, ef_search=32)
    hits = sum(
        len(set(map(int, a)) & set(map(int, b))) / 3
        for a, b in zip(np.asarray(hnsw_ids), np.asarray(exact_ids))
    )
    recall = hits / len(QUERIES)
    print(f"recall@3 of hnsw vs exact: {recall:.2f}")

    # mutation: drop the top hit for query 0 and re-search
    top0 = int(np.asarray(exact_ids)[0, 0])
    flat.delete([top0])
    ids2, _ = flat.search(qvecs[:1], k=1)
    print("after delete, top hit:", DOCS[int(np.asarray(ids2)[0, 0])])

    # persistence round-trip
    with tempfile.TemporaryDirectory() as td:
        save_flat(flat, td)
        flat2 = load_flat(td)
        ids3, _ = flat2.search(qvecs[:1], k=1)
        same = int(np.asarray(ids3)[0, 0]) == int(np.asarray(ids2)[0, 0])
        print("reloaded index agrees:", same)
    return {"recall": recall, "reload_ok": same}


if __name__ == "__main__":
    main()
