"""Node2Vec over a user-movie graph -> vector index -> recommendations."""

import numpy as np

from muninn_tpu import Graph, node2vec_train
from muninn_tpu.index.flat import FlatIndex

# two taste clusters (sci-fi, romance) + one cross-over user u6
LIKES = [
    ("u1", "matrix"), ("u1", "inception"),
    ("u2", "matrix"), ("u2", "interstellar"),
    ("u3", "inception"), ("u3", "interstellar"), ("u3", "bladerunner"),
    ("u4", "bladerunner"), ("u4", "matrix"),
    ("u5", "notebook"), ("u5", "titanic"), ("u5", "ghost"),
    ("u6", "titanic"), ("u6", "ghost"), ("u6", "inception"),
    ("u7", "notebook"), ("u7", "ghost"),
]
MOVIES = {m for _, m in LIKES}


def main() -> dict:
    g = Graph.from_edges(*zip(*LIKES))
    idx = FlatIndex(32, "cosine")
    ids, emb = node2vec_train(
        g, dim=32, num_walks=10, walk_length=16, window=4,
        epochs=8, seed=0, output_index=idx,
    )
    node_row = {n: i for i, n in enumerate(ids)}
    seen = {}
    for u, m in LIKES:
        seen.setdefault(u, set()).add(m)

    def nearest(node: str, k: int = 6) -> list[str]:
        got, _ = idx.search(emb[node_row[node]], k=k + 1)
        # output_index ids are 1..V in interning order (rowid=i+1)
        names = [ids[int(i) - 1] for i in np.asarray(got) if int(i) >= 1]
        return [n for n in names if n != node]

    print("== similar movies ==")
    sim = [n for n in nearest("matrix") if n in MOVIES][:3]
    print("  like 'matrix'? also try:", sim)

    print("== per-user recommendations ==")
    recs = {}
    for u in ("u1", "u5", "u6"):
        cand = [n for n in nearest(u, k=10)
                if n in MOVIES and n not in seen[u]][:2]
        recs[u] = cand
        print(f"  {u} (liked {sorted(seen[u])}): recommend {cand}")
    return {"similar_to_matrix": sim, "recs": recs}


if __name__ == "__main__":
    main()
