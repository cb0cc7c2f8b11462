"""Citation-graph analytics: influence, lineage selectors, similarity."""

import numpy as np

from muninn_tpu import Graph, node2vec_train, select
from muninn_tpu.index.flat import FlatIndex

# (citing paper -> cited paper); two lineages + one bridging survey
CITATIONS = [
    # neural-network lineage
    ("backprop", "perceptron"),
    ("cnn", "backprop"),
    ("lstm", "backprop"),
    ("attention", "lstm"),
    ("transformer", "attention"),
    ("transformer", "cnn"),
    ("bert", "transformer"),
    ("gpt", "transformer"),
    # database lineage
    ("system_r", "relational_model"),
    ("postgres", "system_r"),
    ("column_store", "system_r"),
    ("vector_db", "column_store"),
    # the bridge
    ("survey", "bert"),
    ("survey", "vector_db"),
]


def main() -> dict:
    src, dst = zip(*CITATIONS)
    g = Graph.from_edges(src, dst)

    # influence: rank flows along citations (citing -> cited), so mass
    # accumulates at foundational papers
    influence = g.pagerank(iterations=30)
    top = sorted(influence, key=influence.get, reverse=True)[:4]
    print("most influential:", [(p, round(influence[p], 3)) for p in top])

    # edges run citing -> cited, so descendants (X+) = what X builds
    # on, and ancestors (+X) = what X enabled
    print("\n== lineage selectors ==")
    foundations = sorted(n for n, _, _ in select(g, "transformer+") if n != "transformer")
    print("transformer builds on :", foundations)
    enabled = sorted(n for n, _, _ in select(g, "+attention") if n != "attention")
    print("attention enabled     :", enabled)
    neighborhood = len(list(select(g, "@survey")))
    print("papers in survey's neighborhood:", neighborhood)
    fringe = sorted(n for n, _, _ in select(g, "not survey+"))
    print("not in survey's bibliography:", fringe)

    # structural similarity: co-citation patterns via node2vec
    idx = FlatIndex(32, "cosine")
    undirected = Graph.from_edges(src + dst, dst + src)
    ids, emb = node2vec_train(undirected, dim=32, num_walks=12,
                              walk_length=12, epochs=8, seed=0,
                              output_index=idx)
    row = {n: i for i, n in enumerate(ids)}
    got, _ = idx.search(emb[row["bert"]], k=4)
    similar = [ids[int(i) - 1] for i in np.asarray(got)
               if int(i) >= 1 and ids[int(i) - 1] != "bert"][:3]
    print("\nstructurally similar to 'bert':", similar)
    return {"top": top, "foundations": foundations, "enabled": enabled,
            "fringe": fringe, "similar": similar}


if __name__ == "__main__":
    main()
