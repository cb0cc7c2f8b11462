"""GraphRAG: extract -> graph -> communities -> labels -> retrieval."""

import numpy as np

from muninn_tpu import Graph
from muninn_tpu.index.flat import FlatIndex
from muninn_tpu.models.chat import load_chat_model
from muninn_tpu.models.embed import embed, load_embed_model
from muninn_tpu.text import extract_ner_re_batch, label_groups

DOCS = [
    "Ada Lovelace worked with Charles Babbage on the Analytical Engine.",
    "Charles Babbage designed the Analytical Engine in London.",
    "Grace Hopper created COBOL at Remington Rand.",
    "COBOL influenced modern business programming languages.",
    "Alan Turing proposed the Turing Machine at Cambridge.",
    "The Turing Machine formalized computation itself.",
]


def main() -> dict:
    load_chat_model("chat")        # pass path= for a real local model
    load_embed_model("emb", dim=64)

    # 1. knowledge extraction — one batched decode for the corpus
    src, dst, mention_of = [], [], {}
    for i, out in enumerate(extract_ner_re_batch("chat", DOCS)):
        for r in out["relations"]:
            src.append(r["head"])
            dst.append(r["tail"])
        for e in out["entities"]:
            mention_of.setdefault(e["name"], []).append(i)

    # 2. graph + communities
    g = Graph.from_edges(src, dst)
    labels, q = g.leiden(seed=0)
    members: dict = {}
    for node, comm in labels.items():
        members.setdefault(comm, []).append(node)
    named = dict(
        (gid, label) for gid, label, _ in label_groups("chat", members)
    )
    print(f"{len(members)} communities (Q={q:.2f}):")
    for comm, nodes in sorted(members.items()):
        print(f"  [{named.get(comm, comm)}] {sorted(nodes)}")

    # 3. entity embedding index for retrieval
    entities = list(labels)
    idx = FlatIndex(64, "cosine")
    idx.insert(np.arange(len(entities)), embed("emb", entities))

    # 4. community-aware retrieval
    query = "Who built early mechanical computers?"
    ids, _ = idx.search(embed("emb", [query])[0], k=3)
    hit_comms = {labels[entities[i]] for i in np.asarray(ids) if i >= 0}
    print(f"\nquery: {query}")
    contexts = []
    for c in hit_comms:
        context_docs = sorted(
            {d for n in members[c] for d in mention_of.get(n, [])}
        )
        contexts.append(context_docs)
        print(f"  community [{named.get(c, c)}] -> docs {context_docs}")
        for d in context_docs:
            print(f"    - {DOCS[d]}")
    assert contexts and any(contexts)
    return {"n_communities": len(members), "contexts": contexts}


if __name__ == "__main__":
    main()
