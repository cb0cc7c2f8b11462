"""NER/RE extraction -> knowledge graph -> graph queries."""

from muninn_tpu import Graph
from muninn_tpu.models.chat import load_chat_model
from muninn_tpu.text import (
    extract_entities,
    extract_ner_re_batch,
    extract_relations,
)

DOCS = [
    "Ada Lovelace worked with Charles Babbage on the Analytical Engine.",
    "Charles Babbage designed the Analytical Engine in London.",
    "Grace Hopper created COBOL at Remington Rand.",
    "Alan Turing proposed the Turing Machine at Cambridge.",
]


def main() -> dict:
    load_chat_model("extractor")  # echo backend; path= for a real model

    ents = extract_entities("extractor", DOCS[0])
    print("entities:", [e["name"] for e in ents["entities"]])

    typed = extract_entities("extractor", DOCS[0],
                             entity_types=["PERSON", "ARTIFACT"])
    print("typed entities:", typed["entities"][:2])

    rels = extract_relations("extractor", DOCS[2])
    print("relations:", rels["relations"])

    # batched NER+RE over the whole corpus: one decode
    results = extract_ner_re_batch("extractor", DOCS)
    src, dst = [], []
    for r in results:
        for rel in r["relations"]:
            src.append(rel["head"])
            dst.append(rel["tail"])
    print(f"extracted {len(src)} relations from {len(DOCS)} docs")

    g = Graph.from_edges(src, dst)
    comps = g.connected_components()
    n_comp = len({c for c, _ in comps.values()})
    print("knowledge-graph components:", n_comp)
    pr = g.pagerank()
    central = max(pr, key=pr.get)
    print("most-connected entity:", central)
    return {"n_edges": len(src), "n_components": n_comp, "central": central}


if __name__ == "__main__":
    main()
