"""Summaries + community labeling."""

from muninn_tpu import Graph
from muninn_tpu.models.chat import load_chat_model
from muninn_tpu.text import label_groups, summarize

DOCS = [
    "Hierarchical Navigable Small World graphs build a layered proximity "
    "graph where upper layers provide long-range shortcuts and the bottom "
    "layer holds every point, giving logarithmic search complexity.",
    "Compressed sparse row storage keeps a graph's edges in two flat "
    "arrays, offsets per node and concatenated neighbor lists, which is "
    "the layout every vectorized graph kernel in this engine consumes.",
]

FOLLOWS = [
    ("alice", "bob"), ("bob", "carol"), ("carol", "alice"),
    ("Dataworks Dana", "alice"),
    ("gil", "hana"), ("hana", "ivan"), ("ivan", "gil"),
]


def main() -> dict:
    load_chat_model("writer")  # echo backend; path= for a real model

    print("== summaries ==")
    for d in DOCS:
        s = summarize("writer", d, max_words=12)
        print(" ", s[:90])

    print("== community labels ==")
    g = Graph.from_edges(*zip(*FOLLOWS))
    labels, _ = g.leiden(seed=0)
    groups: dict = {}
    for node, comm in labels.items():
        groups.setdefault(comm, []).append(node)
    rows = label_groups("writer", groups, min_group_size=2)
    for gid, label, n in rows:
        print(f"  community {gid}: {label!r} ({n} members)")
    assert rows, "expected at least one labeled group"
    return {"n_groups": len(rows)}


if __name__ == "__main__":
    main()
